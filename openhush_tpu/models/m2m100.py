"""M2M-100 many-to-many translation as a pure-JAX seq2seq.

Parity: the reference runs M2M-100 through ONNX Runtime with a greedy
decode loop to 256 tokens and a `__xx__`→id language-token table
(src/translation/m2m100.rs:460-717, lang table :351-458). Here the model is
a JAX pytree with the same stacked-layer scan + fixed-shape KV cache
machinery as the Whisper decoder, converted from HF
M2M100ForConditionalGeneration checkpoints.

Architecture facts targeted (verified against transformers' torch impl):
pre-LN blocks with final layer norms on both stacks, ReLU MLPs, fairseq
sinusoidal positions ([sin|cos] halves, offset 2, padding_idx 1 zeroed,
position ids = cumsum(non-pad) + padding_idx), sqrt(d) embedding scale,
biased q/k/v/out projections, tied unembedding.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from openhush_tpu.models.whisper.model import (KVCache, layer_norm,
                                               _attend, _merge_heads,
                                               _split_heads)

PAD = 1
EOS = 2
MAX_NEW_TOKENS = 256   # parity: greedy loop cap (m2m100.rs:634-703)

# The 100 language codes (FLORES-101 order as used by M2M-100's tokenizer;
# token id = vocab_base + index, `__xx__` form). Parity: lang table
# m2m100.rs:351-458.
LANG_CODES = (
    "af am ar ast az ba be bg bn br bs ca ceb cs cy da de el en es et fa "
    "ff fi fr fy ga gd gl gu ha he hi hr ht hu hy id ig ilo is it ja jv "
    "ka kk km kn ko lb lg ln lo lt lv mg mk ml mn mr ms my ne nl no ns "
    "oc or pa pl ps pt ro ru sd si sk sl so sq sr ss su sv sw ta th tl tn "
    "tr uk ur uz vi wo xh yi yo zh zu").split()


@dataclasses.dataclass(frozen=True)
class M2MConfig:
    name: str = "418M"
    vocab_size: int = 128112
    d_model: int = 1024
    n_heads: int = 16
    n_enc_layers: int = 12
    n_dec_layers: int = 12
    ffn_dim: int = 4096
    max_positions: int = 1024
    lang_token_base: int = 128004   # id of "__af__" (first lang token)

    @property
    def vocab_padded(self) -> int:
        return ((self.vocab_size + 127) // 128) * 128


CONFIGS = {
    "418M": M2MConfig(),
    "1.2B": M2MConfig(name="1.2B", n_enc_layers=24, n_dec_layers=24,
                      ffn_dim=8192),
    "test": M2MConfig(name="test", vocab_size=1000, d_model=64, n_heads=2,
                      n_enc_layers=2, n_dec_layers=2, ffn_dim=128,
                      lang_token_base=900),
}


def lang_token_id(cfg: M2MConfig, code: str) -> int:
    try:
        return cfg.lang_token_base + LANG_CODES.index(code)
    except ValueError:
        raise ValueError(f"unknown M2M-100 language {code!r}") from None


def sinusoidal_positions(n: int, dim: int) -> np.ndarray:
    """fairseq layout: [sin | cos] halves, padding_idx row zeroed."""
    half = dim // 2
    freq = np.exp(np.arange(half) * -(np.log(10000.0) / (half - 1)))
    ang = np.arange(n)[:, None] * freq[None, :]
    emb = np.concatenate([np.sin(ang), np.cos(ang)], axis=1)
    if dim % 2 == 1:
        emb = np.concatenate([emb, np.zeros((n, 1))], axis=1)
    emb[PAD, :] = 0.0
    return emb.astype(np.float32)


def _position_ids(tokens: jax.Array, past: jax.Array | int = 0) -> jax.Array:
    """cumsum(non-pad)*mask + PAD (+past) — pads stay at PAD position."""
    mask = (tokens != PAD).astype(jnp.int32)
    return (jnp.cumsum(mask, axis=1) + past) * mask + PAD


def init_params(cfg: M2MConfig, key: jax.Array, dtype=jnp.float32) -> dict:
    ks = iter(jax.random.split(key, 8))

    def attn(k, L, d):
        sub = iter(jax.random.split(k, 4))
        g = lambda: (jax.random.normal(next(sub), (L, d, d)) * d ** -0.5
                     ).astype(dtype)
        b = lambda: jnp.zeros((L, d), dtype)
        return {"q_w": g(), "q_b": b(), "k_w": g(), "k_b": b(),
                "v_w": g(), "v_b": b(), "o_w": g(), "o_b": b()}

    def ln(L, d, n):
        return {f"{n}_scale": jnp.ones((L, d), dtype),
                f"{n}_bias": jnp.zeros((L, d), dtype)}

    def mlp(k, L, d, f):
        k1, k2 = jax.random.split(k)
        return {"fc1_w": (jax.random.normal(k1, (L, d, f)) * d ** -0.5
                          ).astype(dtype),
                "fc1_b": jnp.zeros((L, f), dtype),
                "fc2_w": (jax.random.normal(k2, (L, f, d)) * f ** -0.5
                          ).astype(dtype),
                "fc2_b": jnp.zeros((L, d), dtype)}

    d, f = cfg.d_model, cfg.ffn_dim
    Le, Ld = cfg.n_enc_layers, cfg.n_dec_layers
    tok = (jax.random.normal(next(ks), (cfg.vocab_padded, d)) * d ** -0.5
           ).astype(dtype)
    tok = tok.at[cfg.vocab_size:].set(0.0).at[PAD].set(0.0)
    return {
        "tok_emb": tok,
        "pos_emb": jnp.asarray(
            sinusoidal_positions(cfg.max_positions + 2, d), dtype),
        "encoder": {
            "layers": {**attn(next(ks), Le, d), **ln(Le, d, "ln1"),
                       **mlp(next(ks), Le, d, f), **ln(Le, d, "ln2")},
            "ln_scale": jnp.ones((d,), dtype),
            "ln_bias": jnp.zeros((d,), dtype),
        },
        "decoder": {
            "layers": {**attn(next(ks), Ld, d), **ln(Ld, d, "ln1"),
                       **{("x" + k): v
                          for k, v in attn(next(ks), Ld, d).items()},
                       **ln(Ld, d, "ln2"), **mlp(next(ks), Ld, d, f),
                       **ln(Ld, d, "ln3")},
            "ln_scale": jnp.ones((d,), dtype),
            "ln_bias": jnp.zeros((d,), dtype),
        },
    }


def encode(cfg: M2MConfig, params: dict, tokens: jax.Array) -> jax.Array:
    """tokens [B, S] → features [B, S, d] (pads attend-masked)."""
    scale = cfg.d_model ** 0.5
    x = params["tok_emb"][tokens] * scale
    x = x + params["pos_emb"][_position_ids(tokens)].astype(x.dtype)
    pad_mask = (tokens != PAD)[:, None, None, :]    # [B,1,1,S]
    n_head = cfg.n_heads

    def block(x, lp):
        h = layer_norm(x, lp["ln1_scale"], lp["ln1_bias"])
        q = _split_heads(h @ lp["q_w"] + lp["q_b"], n_head)
        k = _split_heads(h @ lp["k_w"] + lp["k_b"], n_head)
        v = _split_heads(h @ lp["v_w"] + lp["v_b"], n_head)
        x = x + _merge_heads(_attend(q, k, v, pad_mask)) @ lp["o_w"] \
            + lp["o_b"]
        h = layer_norm(x, lp["ln2_scale"], lp["ln2_bias"])
        h = jax.nn.relu(h @ lp["fc1_w"] + lp["fc1_b"])
        x = x + h @ lp["fc2_w"] + lp["fc2_b"]
        return x, None

    x, _ = jax.lax.scan(block, x, params["encoder"]["layers"])
    return layer_norm(x, params["encoder"]["ln_scale"],
                      params["encoder"]["ln_bias"])


def compute_cross_kv(cfg: M2MConfig, params: dict,
                     features: jax.Array) -> KVCache:
    n_head = cfg.n_heads

    def per_layer(_, lp):
        k = _split_heads(features @ lp["xk_w"] + lp["xk_b"], n_head)
        v = _split_heads(features @ lp["xv_w"] + lp["xv_b"], n_head)
        return None, (k, v)

    _, (xk, xv) = jax.lax.scan(per_layer, None,
                               params["decoder"]["layers"])
    return KVCache(xk, xv)


def init_kv_cache(cfg: M2MConfig, batch: int, max_len: int = MAX_NEW_TOKENS,
                  dtype=jnp.float32) -> KVCache:
    shape = (cfg.n_dec_layers, batch, cfg.n_heads, max_len,
             cfg.d_model // cfg.n_heads)
    return KVCache(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))


def decode(cfg: M2MConfig, params: dict, tokens: jax.Array, pos,
           cache: KVCache, cross_kv: KVCache, src_tokens: jax.Array
           ) -> tuple[jax.Array, KVCache]:
    """tokens [B, S] at scalar offset `pos` → (logits [B,S,Vp], cache)."""
    dec = params["decoder"]
    B, S = tokens.shape
    n_head = cfg.n_heads
    max_len = cache.k.shape[3]
    scale = cfg.d_model ** 0.5

    x = params["tok_emb"][tokens] * scale
    # Decoder positions: offset past non-pad counting (decode stream has no
    # pads, so positions = pos + 1 + arange + PAD).
    pos_ids = pos + 1 + jnp.arange(S)[None, :] + PAD
    x = x + params["pos_emb"][pos_ids].astype(x.dtype)

    key_idx = jnp.arange(max_len)[None, :]
    q_idx = jnp.arange(S)[:, None]
    self_mask = (key_idx <= pos + q_idx)[None, None]
    src_mask = (src_tokens != PAD)[:, None, None, :]

    def block(x, scanned):
        lp, k_cache, v_cache, xk, xv = scanned
        h = layer_norm(x, lp["ln1_scale"], lp["ln1_bias"])
        q = _split_heads(h @ lp["q_w"] + lp["q_b"], n_head)
        k_new = _split_heads(h @ lp["k_w"] + lp["k_b"], n_head)
        v_new = _split_heads(h @ lp["v_w"] + lp["v_b"], n_head)
        k_cache = jax.lax.dynamic_update_slice(k_cache, k_new,
                                               (0, 0, pos, 0))
        v_cache = jax.lax.dynamic_update_slice(v_cache, v_new,
                                               (0, 0, pos, 0))
        x = x + _merge_heads(_attend(q, k_cache, v_cache, self_mask)) \
            @ lp["o_w"] + lp["o_b"]
        h = layer_norm(x, lp["ln2_scale"], lp["ln2_bias"])
        xq = _split_heads(h @ lp["xq_w"] + lp["xq_b"], n_head)
        x = x + _merge_heads(_attend(xq, xk, xv, src_mask)) @ lp["xo_w"] \
            + lp["xo_b"]
        h = layer_norm(x, lp["ln3_scale"], lp["ln3_bias"])
        h = jax.nn.relu(h @ lp["fc1_w"] + lp["fc1_b"])
        x = x + h @ lp["fc2_w"] + lp["fc2_b"]
        return x, (k_cache, v_cache)

    x, (k_all, v_all) = jax.lax.scan(
        block, x, (dec["layers"], cache.k, cache.v, cross_kv.k,
                   cross_kv.v))
    x = layer_norm(x, dec["ln_scale"], dec["ln_bias"])
    logits = jnp.dot(x.astype(jnp.float32),
                     params["tok_emb"].T.astype(jnp.float32),
                     preferred_element_type=jnp.float32)
    if cfg.vocab_padded > cfg.vocab_size:
        bad = jnp.arange(cfg.vocab_padded) >= cfg.vocab_size
        logits = jnp.where(bad[None, None], np.finfo(np.float32).min,
                           logits)
    return logits, KVCache(k_all, v_all)


@functools.partial(jax.jit, static_argnames=("cfg", "max_new"))
def greedy_translate(cfg: M2MConfig, params, src_tokens: jax.Array,
                     target_lang_token: jax.Array, *,
                     max_new: int = MAX_NEW_TOKENS):
    """Greedy decode: prompt [eos, lang] → tokens until EOS
    (parity: greedy loop, m2m100.rs:634-703)."""
    B = src_tokens.shape[0]
    feats = encode(cfg, params, src_tokens)
    xkv = compute_cross_kv(cfg, params, feats)
    cache = init_kv_cache(cfg, B, max_len=max_new + 2, dtype=feats.dtype)

    prompt = jnp.stack([jnp.full((B,), EOS, jnp.int32),
                        jnp.broadcast_to(target_lang_token, (B,))], axis=1)
    logits, cache = decode(cfg, params, prompt, jnp.int32(0), cache, xkv,
                           src_tokens)
    out = jnp.full((B, max_new), PAD, jnp.int32)

    def cond(c):
        step, _, _, finished, _ = c
        return (step < max_new) & ~jnp.all(finished)

    def body(c):
        step, out, last, finished, cache = c
        nxt = jnp.argmax(last, axis=-1).astype(jnp.int32)
        nxt = jnp.where(finished, EOS, nxt)
        out = jax.lax.dynamic_update_slice(out, nxt[:, None], (0, step))
        finished = finished | (nxt == EOS)
        logits, cache = decode(cfg, params, nxt[:, None], 2 + step, cache,
                               xkv, src_tokens)
        return step + 1, out, logits[:, -1], finished, cache

    _, out, _, _, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), out, logits[:, -1],
                     jnp.zeros(B, bool), cache))
    return out


# ---------------------------------------------------------------------------
# HF checkpoint conversion
# ---------------------------------------------------------------------------

def from_hf_state_dict(sd: dict, cfg: M2MConfig) -> dict:
    """HF M2M100ForConditionalGeneration state dict → our pytree."""
    if any(k.startswith("model.") for k in sd):
        sd = {k[len("model."):]: v for k, v in sd.items()
              if k.startswith("model.")}

    def _np(t):
        if hasattr(t, "detach"):
            t = t.detach().cpu().float().numpy()
        return np.asarray(t, np.float32)

    def stack(L, tpl, tr=True):
        return np.stack([(_np(sd[tpl.format(i)]).T if tr
                          else _np(sd[tpl.format(i)])) for i in range(L)])

    def attn_block(pre, L, x=""):
        hf = {"q": "q_proj", "k": "k_proj", "v": "v_proj", "o": "out_proj"}
        out = {}
        for ours, theirs in hf.items():
            out[f"{x}{ours}_w"] = stack(L, f"{pre}.{theirs}.weight")
            out[f"{x}{ours}_b"] = stack(L, f"{pre}.{theirs}.bias", tr=False)
        return out

    def lns(pre, L, name):
        return {f"{name}_scale": stack(L, f"{pre}.weight", tr=False),
                f"{name}_bias": stack(L, f"{pre}.bias", tr=False)}

    def mlps(pre, L):
        return {"fc1_w": stack(L, f"{pre}.fc1.weight"),
                "fc1_b": stack(L, f"{pre}.fc1.bias", tr=False),
                "fc2_w": stack(L, f"{pre}.fc2.weight"),
                "fc2_b": stack(L, f"{pre}.fc2.bias", tr=False)}

    Le, Ld = cfg.n_enc_layers, cfg.n_dec_layers
    tok = _np(sd["shared.weight"] if "shared.weight" in sd
              else sd["encoder.embed_tokens.weight"])
    if tok.shape[0] < cfg.vocab_padded:
        tok = np.concatenate([tok, np.zeros(
            (cfg.vocab_padded - tok.shape[0], tok.shape[1]), tok.dtype)])
    return {
        "tok_emb": tok,
        "pos_emb": sinusoidal_positions(cfg.max_positions + 2, cfg.d_model),
        "encoder": {
            "layers": {
                **attn_block("encoder.layers.{}.self_attn", Le),
                **lns("encoder.layers.{}.self_attn_layer_norm", Le, "ln1"),
                **mlps("encoder.layers.{}", Le),
                **lns("encoder.layers.{}.final_layer_norm", Le, "ln2"),
            },
            "ln_scale": _np(sd["encoder.layer_norm.weight"]),
            "ln_bias": _np(sd["encoder.layer_norm.bias"]),
        },
        "decoder": {
            "layers": {
                **attn_block("decoder.layers.{}.self_attn", Ld),
                **lns("decoder.layers.{}.self_attn_layer_norm", Ld, "ln1"),
                **attn_block("decoder.layers.{}.encoder_attn", Ld, x="x"),
                **lns("decoder.layers.{}.encoder_attn_layer_norm", Ld,
                      "ln2"),
                **mlps("decoder.layers.{}", Ld),
                **lns("decoder.layers.{}.final_layer_norm", Ld, "ln3"),
            },
            "ln_scale": _np(sd["decoder.layer_norm.weight"]),
            "ln_bias": _np(sd["decoder.layer_norm.bias"]),
        },
    }


class M2M100Translator:
    """Engine used by postproc.translation when backend='m2m100'; needs a
    converted checkpoint + tokenizer files (m2m100.npz + tokenizer dir)."""

    def __init__(self, config):
        import os
        from openhush_tpu.models.whisper.convert import load_npz
        from openhush_tpu.runtime.engine import default_model_dir
        path = os.path.join(default_model_dir(), "m2m100.npz")
        if not os.path.exists(path):
            raise FileNotFoundError(
                f"M2M-100 checkpoint not found: {path}\nConvert with: "
                f"python -m openhush_tpu.cli model convert-m2m100 "
                f"--hf-path /path/to/m2m100_418M")
        self.cfg = CONFIGS["418M"]
        self.params = load_npz(path)
        self.target = config.target_language
        tok_dir = os.path.join(default_model_dir(), "m2m100_tokenizer")
        from tokenizers import Tokenizer  # type: ignore
        self.tokenizer = Tokenizer.from_file(
            os.path.join(tok_dir, "tokenizer.json"))

    def translate(self, text: str, target: Optional[str] = None) -> str:
        ids = self.tokenizer.encode(text).ids[:self.cfg.max_positions - 2]
        src = jnp.asarray([ids + [EOS]], jnp.int32)
        lang = lang_token_id(self.cfg, target or self.target)
        out = np.asarray(greedy_translate(self.cfg, self.params, src,
                                          jnp.int32(lang)))[0]
        content = [int(t) for t in out if t not in (PAD, EOS)]
        return self.tokenizer.decode(content)
