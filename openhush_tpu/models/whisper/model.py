"""Whisper encoder/decoder as pure-functional JAX.

TPU-first design decisions (vs the reference's embedded whisper.cpp,
src/engine/whisper.rs:1-306):

- Layers are *stacked*: every per-layer weight carries a leading [n_layer]
  axis and blocks run under `lax.scan`, so compile time is O(1) in depth and
  XLA sees one fused block body (32 layers of large-v3 compile like 1).
- The KV cache is a fixed-shape [L, B, H, n_text_ctx, Dh] buffer updated with
  `dynamic_update_slice` — no dynamic shapes anywhere, so one compiled decode
  step serves every position and (with donation) updates in place in HBM.
- The unembedding matmul runs over a 128-padded vocab for MXU tiling; padded
  logits are masked to -inf.
- LayerNorm/softmax/logits accumulate in fp32 regardless of param dtype
  (bf16 params are the production configuration).

Weight layout convention: linear weights are stored [in, out] (y = x @ W + b);
conv stems are [width, in, out] ('HIO'). `convert.py` maps HF torch
checkpoints into this layout.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from openhush_tpu.models.whisper.config import WhisperConfig

Params = dict
_HI = jax.lax.Precision.HIGHEST


# ---------------------------------------------------------------------------
# Initialization
# ---------------------------------------------------------------------------

def sinusoids(length: int, channels: int) -> np.ndarray:
    """Fixed sinusoidal positions for the encoder (OpenAI layout:
    concat(sin, cos) over channels//2 timescales, base 10000)."""
    assert channels % 2 == 0
    log_timescale_increment = np.log(10000.0) / (channels // 2 - 1)
    inv_timescales = np.exp(-log_timescale_increment * np.arange(channels // 2))
    scaled_time = np.arange(length)[:, None] * inv_timescales[None, :]
    return np.concatenate([np.sin(scaled_time), np.cos(scaled_time)],
                          axis=1).astype(np.float32)


def _linear_init(key, shape, dtype):
    fan_in = shape[-2] if len(shape) >= 2 else shape[-1]
    std = fan_in ** -0.5
    return (jax.random.normal(key, shape) * std).astype(dtype)


def init_params(cfg: WhisperConfig, key: jax.Array,
                dtype=jnp.float32) -> Params:
    """Random-init parameter pytree (used for tests and as the conversion
    target skeleton)."""
    d, dec_d = cfg.n_audio_state, cfg.n_text_state
    ffn = cfg.ffn_dim
    ks = iter(jax.random.split(key, 32))

    def enc_layers():
        L = cfg.n_audio_layer
        k = iter(jax.random.split(next(ks), 16))
        return {
            "ln1_scale": jnp.ones((L, d), dtype), "ln1_bias": jnp.zeros((L, d), dtype),
            "q_w": _linear_init(next(k), (L, d, d), dtype), "q_b": jnp.zeros((L, d), dtype),
            "k_w": _linear_init(next(k), (L, d, d), dtype),
            "v_w": _linear_init(next(k), (L, d, d), dtype), "v_b": jnp.zeros((L, d), dtype),
            "o_w": _linear_init(next(k), (L, d, d), dtype), "o_b": jnp.zeros((L, d), dtype),
            "ln2_scale": jnp.ones((L, d), dtype), "ln2_bias": jnp.zeros((L, d), dtype),
            "fc1_w": _linear_init(next(k), (L, d, ffn), dtype), "fc1_b": jnp.zeros((L, ffn), dtype),
            "fc2_w": _linear_init(next(k), (L, ffn, d), dtype), "fc2_b": jnp.zeros((L, d), dtype),
        }

    def dec_layers():
        L = cfg.n_text_layer
        k = iter(jax.random.split(next(ks), 16))
        out = {
            "ln1_scale": jnp.ones((L, dec_d), dtype), "ln1_bias": jnp.zeros((L, dec_d), dtype),
            "q_w": _linear_init(next(k), (L, dec_d, dec_d), dtype), "q_b": jnp.zeros((L, dec_d), dtype),
            "k_w": _linear_init(next(k), (L, dec_d, dec_d), dtype),
            "v_w": _linear_init(next(k), (L, dec_d, dec_d), dtype), "v_b": jnp.zeros((L, dec_d), dtype),
            "o_w": _linear_init(next(k), (L, dec_d, dec_d), dtype), "o_b": jnp.zeros((L, dec_d), dtype),
            "ln2_scale": jnp.ones((L, dec_d), dtype), "ln2_bias": jnp.zeros((L, dec_d), dtype),
            "xq_w": _linear_init(next(k), (L, dec_d, dec_d), dtype), "xq_b": jnp.zeros((L, dec_d), dtype),
            "xk_w": _linear_init(next(k), (L, dec_d, dec_d), dtype),
            "xv_w": _linear_init(next(k), (L, dec_d, dec_d), dtype), "xv_b": jnp.zeros((L, dec_d), dtype),
            "xo_w": _linear_init(next(k), (L, dec_d, dec_d), dtype), "xo_b": jnp.zeros((L, dec_d), dtype),
            "ln3_scale": jnp.ones((L, dec_d), dtype), "ln3_bias": jnp.zeros((L, dec_d), dtype),
            "fc1_w": _linear_init(next(k), (L, dec_d, ffn), dtype), "fc1_b": jnp.zeros((L, ffn), dtype),
            "fc2_w": _linear_init(next(k), (L, ffn, dec_d), dtype), "fc2_b": jnp.zeros((L, dec_d), dtype),
        }
        return out

    tok_emb = _linear_init(next(ks), (cfg.n_vocab_padded, dec_d), dtype)
    tok_emb = tok_emb.at[cfg.n_vocab:].set(0.0)
    return {
        "encoder": {
            "conv1_w": _linear_init(next(ks), (3, cfg.n_mels, d), dtype),
            "conv1_b": jnp.zeros((d,), dtype),
            "conv2_w": _linear_init(next(ks), (3, d, d), dtype),
            "conv2_b": jnp.zeros((d,), dtype),
            "pos_emb": jnp.asarray(sinusoids(cfg.n_audio_ctx, d), dtype),
            "layers": enc_layers(),
            "ln_post_scale": jnp.ones((d,), dtype),
            "ln_post_bias": jnp.zeros((d,), dtype),
        },
        "decoder": {
            "tok_emb": tok_emb,
            "pos_emb": _linear_init(next(ks), (cfg.n_text_ctx, dec_d), dtype),
            "layers": dec_layers(),
            "ln_scale": jnp.ones((dec_d,), dtype),
            "ln_bias": jnp.zeros((dec_d,), dtype),
        },
    }


# ---------------------------------------------------------------------------
# Building blocks
# ---------------------------------------------------------------------------

def layer_norm(x, scale, bias, eps=1e-5):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale.astype(jnp.float32) + bias.astype(jnp.float32)).astype(x.dtype)


def _split_heads(x, n_head):
    b, t, d = x.shape
    return x.reshape(b, t, n_head, d // n_head).transpose(0, 2, 1, 3)


def _merge_heads(x):
    b, h, t, dh = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, t, h * dh)


def _attend(q, k, v, mask=None):
    """q,k,v: [B,H,T,Dh]. Softmax in fp32. Returns [B,H,Tq,Dh]."""
    dh = q.shape[-1]
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * (dh ** -0.5)
    if mask is not None:
        scores = jnp.where(mask, scores, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


def _mm(x, w):
    """Matmul against a weight that is either a plain array or an int8
    per-output-channel quantized dict {'q': int8 [..,in,out], 's': [..,out]}.
    int8 weights halve the per-decode-step HBM read of the parameters (the
    single largest term); the scale folds in after the matmul."""
    if isinstance(w, dict):
        y = jnp.dot(x, w["q"].astype(x.dtype),
                    preferred_element_type=jnp.float32)
        return (y * w["s"].astype(jnp.float32)).astype(x.dtype)
    return x @ w


def quantize_decoder_weights(params: Params) -> Params:
    """Return params with every decoder layer matrix quantized to int8 with
    per-output-channel scales (whisper.cpp's Q8 analogue). Encoder weights
    stay bf16 — they're read once per window, not once per token."""
    out = dict(params)
    layers = dict(params["decoder"]["layers"])
    for name, w in list(layers.items()):
        if name.endswith("_w"):
            w32 = jnp.asarray(w, jnp.float32)
            scale = jnp.max(jnp.abs(w32), axis=-2, keepdims=False) / 127.0
            scale = jnp.maximum(scale, 1e-10)
            q = jnp.clip(jnp.round(w32 / scale[..., None, :]), -127, 127
                         ).astype(jnp.int8)
            layers[name] = {"q": q, "s": scale}
    dec = dict(params["decoder"])
    dec["layers"] = layers
    out["decoder"] = dec
    return out


def _mlp(x, lp):
    h = jax.nn.gelu(_mm(x, lp["fc1_w"]) + lp["fc1_b"], approximate=False)
    return _mm(h, lp["fc2_w"]) + lp["fc2_b"]


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------

def encode(cfg: WhisperConfig, params: Params, mel: jax.Array) -> jax.Array:
    """mel: [B, n_mels, 3000] → audio features [B, n_audio_ctx, d].

    Conv stem (k=3 s=1, gelu; k=3 s=2, gelu) + sinusoidal positions +
    pre-LN transformer + final LN. Parity: whisper.cpp encoder as driven by
    src/engine/whisper.rs:253 (state.full)."""
    enc = params["encoder"]
    x = mel.transpose(0, 2, 1)  # [B, T, n_mels] — channels-last for TPU
    dn = ("NHC", "HIO", "NHC")
    x = jax.lax.conv_general_dilated(x, enc["conv1_w"], (1,), [(1, 1)],
                                     dimension_numbers=dn)
    x = jax.nn.gelu(x + enc["conv1_b"], approximate=False)
    x = jax.lax.conv_general_dilated(x, enc["conv2_w"], (2,), [(1, 1)],
                                     dimension_numbers=dn)
    x = jax.nn.gelu(x + enc["conv2_b"], approximate=False)
    x = x + enc["pos_emb"][None, : x.shape[1]].astype(x.dtype)

    n_head = cfg.n_audio_head

    def block(x, lp):
        h = layer_norm(x, lp["ln1_scale"], lp["ln1_bias"])
        q = _split_heads(h @ lp["q_w"] + lp["q_b"], n_head)
        k = _split_heads(h @ lp["k_w"], n_head)
        v = _split_heads(h @ lp["v_w"] + lp["v_b"], n_head)
        x = x + _merge_heads(_attend(q, k, v)) @ lp["o_w"] + lp["o_b"]
        h = layer_norm(x, lp["ln2_scale"], lp["ln2_bias"])
        x = x + _mlp(h, lp)
        return x, None

    x, _ = jax.lax.scan(block, x, enc["layers"])
    return layer_norm(x, enc["ln_post_scale"], enc["ln_post_bias"])


# ---------------------------------------------------------------------------
# Decoder with KV cache
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class KVCache:
    """Fixed-shape self-attention cache: k/v [L, B, H, n_text_ctx, Dh]."""
    k: jax.Array
    v: jax.Array


jax.tree_util.register_pytree_node(
    KVCache, lambda c: ((c.k, c.v), None), lambda _, kv: KVCache(*kv))


def init_kv_cache(cfg: WhisperConfig, batch: int, dtype=jnp.float32,
                  max_len: Optional[int] = None) -> KVCache:
    max_len = max_len or cfg.n_text_ctx
    shape = (cfg.n_text_layer, batch, cfg.n_text_head, max_len,
             cfg.n_text_state // cfg.n_text_head)
    return KVCache(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))


def compute_cross_kv(cfg: WhisperConfig, params: Params,
                     audio_features: jax.Array) -> KVCache:
    """Precompute per-layer cross-attention K/V from encoder output —
    done once per 30 s window, reused by every decode step."""
    dec = params["decoder"]["layers"]
    n_head = cfg.n_text_head

    def per_layer(_, lp):
        k = _split_heads(_mm(audio_features, lp["xk_w"]), n_head)
        v = _split_heads(_mm(audio_features, lp["xv_w"]) + lp["xv_b"], n_head)
        return None, (k, v)

    _, (xk, xv) = jax.lax.scan(per_layer, None, dec)
    return KVCache(xk, xv)


@dataclasses.dataclass
class QuantKVCache:
    """int8 cross-KV with per-position scales — halves the dominant HBM
    read of the decode step (cross K/V is ~45% of per-step traffic for
    large-v3). Scales fold into scores/probs, so dequantization costs one
    [B,H,1,T] multiply instead of touching the [B,H,T,D] tensors."""
    k: jax.Array        # int8 [L,B,H,T,D]
    k_scale: jax.Array  # f32  [L,B,H,T]
    v: jax.Array        # int8 [L,B,H,T,D]
    v_scale: jax.Array  # f32  [L,B,H,T]


jax.tree_util.register_pytree_node(
    QuantKVCache,
    lambda c: ((c.k, c.k_scale, c.v, c.v_scale), None),
    lambda _, xs: QuantKVCache(*xs))


def _quantize_rows(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-row (last-dim) symmetric int8 quantization."""
    x32 = x.astype(jnp.float32)
    scale = jnp.max(jnp.abs(x32), axis=-1) / 127.0
    safe = jnp.maximum(scale, 1e-10)
    q = jnp.clip(jnp.round(x32 / safe[..., None]), -127, 127
                 ).astype(jnp.int8)
    return q, safe


def compute_cross_kv_quant(cfg: WhisperConfig, params: Params,
                           audio_features: jax.Array) -> QuantKVCache:
    """Quantized variant of compute_cross_kv (layer-at-a-time so the fp32
    intermediates never exist all at once)."""
    dec = params["decoder"]["layers"]
    n_head = cfg.n_text_head

    def per_layer(_, lp):
        k = _split_heads(_mm(audio_features, lp["xk_w"]), n_head)
        v = _split_heads(_mm(audio_features, lp["xv_w"]) + lp["xv_b"], n_head)
        kq, ks = _quantize_rows(k)
        vq, vs = _quantize_rows(v)
        return None, (kq, ks, vq, vs)

    _, (kq, ks, vq, vs) = jax.lax.scan(per_layer, None, dec)
    return QuantKVCache(kq, ks, vq, vs)


def _attend_quant(q, kq, ks, vq, vs, compute_dtype):
    """q [B,H,S,D]; kq/vq int8 [B,H,T,D]; ks/vs [B,H,T]. Scales are folded
    into the score/prob tensors (cheap [B,H,S,T] muls)."""
    dh = q.shape[-1]
    scores = jnp.einsum("bhqd,bhkd->bhqk", q.astype(compute_dtype),
                        kq.astype(compute_dtype),
                        preferred_element_type=jnp.float32)
    scores = scores * ks[:, :, None, :] * (dh ** -0.5)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    probs = (probs * vs[:, :, None, :]).astype(compute_dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs,
                      vq.astype(compute_dtype)).astype(q.dtype)


def decode(cfg: WhisperConfig, params: Params, tokens: jax.Array,
           pos: jax.Array, cache: KVCache, cross_kv: KVCache,
           ) -> tuple[jax.Array, KVCache]:
    """Run the decoder on `tokens` [B, S] starting at position `pos`,
    attending to cached self-attention history and precomputed cross K/V.
    Handles both prefill (S>1) and single-token AR steps (S=1) with the same
    compiled graph per S.

    `pos` may be a scalar (all rows at the same offset — one-shot decode) or
    a [B] vector (continuous batching: every slot at its own offset).

    Returns (logits [B, S, n_vocab_padded] fp32, updated cache).
    """
    dec = params["decoder"]
    B, S = tokens.shape
    n_head = cfg.n_text_head
    max_len = cache.k.shape[3]
    pos = jnp.asarray(pos)
    per_row = pos.ndim == 1

    x = dec["tok_emb"][tokens]
    if per_row:
        pos_ids = pos[:, None] + jnp.arange(S)[None, :]       # [B, S]
    else:
        pos_ids = pos + jnp.arange(S)
    x = x + dec["pos_emb"][pos_ids].astype(x.dtype)

    # Mask over cached keys: key j visible to query i iff j <= pos + i.
    key_idx = jnp.arange(max_len)[None, :]          # [1, max_len]
    q_idx = jnp.arange(S)[:, None]                  # [S, 1]
    if per_row:
        self_mask = (key_idx[None] <=
                     (pos[:, None, None] + q_idx[None]))[:, None]
    else:
        self_mask = (key_idx <= pos + q_idx)[None, None]  # [1,1,S,max_len]

    def _update_cache(c, new):
        """c [B,H,T,D] ← new [B,H,S,D] at per-row or shared offset."""
        if per_row:
            return jax.vmap(
                lambda cb, nb, p: jax.lax.dynamic_update_slice(
                    cb, nb, (0, p, 0)))(c, new, pos)
        return jax.lax.dynamic_update_slice(c, new, (0, 0, pos, 0))

    quantized = isinstance(cross_kv, QuantKVCache)

    def block(x, scanned):
        if quantized:
            lp, k_cache, v_cache, xk, xks, xv, xvs = scanned
        else:
            lp, k_cache, v_cache, xk, xv = scanned
        # --- causal self-attention against the cache ---
        h = layer_norm(x, lp["ln1_scale"], lp["ln1_bias"])
        q = _split_heads(_mm(h, lp["q_w"]) + lp["q_b"], n_head)
        k_new = _split_heads(_mm(h, lp["k_w"]), n_head)
        v_new = _split_heads(_mm(h, lp["v_w"]) + lp["v_b"], n_head)
        k_cache = _update_cache(k_cache, k_new)
        v_cache = _update_cache(v_cache, v_new)
        x = x + _mm(_merge_heads(_attend(q, k_cache, v_cache, self_mask)), lp["o_w"]) + lp["o_b"]
        # --- cross-attention over audio features ---
        h = layer_norm(x, lp["ln2_scale"], lp["ln2_bias"])
        xq = _split_heads(_mm(h, lp["xq_w"]) + lp["xq_b"], n_head)
        if quantized:
            attn = _attend_quant(xq, xk, xks, xv, xvs, x.dtype)
        else:
            attn = _attend(xq, xk, xv)
        x = x + _mm(_merge_heads(attn), lp["xo_w"]) + lp["xo_b"]
        # --- MLP ---
        h = layer_norm(x, lp["ln3_scale"], lp["ln3_bias"])
        x = x + _mlp(h, lp)
        return x, (k_cache, v_cache)

    if quantized:
        xs = (dec["layers"], cache.k, cache.v, cross_kv.k,
              cross_kv.k_scale, cross_kv.v, cross_kv.v_scale)
    else:
        xs = (dec["layers"], cache.k, cache.v, cross_kv.k, cross_kv.v)
    x, (k_all, v_all) = jax.lax.scan(block, x, xs)

    x = layer_norm(x, dec["ln_scale"], dec["ln_bias"])
    logits = jnp.dot(x.astype(jnp.float32),
                     dec["tok_emb"].T.astype(jnp.float32),
                     preferred_element_type=jnp.float32)
    # Mask vocab padding.
    if cfg.n_vocab_padded > cfg.n_vocab:
        pad_mask = jnp.arange(cfg.n_vocab_padded) >= cfg.n_vocab
        logits = jnp.where(pad_mask[None, None], jnp.finfo(jnp.float32).min,
                           logits)
    return logits, KVCache(k_all, v_all)


def forward(cfg: WhisperConfig, params: Params, mel: jax.Array,
            tokens: jax.Array) -> jax.Array:
    """Full teacher-forced forward (training / tests): mel [B, n_mels, 3000],
    tokens [B, S] → logits [B, S, n_vocab_padded]."""
    feats = encode(cfg, params, mel)
    cross_kv = compute_cross_kv(cfg, params, feats)
    cache = init_kv_cache(cfg, tokens.shape[0], dtype=feats.dtype,
                          max_len=tokens.shape[1])
    logits, _ = decode(cfg, params, tokens, jnp.int32(0), cache, cross_kv)
    return logits
