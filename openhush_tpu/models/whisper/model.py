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
import functools
import os
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


def _attend_full_flash(q, k, v):
    """Non-causal MHA via the Pallas TPU flash-attention kernel.

    XLA materializes [B, H, T, T] fp32 scores for the naive formulation —
    at the encoder's T=1500 that's ~2.9 GB of HBM traffic per large-v3
    layer across softmax passes, roughly half the encode time. Flash
    keeps score blocks in VMEM. T pads to the 128-lane block size with
    SegmentIds masking (pad keys invisible to real queries); output
    slices back. TPU-only; dense path used on CPU (tests) or with
    OPENHUSH_NO_FLASH=1."""
    from jax.experimental.pallas.ops.tpu import flash_attention as _fa

    dh = q.shape[-1]
    T = q.shape[2]
    Tp = -(-T // 128) * 128
    if Tp != T:
        pad = [(0, 0), (0, 0), (0, Tp - T), (0, 0)]
        q, k, v = (jnp.pad(a, pad) for a in (q, k, v))
        seg = jnp.pad(jnp.ones((q.shape[0], T), jnp.int32),
                      [(0, 0), (0, Tp - T)])
        seg_ids = _fa.SegmentIds(seg, seg)
    else:
        seg_ids = None
    # Default 128-blocks underutilize the MXU pipeline at encoder shapes;
    # bigger blocks amortize the per-block softmax bookkeeping. Measured
    # encode phase (v5e, large-v3, B=16): dense-XLA 697 ms; flash blk
    # 128→1243 ms, 512→609 ms, 1536 (full row)→586 ms. Whisper's T is at
    # most 1536 padded, so full-row blocks fit VMEM comfortably
    # (1536x1536 fp32 scores = 9.4 MB). OPENHUSH_FLASH_BLOCK tunes.
    blk = _flash_block(Tp)
    bs = _fa.BlockSizes(block_q=blk, block_k_major=blk, block_k=blk,
                        block_b=1, block_q_major_dkv=blk,
                        block_k_major_dkv=blk, block_k_dkv=blk,
                        block_q_dkv=blk, block_k_major_dq=blk,
                        block_k_dq=blk, block_q_dq=blk)
    out = _fa.flash_attention(q, k, v, segment_ids=seg_ids,
                              sm_scale=dh ** -0.5, block_sizes=bs)
    return out[:, :, :T]


def _flash_block(Tp: int) -> int:
    """Flash block size for a padded row length Tp: OPENHUSH_FLASH_BLOCK
    clamped to [128, Tp] (invalid / non-positive values fall back to the
    1536 default instead of crashing the encoder trace), then halved
    until it divides Tp."""
    import os
    try:
        blk = int(os.environ.get("OPENHUSH_FLASH_BLOCK", "1536"))
    except ValueError:
        blk = 1536
    if blk < 1:
        blk = 1536
    blk = max(128, min(blk, Tp))
    while Tp % blk:
        blk //= 2
    return blk


def _flash_ok(q, sharded: bool = False) -> bool:
    import os
    if os.environ.get("OPENHUSH_NO_FLASH") == "1":
        return False
    # Multi-chip: a pallas_call under plain GSPMD is unvalidated, so
    # flash needs either a single-device process or the shard_map wrapper
    # (sharded=True — the kernel then runs on LOCAL head/batch shards,
    # the same invocation shape as the benchmarked single-device call).
    # OPENHUSH_FLASH=1 forces it on for raw-GSPMD experiments.
    if (jax.device_count() > 1 and not sharded
            and os.environ.get("OPENHUSH_FLASH") != "1"):
        return False
    return (jax.default_backend() == "tpu"
            and q.shape[-1] in (64, 128)
            and q.dtype in (jnp.bfloat16, jnp.float32))


# Mesh registered by the multi-chip serving path (parallel/sharding.
# enable_sharded_flash): encoder attention is then evaluated under
# shard_map with batch on 'data' and heads on 'model', so the Pallas
# flash kernel runs on LOCAL shards — manual partitioning instead of
# GSPMD-through-pallas_call (which is unvalidated). Attention is
# head-parallel, so no collectives are needed inside the wrapper.
_FLASH_MESH = None


def set_flash_mesh(mesh) -> None:
    global _FLASH_MESH
    _FLASH_MESH = mesh


def _attend_full_local(q, k, v, sharded: bool = False):
    if _flash_ok(q, sharded=sharded):
        return _attend_full_flash(q, k, v)
    return _attend(q, k, v)


def _attend_full(q, k, v):
    """Full (non-causal) self-attention: flash on TPU, dense elsewhere.
    With a registered mesh, runs under shard_map (B on 'data', H on
    'model') so the kernel partitions explicitly."""
    mesh = _FLASH_MESH
    if mesh is not None and mesh.devices.size > 1:
        dp = mesh.shape.get("data", 1)
        tp = mesh.shape.get("model", 1)
        B, H = q.shape[0], q.shape[1]
        if B % dp == 0 and H % tp == 0:
            import functools as _ft

            from jax.experimental.shard_map import shard_map
            from jax.sharding import PartitionSpec as P
            spec = P("data", "model", None, None)
            return shard_map(_ft.partial(_attend_full_local, sharded=True),
                             mesh=mesh, in_specs=(spec, spec, spec),
                             out_specs=spec, check_rep=False)(q, k, v)
    return _attend_full_local(q, k, v)


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
        if name.endswith("_w") and not isinstance(w, dict):
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


def quantize_encoder_weights(params: Params) -> Params:
    """Return params with every encoder LAYER matrix quantized to int8 with
    per-output-channel scales (same recipe as quantize_decoder_weights).
    Unlike the decoder rung — where int8 weights pay off as halved HBM
    reads and _mm dequantizes to bf16 — the encoder is COMPUTE-bound
    (projections measured at ~94% of bf16 MXU peak, docs/STATUS.md), so
    encode() pairs these weights with per-row int8 activations and runs
    the dots on the int8 MXU path (~2x bf16 throughput on v5e; measured
    240 vs 98 TF/s on the [B*T, d]x[d, 4d] MLP shape). Conv stem,
    positional table and layernorms stay bf16 — they are not matmuls.
    Reference rung being matched: whisper.cpp's quantized GGML encoder
    variants (/root/reference/src/engine/whisper.rs:159-287)."""
    out = dict(params)
    layers = dict(params["encoder"]["layers"])
    for name, w in list(layers.items()):
        if name.endswith("_w") and not isinstance(w, dict):
            w32 = jnp.asarray(w, jnp.float32)
            scale = jnp.max(jnp.abs(w32), axis=-2, keepdims=False) / 127.0
            scale = jnp.maximum(scale, 1e-10)
            q = jnp.clip(jnp.round(w32 / scale[..., None, :]), -127, 127
                         ).astype(jnp.int8)
            layers[name] = {"q": q, "s": scale}
    enc = dict(params["encoder"])
    enc["layers"] = layers
    out["encoder"] = enc
    return out


def _quantize_rows(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-row symmetric int8: x [..., D] → (int8 values, fp32 scales
    [...]). The W8A8 activation half of the encoder rung; one scale per
    token row keeps the quantize a single fused pass over x.

    Stays the plain XLA formulation ON PURPOSE: unlike the per-head cache
    quantize (which XLA lowers through a relayouting [..., H, 64] reshape
    and the Pallas kernel beats 6x), the per-row reduce has no relayout
    to avoid, and routing it through pallas_call instead BREAKS the
    fusion with the surrounding layernorm/GELU: measured 729.0 ms (XLA)
    vs 1051.9 ms (Pallas) for the full int8 B=32 large-v3 encode on
    v5e."""
    x32 = x.astype(jnp.float32)
    scale = jnp.max(jnp.abs(x32), axis=-1) * jnp.float32(1.0 / 127.0)
    safe = jnp.maximum(scale, 1e-10)
    q = jnp.clip(jnp.round(x32 / safe[..., None]), -127, 127
                 ).astype(jnp.int8)
    return q, safe


def _mm_i8(x8: jax.Array, xs: jax.Array, w: dict) -> jax.Array:
    """int8 x int8 → int32 MXU dot with both scale folds: x8 [..., I]
    per-row scales xs [...], w {'q': int8 [I, O], 's': fp32 [O]} →
    fp32 [..., O]. The MXU never sees a dequantized operand."""
    y = jnp.dot(x8, w["q"], preferred_element_type=jnp.int32
                ).astype(jnp.float32)
    return y * xs[..., None] * w["s"].astype(jnp.float32)


def _gelu(x):
    """GELU for the conv stem and MLPs.

    openai-whisper evaluates the exact erf GELU; whisper.cpp — the
    engine the reference actually ships (src/engine/whisper.rs:159-287)
    — evaluates GGML's tanh-approximation (lookup-table) GELU. The two
    differ by <3e-3 per activation. Default is exact erf (keeps the
    torch-parity suite byte-honest); OPENHUSH_GELU=tanh selects the
    whisper.cpp-style approximation — measured 68 ms (-16%) off a
    large-v3 B=16 encode on v5e (tools/encoder_phases.py), erf being
    VPU-transcendental-bound. Read at trace time: set before the first
    forward pass of the process.

    Default resolution: OPENHUSH_GELU env if set; else the
    `gelu_tanh.ok` marker tools/checkpoint_gate.py drops after a
    real-weight WER run shows negligible drift (same gated-default
    pattern as the int8 self-cache rung, runtime/server.py:150); else
    exact erf. Cached per process — all model traces in one process use
    one GELU."""
    return jax.nn.gelu(x, approximate=_gelu_mode() == "tanh")


_GELU_MODE: Optional[str] = None


def _gelu_mode() -> str:
    global _GELU_MODE
    if _GELU_MODE is None:
        mode = os.environ.get("OPENHUSH_GELU")
        if mode not in ("erf", "tanh"):
            try:
                from openhush_tpu.runtime.engine import default_model_dir
                mode = ("tanh" if os.path.exists(os.path.join(
                    default_model_dir(), "gelu_tanh.ok")) else "erf")
            except Exception:  # noqa: BLE001 — default stays exact
                mode = "erf"
        _GELU_MODE = mode
    return _GELU_MODE


def _mlp(x, lp):
    h = _gelu(_mm(x, lp["fc1_w"]) + lp["fc1_b"])
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
    x = _gelu(x + enc["conv1_b"])
    x = jax.lax.conv_general_dilated(x, enc["conv2_w"], (2,), [(1, 1)],
                                     dimension_numbers=dn)
    x = _gelu(x + enc["conv2_b"])
    x = x + enc["pos_emb"][None, : x.shape[1]].astype(x.dtype)

    n_head = cfg.n_audio_head
    int8 = isinstance(enc["layers"]["q_w"], dict)

    def block(x, lp):
        h = layer_norm(x, lp["ln1_scale"], lp["ln1_bias"])
        q = _split_heads(h @ lp["q_w"] + lp["q_b"], n_head)
        k = _split_heads(h @ lp["k_w"], n_head)
        v = _split_heads(h @ lp["v_w"] + lp["v_b"], n_head)
        x = x + _merge_heads(_attend_full(q, k, v)) @ lp["o_w"] + lp["o_b"]
        h = layer_norm(x, lp["ln2_scale"], lp["ln2_bias"])
        x = x + _mlp(h, lp)
        return x, None

    def block_i8(x, lp):
        # W8A8 encoder rung (quantize_encoder_weights): every projection
        # runs int8xint8→int32 on the MXU; activations quantize per row,
        # ONCE per distinct matmul input (h feeds q/k/v from one
        # quantize). Residual stream, layernorms, attention and GELU stay
        # bf16 — accuracy-critical and not matmul-shaped.
        dt = x.dtype
        h = layer_norm(x, lp["ln1_scale"], lp["ln1_bias"])
        h8, hs = _quantize_rows(h)
        q = _split_heads((_mm_i8(h8, hs, lp["q_w"])
                          + lp["q_b"]).astype(dt), n_head)
        k = _split_heads(_mm_i8(h8, hs, lp["k_w"]).astype(dt), n_head)
        v = _split_heads((_mm_i8(h8, hs, lp["v_w"])
                          + lp["v_b"]).astype(dt), n_head)
        a = _merge_heads(_attend_full(q, k, v))
        a8, as_ = _quantize_rows(a)
        x = x + (_mm_i8(a8, as_, lp["o_w"]) + lp["o_b"]).astype(dt)
        h = layer_norm(x, lp["ln2_scale"], lp["ln2_bias"])
        h8, hs = _quantize_rows(h)
        g = _gelu((_mm_i8(h8, hs, lp["fc1_w"]) + lp["fc1_b"]).astype(dt))
        g8, gs = _quantize_rows(g)
        x = x + (_mm_i8(g8, gs, lp["fc2_w"]) + lp["fc2_b"]).astype(dt)
        return x, None

    x, _ = jax.lax.scan(block_i8 if int8 else block, x, enc["layers"])
    return layer_norm(x, enc["ln_post_scale"], enc["ln_post_bias"])


# ---------------------------------------------------------------------------
# Decoder with KV cache
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class KVCache:
    """Fixed-shape self-attention cache, FLAT layout: k/v [L, B, T, H*Dh].

    Flat (head-contiguous) storage is the TPU-native choice: the single-
    query decode step reads K as one [T, H*Dh] matmul operand against a
    block-diagonal q (one MXU dot for all heads) instead of H batched
    matvecs — measured 2-4x higher effective HBM bandwidth on v5e than
    the per-head [B, H, T, Dh] einsum. [T, H, Dh] views are free reshapes
    when per-head math is needed (prefill)."""
    k: jax.Array
    v: jax.Array


jax.tree_util.register_pytree_node(
    KVCache, lambda c: ((c.k, c.v), None), lambda _, kv: KVCache(*kv))


def init_kv_cache(cfg: WhisperConfig, batch: int, dtype=jnp.float32,
                  max_len: Optional[int] = None) -> KVCache:
    max_len = max_len or cfg.n_text_ctx
    shape = (cfg.n_text_layer, batch, max_len, cfg.n_text_state)
    return KVCache(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))


def compute_cross_kv(cfg: WhisperConfig, params: Params,
                     audio_features: jax.Array) -> KVCache:
    """Precompute per-layer cross-attention K/V from encoder output —
    done once per 30 s window, reused by every decode step. Flat
    [L, B, T_audio, H*Dh] layout (see KVCache)."""
    dec = params["decoder"]["layers"]

    def per_layer(_, lp):
        k = _mm(audio_features, lp["xk_w"])
        v = _mm(audio_features, lp["xv_w"]) + lp["xv_b"]
        return None, (k, v)

    _, (xk, xv) = jax.lax.scan(per_layer, None, dec)
    return KVCache(xk, xv)


@dataclasses.dataclass
class QuantKVCache:
    """int8 cross-KV with per-(position, head) scales — halves the dominant
    HBM read of the decode step (cross K/V is ~45% of per-step traffic for
    large-v3). FLAT layout like KVCache: values [L, B, T, H*Dh] int8 with
    scales [L, B, T, H] fp32. Scales fold into scores/probs, so
    dequantization never touches the big tensors; the S=1 decode path feeds
    the int8 values straight to the MXU (native int8×int8→int32 dot)."""
    k: jax.Array        # int8 [L,B,T,H*Dh]
    k_scale: jax.Array  # f32  [L,B,T,H]
    v: jax.Array        # int8 [L,B,T,H*Dh]
    v_scale: jax.Array  # f32  [L,B,T,H]


jax.tree_util.register_pytree_node(
    QuantKVCache,
    lambda c: ((c.k, c.k_scale, c.v, c.v_scale), None),
    lambda _, xs: QuantKVCache(*xs))


def _quantize_heads(x: jax.Array, n_head: int
                    ) -> tuple[jax.Array, jax.Array]:
    """x [B, T, H*D] → (int8 [B, T, H*D], per-(t,head) scales [B, T, H]).

    On TPU the bulk path (cross-KV, T=1500) runs the fused Pallas kernel
    (ops/quantize_pallas.py, bit-identical, ~6x less wall time than the
    XLA reshape-to-[...,H,64] lowering); tiny/odd shapes and other
    backends use the XLA formulation below."""
    from openhush_tpu.ops import quantize_pallas as _qp
    if _qp.quantize_ok(x, n_head):
        return _qp.quantize_heads_pallas(x, n_head)
    B, T, HD = x.shape
    x32 = x.astype(jnp.float32).reshape(B, T, n_head, HD // n_head)
    # *(1/127) not /127: matches the Pallas kernel's scale rounding
    # bit-exactly (XLA's simplifier applies the reciprocal rewrite only
    # sometimes, which would skew scales by one ULP between the paths).
    scale = jnp.max(jnp.abs(x32), axis=-1) * jnp.float32(1.0 / 127.0)
    safe = jnp.maximum(scale, 1e-10)
    q = jnp.clip(jnp.round(x32 / safe[..., None]), -127, 127
                 ).astype(jnp.int8).reshape(B, T, HD)
    return q, safe


def init_quant_kv_cache(cfg: WhisperConfig, batch: int,
                        max_len: Optional[int] = None) -> QuantKVCache:
    """int8 self-attention cache (opt-in): halves the self-KV read of the
    decode step. Same flat layout as init_kv_cache + per-(position, head)
    scales; decode() quantizes at write time."""
    max_len = max_len or cfg.n_text_ctx
    L, H = cfg.n_text_layer, cfg.n_text_head
    shape = (L, batch, max_len, cfg.n_text_state)
    sshape = (L, batch, max_len, H)
    return QuantKVCache(jnp.zeros(shape, jnp.int8),
                        jnp.zeros(sshape, jnp.float32),
                        jnp.zeros(shape, jnp.int8),
                        jnp.zeros(sshape, jnp.float32))


def compute_cross_kv_quant(cfg: WhisperConfig, params: Params,
                           audio_features: jax.Array) -> QuantKVCache:
    """Quantized variant of compute_cross_kv (layer-at-a-time so the fp32
    intermediates never exist all at once)."""
    dec = params["decoder"]["layers"]
    n_head = cfg.n_text_head

    def per_layer(_, lp):
        k = _mm(audio_features, lp["xk_w"])
        v = _mm(audio_features, lp["xv_w"]) + lp["xv_b"]
        kq, ks = _quantize_heads(k, n_head)
        vq, vs = _quantize_heads(v, n_head)
        return None, (kq, ks, vq, vs)

    _, (kq, ks, vq, vs) = jax.lax.scan(per_layer, None, dec)
    return QuantKVCache(kq, ks, vq, vs)


LANE = 128


def beam_grouped_ok(cfg, beam_size: int) -> bool:
    """True when a K-beam group's K·H score rows fit one 128-lane tile,
    i.e. the ancestry-masked grouped beam step (decode_beam_step) applies.
    Both the one-shot beam loop and the serving beam batcher route through
    this gate; larger K·H falls back to cross-KV tiling + parent-gather.
    (A function, not an inline test, so tests can force the fallback.)"""
    return beam_size * cfg.n_text_head <= LANE


@functools.lru_cache(maxsize=8)
def _bd_selector(n_head: int, head_dim: int) -> np.ndarray:
    """Block-diagonal selector [H*D, LANE]: column h is 1 over rows
    h*D..(h+1)*D. qbd = q_flat[:, :, None] * sel spreads each head's query
    into its own lane so ONE [T, H*D] @ [H*D, LANE] dot scores all heads."""
    hd = n_head * head_dim
    sel = np.zeros((hd, LANE), np.float32)
    for h in range(n_head):
        sel[h * head_dim:(h + 1) * head_dim, h] = 1.0
    return sel


def _attend_decode_flat(q, k_flat, v_flat, mask, n_head, *,
                        ks=None, vs=None):
    """Single-query attention over flat KV — the decode hot loop.

    q: [B, H*D] (one query row per batch element)
    k_flat/v_flat: [B, T, H*D] — bf16 (self cache) or int8 (quant cross)
    ks/vs: [B, T, H] scales when KV is int8
    mask: [B, T] or [1, T] key-validity (None = all valid)

    Block-diagonal trick: scores for all H heads come from one MXU dot per
    row, [T, H*D] @ [H*D, LANE] → [T, LANE] (lanes ≥ H are dead padding).
    With int8 KV, q is quantized per head and the dot runs native
    int8×int8→int32 on the MXU — the K/V bytes are never dequantized in
    HBM or VMEM. Measured on v5e (large-v3, B=8, T=1536): ~4x the
    effective bandwidth of the per-head [B,H,T,D] einsum formulation.
    """
    B, HD = q.shape
    D = HD // n_head
    T = k_flat.shape[1]
    sel = jnp.asarray(_bd_selector(n_head, D))
    quant = k_flat.dtype == jnp.int8
    q32 = q.astype(jnp.float32)

    if quant:
        qh = q32.reshape(B, n_head, D)
        qscale = jnp.maximum(jnp.max(jnp.abs(qh), axis=-1), 1e-10) / 127.0
        q8 = jnp.clip(jnp.round(qh / qscale[..., None]), -127, 127)
        qbd = (q8.reshape(B, HD, 1)
               * sel.astype(q8.dtype)[None]).astype(jnp.int8)
        scores_i = jnp.einsum("btk,bkh->bth", k_flat, qbd,
                              preferred_element_type=jnp.int32)[..., :n_head]
        scores = (scores_i.astype(jnp.float32) * ks
                  * qscale[:, None, :] * (D ** -0.5))
    else:
        qbd = (q.reshape(B, HD, 1) * sel.astype(q.dtype)[None])
        scores = jnp.einsum("btk,bkh->bth", k_flat, qbd,
                            preferred_element_type=jnp.float32
                            )[..., :n_head] * (D ** -0.5)

    if mask is not None:
        scores = jnp.where(mask[..., None], scores,
                           jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(scores, axis=1)                   # over T
    if quant:
        pv = probs * vs
        pscale = jnp.maximum(jnp.max(pv, axis=1), 1e-20) / 127.0  # [B, H]
        p8 = jnp.clip(jnp.round(pv / pscale[:, None, :]), -127, 127
                      ).astype(jnp.int8)
        out_i = jnp.einsum("bth,btk->bhk", p8, v_flat,
                           preferred_element_type=jnp.int32)
        out_hk = out_i.astype(jnp.float32) * pscale[..., None]
    else:
        out_hk = jnp.einsum("bth,btk->bhk", probs.astype(v_flat.dtype),
                            v_flat, preferred_element_type=jnp.float32)
    # Diagonal extraction: head h's output lives in columns h*D:(h+1)*D
    # of row h.
    out4 = out_hk.reshape(B, n_head, n_head, D)
    eye = jnp.asarray(np.eye(n_head, dtype=np.float32))
    return jnp.einsum("bhgd,hg->bhd", out4, eye).reshape(B, HD
                                                         ).astype(q.dtype)


def _attend_decode_flat_multi(q3, k_flat, v_flat, mask4, n_head, *,
                              ks=None, vs=None):
    """Small-S multi-query twin of _attend_decode_flat: ONE MXU dot with
    S·H lanes scores all S queries × H heads against the flat cache.

    q3: [B, S, H*D]; k_flat/v_flat: [B, T, H*D] (bf16 or int8);
    ks/vs: [B, T, H]; mask4: the decode() non-decode-step self mask
    ([B,1,S,T] or [1,1,S,T]) or None.

    Math is PER-QUERY IDENTICAL to the S=1 flat path (same block-diagonal
    selector, same per-(row, head) query quantization, same scale folds,
    same contraction dims) — the speculative verify pass depends on that:
    verify logits match step logits to reduction-order noise (~1e-6)
    instead of the ~1e-3 divergence of the per-head einsum formulation,
    and the cache is still read ONCE for all S queries (the read that
    speculation amortizes). Requires S·H ≤ 128 (one lane tile)."""
    B, S, HD = q3.shape
    D = HD // n_head
    T = k_flat.shape[1]
    # Live columns only ([HD, H]); each query gets its own H-lane group.
    sel = jnp.asarray(_bd_selector(n_head, D)[:, :n_head])
    quant = k_flat.dtype == jnp.int8
    SH = S * n_head

    if quant:
        qh = q3.astype(jnp.float32).reshape(B, S, n_head, D)
        qscale = jnp.maximum(jnp.max(jnp.abs(qh), axis=-1), 1e-10) / 127.0
        q8 = jnp.clip(jnp.round(qh / qscale[..., None]), -127, 127)
        # qbd[b, k, s*H+h] = q8[b, s, k] * sel[k, h] — the S=1 selector
        # replicated per query into its own H-lane group.
        q8f = q8.reshape(B, S, HD)
        qbd = (q8f[:, :, :, None] * sel[None, None]).astype(jnp.int8)
        qbd = qbd.transpose(0, 2, 1, 3).reshape(B, HD, SH)
        scores_i = jnp.einsum("btk,bkm->btm", k_flat, qbd,
                              preferred_element_type=jnp.int32)
        scores = scores_i.reshape(B, T, S, n_head).astype(jnp.float32)
        scores = (scores * ks[:, :, None, :]
                  * qscale[:, None, :, :] * (D ** -0.5))
    else:
        qbd = (q3[:, :, :, None] * sel.astype(q3.dtype)[None, None])
        qbd = qbd.transpose(0, 2, 1, 3).reshape(B, HD, SH)
        scores = jnp.einsum("btk,bkm->btm", k_flat, qbd,
                            preferred_element_type=jnp.float32)
        scores = scores.reshape(B, T, S, n_head) * (D ** -0.5)

    if mask4 is not None:
        # mask4 [B|1, 1, S, T] → [B|1, T, S, 1]
        m = mask4[:, 0].transpose(0, 2, 1)[..., None]
        scores = jnp.where(m, scores, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(scores, axis=1)           # over T
    if quant:
        pv = probs * vs[:, :, None, :]               # [B, T, S, H]
        pscale = jnp.maximum(jnp.max(pv, axis=1), 1e-20) / 127.0  # [B,S,H]
        p8 = jnp.clip(jnp.round(pv / pscale[:, None]), -127, 127
                      ).astype(jnp.int8)
        out_i = jnp.einsum("btm,btk->bmk",
                           p8.reshape(B, T, SH), v_flat,
                           preferred_element_type=jnp.int32)
        out = (out_i.reshape(B, S, n_head, HD).astype(jnp.float32)
               * pscale[..., None])
    else:
        pm = probs.reshape(B, T, SH).astype(v_flat.dtype)
        out = jnp.einsum("btm,btk->bmk", pm, v_flat,
                         preferred_element_type=jnp.float32
                         ).reshape(B, S, n_head, HD)
    # Diagonal extraction per query: head h's output is cols h*D:(h+1)*D.
    out5 = out.reshape(B, S, n_head, n_head, D)
    eye = jnp.asarray(np.eye(n_head, dtype=np.float32))
    return jnp.einsum("bshgd,hg->bshd", out5, eye).reshape(
        B, S, HD).astype(q3.dtype)


def _attend_decode_flat_ro(q3, k_cache, v_cache, cache_mask, k_new,
                           v_new, n_head, *, ks=None, vs=None,
                           ksn=None, vsn=None):
    """Read-only-cache twin of _attend_decode_flat_multi: the cache is
    never written inside the step — the S new keys ride ALONGSIDE it and
    their scores concatenate into the softmax.

    Why: carrying the self-cache through the layer scan's xs→ys rewrites
    the whole buffer every step (measured +7.3 ms/step of the 18.3 ms
    B=32 large-v3 decode step, tools/decode_step_variants.py). Here the
    cache is a pure xs operand (no ys emission) and decode() writes the
    [L,B,S,H*D] delta ONCE into the caller's loop-carried cache.

    q3 [B,S,HD] (S·H ≤ 128); k_cache/v_cache [B,T,HD] holding positions
    < pos only; cache_mask [B|1,T] (key j visible iff j < pos_row —
    same for every query; positions ≥ pos live in the block). k_new/
    v_new [B,S,HD] ALREADY in cache dtype (bf16-cast or int8-quantized):
    block key jb is visible to query i iff jb ≤ i (causal). ksn/vsn
    [B,S,H] are the new keys' scales in the int8 path.

    Exactness: block scores use the SAME block-diagonal selector einsum
    as the cache scores, so per-element results are bit-identical to
    what the write-then-attend path computed reading those keys back
    from the cache (the MXU contraction over H*D doesn't depend on T);
    the int8 probs quantization takes its per-(row, query, head) scale
    over cache+block jointly (max is order-independent). Only softmax's
    fp32 sum order differs — reduction-order noise, same class the
    S=1-vs-multi paths already tolerate."""
    B, S, HD = q3.shape
    D = HD // n_head
    T = k_cache.shape[1]
    sel = jnp.asarray(_bd_selector(n_head, D)[:, :n_head])
    quant = k_cache.dtype == jnp.int8
    SH = S * n_head

    if quant:
        qh = q3.astype(jnp.float32).reshape(B, S, n_head, D)
        qscale = jnp.maximum(jnp.max(jnp.abs(qh), axis=-1), 1e-10) / 127.0
        q8 = jnp.clip(jnp.round(qh / qscale[..., None]), -127, 127)
        q8f = q8.reshape(B, S, HD)
        qbd = (q8f[:, :, :, None] * sel[None, None]).astype(jnp.int8)
        qbd = qbd.transpose(0, 2, 1, 3).reshape(B, HD, SH)
        sc_c = jnp.einsum("btk,bkm->btm", k_cache, qbd,
                          preferred_element_type=jnp.int32
                          ).reshape(B, T, S, n_head).astype(jnp.float32)
        sc_c = sc_c * ks[:, :, None, :] * qscale[:, None] * (D ** -0.5)
        sc_n = jnp.einsum("bjk,bkm->bjm", k_new, qbd,
                          preferred_element_type=jnp.int32
                          ).reshape(B, S, S, n_head).astype(jnp.float32)
        sc_n = sc_n * ksn[:, :, None, :] * qscale[:, None] * (D ** -0.5)
    else:
        qbd = (q3[:, :, :, None] * sel.astype(q3.dtype)[None, None])
        qbd = qbd.transpose(0, 2, 1, 3).reshape(B, HD, SH)
        sc_c = jnp.einsum("btk,bkm->btm", k_cache, qbd,
                          preferred_element_type=jnp.float32
                          ).reshape(B, T, S, n_head) * (D ** -0.5)
        sc_n = jnp.einsum("bjk,bkm->bjm", k_new, qbd,
                          preferred_element_type=jnp.float32
                          ).reshape(B, S, S, n_head) * (D ** -0.5)

    neg = jnp.finfo(jnp.float32).min
    if cache_mask is not None:
        sc_c = jnp.where(cache_mask[:, :, None, None], sc_c, neg)
    blk = (jnp.arange(S)[:, None] <= jnp.arange(S)[None, :])  # [jb, i]
    sc_n = jnp.where(blk[None, :, :, None], sc_n, neg)
    probs = jax.nn.softmax(jnp.concatenate([sc_c, sc_n], axis=1),
                           axis=1)                   # over T + S keys
    p_c, p_n = probs[:, :T], probs[:, T:]
    if quant:
        pv_c = p_c * vs[:, :, None, :]
        pv_n = p_n * vsn[:, :, None, :]
        pscale = jnp.maximum(jnp.maximum(jnp.max(pv_c, axis=1),
                                         jnp.max(pv_n, axis=1)),
                             1e-20) / 127.0          # [B, S, H]
        p8c = jnp.clip(jnp.round(pv_c / pscale[:, None]), -127, 127
                       ).astype(jnp.int8)
        p8n = jnp.clip(jnp.round(pv_n / pscale[:, None]), -127, 127
                       ).astype(jnp.int8)
        out_i = (jnp.einsum("btm,btk->bmk", p8c.reshape(B, T, SH),
                            v_cache, preferred_element_type=jnp.int32)
                 + jnp.einsum("bjm,bjk->bmk", p8n.reshape(B, S, SH),
                              v_new, preferred_element_type=jnp.int32))
        out = (out_i.reshape(B, S, n_head, HD).astype(jnp.float32)
               * pscale[..., None])
    else:
        out = (jnp.einsum("btm,btk->bmk",
                          p_c.reshape(B, T, SH).astype(v_cache.dtype),
                          v_cache, preferred_element_type=jnp.float32)
               + jnp.einsum("bjm,bjk->bmk",
                            p_n.reshape(B, S, SH).astype(v_new.dtype),
                            v_new, preferred_element_type=jnp.float32)
               ).reshape(B, S, n_head, HD)
    out5 = out.reshape(B, S, n_head, n_head, D)
    eye = jnp.asarray(np.eye(n_head, dtype=np.float32))
    return jnp.einsum("bshgd,hg->bshd", out5, eye).reshape(
        B, S, HD).astype(q3.dtype)


def _attend_decode_flat_beam(q3, k_cache, v_cache, anc_mask, k_new, v_new,
                             n_head, *, ks=None, vs=None,
                             ksn=None, vsn=None):
    """Beam-group self-attention WITHOUT cache reordering.

    Beam search logically requires each new beam to inherit its parent's
    KV history; materializing that as a physical row gather costs a full
    cache rewrite per step (measured 5.6 ms of the 13.2 ms G=4 K=5
    large-v3 step — the axis-1 gather runs at ~170 GB/s;
    tools/beam_step_components.py). Here the cache stays PUT: the K
    beams of a group attend jointly over the group's K·T cache entries
    (a free reshape of the row-contiguous [G*K, T, HD] layout), and an
    ANCESTRY mask selects, per (query beam, position), which row held
    that beam's history when the position was written. The caller
    updates the mask per step (gather by parent + set own bit) — 14 KB
    per group instead of ~1 GB of permuted cache.

    q3     [G, K, HD]       one query per beam
    k/v_cache [G, K*T, HD]  the group's rows, flattened (row-major: key
                            index j = row*T + t); bf16 or int8
    anc_mask [G, K, K*T]    query i may see key j iff its ancestry wrote j
    k/v_new  [G, K, HD]     this step's keys — query i sees ONLY its own
                            (identity block mask; other beams' new keys
                            belong to different hypotheses); ALREADY in
                            cache dtype (bf16-cast or int8-quantized)
    ks/vs    [G, K*T, H]    int8 mode: per-(key, head) cache scales
    ksn/vsn  [G, K, H]      int8 mode: the new keys' scales

    Exactness: scores use the same block-diagonal selector einsum as
    every other flat path (contraction over HD is position-independent),
    and masked-out keys contribute exp(-inf)=0 to the softmax sum —
    the same values the gathered formulation sums, plus exact zeros;
    only fp32 summation order differs (reduction-order noise, same class
    the S=1-vs-multi paths already tolerate). The int8 branch mirrors
    _attend_decode_flat_ro: per-(group, beam, head) query quantization,
    scale folds into scores/probs, joint prob scale over cache+block —
    the MXU sees int8×int8→int32 dots only."""
    G, K, HD = q3.shape
    D = HD // n_head
    Tk = k_cache.shape[1]
    sel = jnp.asarray(_bd_selector(n_head, D)[:, :n_head])
    quant = k_cache.dtype == jnp.int8
    SH = K * n_head

    if quant:
        qh = q3.astype(jnp.float32).reshape(G, K, n_head, D)
        qscale = jnp.maximum(jnp.max(jnp.abs(qh), axis=-1), 1e-10) / 127.0
        q8 = jnp.clip(jnp.round(qh / qscale[..., None]), -127, 127)
        q8f = q8.reshape(G, K, HD)
        qbd = (q8f[:, :, :, None] * sel[None, None]).astype(jnp.int8)
        qbd = qbd.transpose(0, 2, 1, 3).reshape(G, HD, SH)
        sc_c = jnp.einsum("gtk,gkm->gtm", k_cache, qbd,
                          preferred_element_type=jnp.int32
                          ).reshape(G, Tk, K, n_head).astype(jnp.float32)
        sc_c = sc_c * ks[:, :, None, :] * qscale[:, None] * (D ** -0.5)
        sc_n = jnp.einsum("gjk,gkm->gjm", k_new, qbd,
                          preferred_element_type=jnp.int32
                          ).reshape(G, K, K, n_head).astype(jnp.float32)
        sc_n = sc_n * ksn[:, :, None, :] * qscale[:, None] * (D ** -0.5)
    else:
        qbd = (q3[:, :, :, None] * sel.astype(q3.dtype)[None, None])
        qbd = qbd.transpose(0, 2, 1, 3).reshape(G, HD, SH)
        sc_c = jnp.einsum("gtk,gkm->gtm", k_cache, qbd,
                          preferred_element_type=jnp.float32
                          ).reshape(G, Tk, K, n_head) * (D ** -0.5)
        sc_n = jnp.einsum("gjk,gkm->gjm", k_new, qbd,
                          preferred_element_type=jnp.float32
                          ).reshape(G, K, K, n_head) * (D ** -0.5)

    neg = jnp.finfo(jnp.float32).min
    # anc_mask [G, K(q), Tk] → [G, Tk, K(q), 1]
    sc_c = jnp.where(anc_mask.transpose(0, 2, 1)[..., None], sc_c, neg)
    blk = jnp.eye(K, dtype=bool)                       # [jb, i]
    sc_n = jnp.where(blk[None, :, :, None], sc_n, neg)
    probs = jax.nn.softmax(jnp.concatenate([sc_c, sc_n], axis=1),
                           axis=1)                     # over Tk + K keys
    p_c, p_n = probs[:, :Tk], probs[:, Tk:]
    if quant:
        pv_c = p_c * vs[:, :, None, :]
        pv_n = p_n * vsn[:, :, None, :]
        pscale = jnp.maximum(jnp.maximum(jnp.max(pv_c, axis=1),
                                         jnp.max(pv_n, axis=1)),
                             1e-20) / 127.0            # [G, K, H]
        p8c = jnp.clip(jnp.round(pv_c / pscale[:, None]), -127, 127
                       ).astype(jnp.int8)
        p8n = jnp.clip(jnp.round(pv_n / pscale[:, None]), -127, 127
                       ).astype(jnp.int8)
        out_i = (jnp.einsum("gtm,gtk->gmk", p8c.reshape(G, Tk, SH),
                            v_cache, preferred_element_type=jnp.int32)
                 + jnp.einsum("gjm,gjk->gmk", p8n.reshape(G, K, SH),
                              v_new, preferred_element_type=jnp.int32))
        out = (out_i.reshape(G, K, n_head, HD).astype(jnp.float32)
               * pscale[..., None])
    else:
        out = (jnp.einsum("gtm,gtk->gmk",
                          p_c.reshape(G, Tk, SH).astype(v_cache.dtype),
                          v_cache, preferred_element_type=jnp.float32)
               + jnp.einsum("gjm,gjk->gmk",
                            p_n.reshape(G, K, SH).astype(v_new.dtype),
                            v_new, preferred_element_type=jnp.float32)
               ).reshape(G, K, n_head, HD)
    out5 = out.reshape(G, K, n_head, n_head, D)
    eye = jnp.asarray(np.eye(n_head, dtype=np.float32))
    return jnp.einsum("bshgd,hg->bshd", out5, eye).reshape(
        G, K, HD).astype(q3.dtype)


def _attend_views(q4, k4, v4, mask, *, ks=None, vs=None):
    """Multi-query attention on [B, T, H, D] views of flat KV (prefill
    path; S>1 is rare so per-head einsums are fine here).

    q4 [B,S,H,D]; k4/v4 [B,T,H,D] (int8 or float); ks/vs [B,T,H]."""
    dh = q4.shape[-1]
    compute = q4.dtype
    scores = jnp.einsum("bqhd,bkhd->bhqk", q4, k4.astype(compute),
                        preferred_element_type=jnp.float32)
    if ks is not None:
        scores = scores * ks.transpose(0, 2, 1)[:, :, None, :]
    scores = scores * (dh ** -0.5)
    if mask is not None:
        scores = jnp.where(mask, scores, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    if vs is not None:
        probs = probs * vs.transpose(0, 2, 1)[:, :, None, :]
    out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(compute),
                     v4.astype(compute))
    B, S = q4.shape[:2]
    return out.reshape(B, S, -1).astype(q4.dtype)


def _decode_flat_ro(cfg: WhisperConfig, params: Params, x: jax.Array,
                    pos: jax.Array, cache, cross_kv, cross_group: int = 1
                    ) -> tuple[jax.Array, KVCache]:
    """decode() body for S·H ≤ 128: the self-cache rides the layer scan
    as a READ-ONLY xs operand and the step's new K/V come back as the
    scan's only ys ([L,B,S,H*D] — 2.6 MB at large-v3/B=32 vs the 1.3 GB
    cache), written into the cache ONCE at the end. Inside a caller's
    decode loop that write is in-place on the loop carry; the old
    update-inside-scan path rewrote the entire cache through stacked ys
    every step (+7.3 ms of the 18.3 ms B=32 step,
    tools/decode_step_variants.py variants B/C/G).

    cross_group > 1: beam mode — every group of `cross_group` consecutive
    rows SHARES one cross-KV row (cross_kv batch = B / cross_group). The
    group's rows are folded into the query dimension of the multi-query
    flat attention, so the shared cross-KV is read ONCE per group instead
    of once per beam (the dominant decode read at K=5: ~2 GB/step of
    redundant int8 cross-KV traffic at G=4 groups, large-v3)."""
    dec = params["decoder"]
    B, S, _ = x.shape
    n_head = cfg.n_text_head
    max_len = cache.k.shape[2]
    per_row = jnp.asarray(pos).ndim == 1
    quantized = isinstance(cross_kv, QuantKVCache)
    quant_self = isinstance(cache, QuantKVCache)

    # Cache key j is visible iff j < pos_row — positions ≥ pos_row live
    # in the block (causal inside it), so unlike the write-then-attend
    # path the cache mask has no per-query dimension.
    key_idx = jnp.arange(max_len)[None, :]
    cache_mask = key_idx < (pos[:, None] if per_row else pos)

    def block(x, scanned):
        if quantized:
            if quant_self:
                (lp, k_cache, v_cache, ks_c, vs_c, xk, xks, xv,
                 xvs) = scanned
            else:
                lp, k_cache, v_cache, xk, xks, xv, xvs = scanned
        else:
            if quant_self:
                lp, k_cache, v_cache, ks_c, vs_c, xk, xv = scanned
            else:
                lp, k_cache, v_cache, xk, xv = scanned
            xks = xvs = None
        h = layer_norm(x, lp["ln1_scale"], lp["ln1_bias"])
        q = _mm(h, lp["q_w"]) + lp["q_b"]                    # [B, S, HD]
        k_new = _mm(h, lp["k_w"])
        v_new = _mm(h, lp["v_w"]) + lp["v_b"]
        if quant_self:
            k8, k_s = _quantize_heads(k_new, n_head)
            v8, v_s = _quantize_heads(v_new, n_head)
            attn = _attend_decode_flat_ro(
                q, k_cache, v_cache, cache_mask, k8, v8, n_head,
                ks=ks_c, vs=vs_c, ksn=k_s, vsn=v_s)
            ys = (k8, k_s, v8, v_s)
        else:
            kc_new = k_new.astype(k_cache.dtype)
            vc_new = v_new.astype(v_cache.dtype)
            attn = _attend_decode_flat_ro(
                q, k_cache, v_cache, cache_mask, kc_new, vc_new,
                n_head)
            ys = (kc_new, vc_new)
        x = x + _mm(attn, lp["o_w"]) + lp["o_b"]
        # --- cross-attention (already read-only) ---
        h = layer_norm(x, lp["ln2_scale"], lp["ln2_bias"])
        xq = _mm(h, lp["xq_w"]) + lp["xq_b"]
        if cross_group > 1:
            # Beam rows share the group's cross-KV row: fold the group
            # into the query dim (order restored by the inverse reshape;
            # cross attention has no mask, so query order is free).
            Gc = B // cross_group
            xq_g = xq.reshape(Gc, cross_group * S, xq.shape[-1])
            attn = _attend_decode_flat_multi(
                xq_g, xk, xv, None, n_head, ks=xks, vs=xvs)
            attn = attn.reshape(B, S, xq.shape[-1])
        elif S == 1:
            attn = _attend_decode_flat(
                xq[:, 0], xk, xv, None, n_head,
                ks=xks, vs=xvs)[:, None]
        else:
            attn = _attend_decode_flat_multi(
                xq, xk, xv, None, n_head, ks=xks, vs=xvs)
        x = x + _mm(attn, lp["xo_w"]) + lp["xo_b"]
        h = layer_norm(x, lp["ln3_scale"], lp["ln3_bias"])
        x = x + _mlp(h, lp)
        return x, ys

    self_xs = ((cache.k, cache.v, cache.k_scale, cache.v_scale)
               if quant_self else (cache.k, cache.v))
    if quantized:
        xs = (dec["layers"], *self_xs, cross_kv.k, cross_kv.k_scale,
              cross_kv.v, cross_kv.v_scale)
    else:
        xs = (dec["layers"], *self_xs, cross_kv.k, cross_kv.v)
    x, deltas = jax.lax.scan(block, x, xs)

    def write(buf, new):
        """buf [L,B,T,...] ← new [L,B,S,...] at the shared or per-row
        offset — the step's ONLY cache write. Per-row uses one batched
        scatter (advanced indexing) rather than a vmapped
        dynamic_update_slice: the scatter keeps the batch/feature dims
        intact for SPMD propagation (the vmap form made the partitioner
        involuntarily rematerialize the donated cache on meshes)."""
        if per_row:
            b_idx = jnp.arange(B)[:, None]                    # [B, 1]
            t_idx = pos[:, None] + jnp.arange(S)[None, :]     # [B, S]
            return buf.at[:, b_idx, t_idx].set(new,
                                               mode="drop",
                                               unique_indices=True)
        return jax.lax.dynamic_update_slice(
            buf, new, (0, 0, pos) + (0,) * (buf.ndim - 3))

    if quant_self:
        k8, k_s, v8, v_s = deltas
        new_cache = QuantKVCache(write(cache.k, k8),
                                 write(cache.k_scale, k_s),
                                 write(cache.v, v8),
                                 write(cache.v_scale, v_s))
    else:
        new_cache = KVCache(write(cache.k, deltas[0]),
                            write(cache.v, deltas[1]))

    x = layer_norm(x, dec["ln_scale"], dec["ln_bias"])
    logits = jnp.dot(x.astype(jnp.float32),
                     dec["tok_emb"].T.astype(jnp.float32),
                     preferred_element_type=jnp.float32)
    if cfg.n_vocab_padded > cfg.n_vocab:
        pad_mask = jnp.arange(cfg.n_vocab_padded) >= cfg.n_vocab
        logits = jnp.where(pad_mask[None, None],
                           jnp.finfo(jnp.float32).min, logits)
    return logits, new_cache


def decode_beam_step(cfg: WhisperConfig, params: Params,
                     tokens: jax.Array, pos: jax.Array, cache: KVCache,
                     anc_mask: jax.Array, cross_kv
                     ) -> tuple[jax.Array, KVCache]:
    """One beam-search decode step for G groups of K beams — no cache
    reorder, no cross-KV tiling.

    tokens [G, K] (each beam's next token), pos [G] (groups advance in
    lockstep), cache [L, G*K, T, H*D] (rows group-major, NEVER permuted;
    KVCache bf16 or QuantKVCache int8 with [L, G*K, T, H] scales),
    anc_mask [G, K, K*T] (ancestry: query beam i may see flattened cache
    key j = row*T + t iff its history wrote it — see
    _attend_decode_flat_beam), cross_kv [L, G, A, ...] (ONE copy per
    group, bf16 or int8).

    int8 self-cache mode quantizes each beam's new K/V at write time
    (per-(row, head) scales, _quantize_heads recipe); the scale rows
    ride the SAME ancestry mask as the values — a key's scale is read
    exactly when the key is.

    The caller owns the ancestry update (gather by parent + set own bit
    at `pos` for the next step); this function only consumes the mask.
    Returns (logits [G, K, V] fp32, cache with each beam's new K/V
    written at (row, pos)). Requires K · n_head ≤ 128."""
    dec = params["decoder"]
    G, K = tokens.shape
    n_head = cfg.n_text_head
    L, GK, T, HD = cache.k.shape
    if K * n_head > 128:
        raise ValueError(f"K·H = {K * n_head} > 128: the grouped beam "
                         "step needs one lane tile")
    quantized = isinstance(cross_kv, QuantKVCache)
    quant_self = isinstance(cache, QuantKVCache)

    x = dec["tok_emb"][tokens]                           # [G, K, D]
    x = x + dec["pos_emb"][pos][:, None].astype(x.dtype)

    flat = lambda a: a.reshape(L, G, K * T, *a.shape[3:])

    def block(x, scanned):
        if quantized:
            if quant_self:
                (lp, k_cache, v_cache, ks_c, vs_c, xk, xks, xv,
                 xvs) = scanned
            else:
                lp, k_cache, v_cache, xk, xks, xv, xvs = scanned
        else:
            if quant_self:
                lp, k_cache, v_cache, ks_c, vs_c, xk, xv = scanned
            else:
                lp, k_cache, v_cache, xk, xv = scanned
            xks = xvs = None
        h = layer_norm(x, lp["ln1_scale"], lp["ln1_bias"])
        q = _mm(h, lp["q_w"]) + lp["q_b"]                # [G, K, HD]
        k_new = _mm(h, lp["k_w"])
        v_new = _mm(h, lp["v_w"]) + lp["v_b"]
        if quant_self:
            k8, k_s = _quantize_heads(k_new, n_head)
            v8, v_s = _quantize_heads(v_new, n_head)
            attn = _attend_decode_flat_beam(
                q, k_cache, v_cache, anc_mask, k8, v8, n_head,
                ks=ks_c, vs=vs_c, ksn=k_s, vsn=v_s)
            ys = (k8, k_s, v8, v_s)
        else:
            kc_new = k_new.astype(k_cache.dtype)
            vc_new = v_new.astype(v_cache.dtype)
            attn = _attend_decode_flat_beam(q, k_cache, v_cache, anc_mask,
                                            kc_new, vc_new, n_head)
            ys = (kc_new, vc_new)
        x = x + _mm(attn, lp["o_w"]) + lp["o_b"]
        h = layer_norm(x, lp["ln2_scale"], lp["ln2_bias"])
        xq = _mm(h, lp["xq_w"]) + lp["xq_b"]
        attn = _attend_decode_flat_multi(xq, xk, xv, None, n_head,
                                         ks=xks, vs=xvs)
        x = x + _mm(attn, lp["xo_w"]) + lp["xo_b"]
        h = layer_norm(x, lp["ln3_scale"], lp["ln3_bias"])
        x = x + _mlp(h, lp)
        return x, ys

    self_xs = ((flat(cache.k), flat(cache.v), flat(cache.k_scale),
                flat(cache.v_scale)) if quant_self
               else (flat(cache.k), flat(cache.v)))
    if quantized:
        xs = (dec["layers"], *self_xs, cross_kv.k,
              cross_kv.k_scale, cross_kv.v, cross_kv.v_scale)
    else:
        xs = (dec["layers"], *self_xs, cross_kv.k, cross_kv.v)
    x, deltas = jax.lax.scan(block, x, xs)

    # Delta write: beam (g, i) → row g*K + i at position pos[g]. One
    # batched scatter, same shape discipline as _decode_flat_ro.write.
    pos_rep = jnp.repeat(pos, K)                         # [GK]
    b_idx = jnp.arange(GK)[:, None]
    t_idx = pos_rep[:, None] + jnp.zeros((1, 1), jnp.int32)

    def write(buf, new):                         # new [L, G, K, HD|H]
        return buf.at[:, b_idx, t_idx].set(
            new.reshape(L, GK, 1, new.shape[-1]), mode="drop",
            unique_indices=True)

    if quant_self:
        k8, k_s, v8, v_s = deltas
        new_cache = QuantKVCache(write(cache.k, k8),
                                 write(cache.k_scale, k_s),
                                 write(cache.v, v8),
                                 write(cache.v_scale, v_s))
    else:
        new_cache = KVCache(write(cache.k, deltas[0]),
                            write(cache.v, deltas[1]))

    x = layer_norm(x, dec["ln_scale"], dec["ln_bias"])
    logits = jnp.dot(x.astype(jnp.float32),
                     dec["tok_emb"].T.astype(jnp.float32),
                     preferred_element_type=jnp.float32)
    if cfg.n_vocab_padded > cfg.n_vocab:
        pad_mask = jnp.arange(cfg.n_vocab_padded) >= cfg.n_vocab
        logits = jnp.where(pad_mask[None, None],
                           jnp.finfo(jnp.float32).min, logits)
    return logits, new_cache


def decode(cfg: WhisperConfig, params: Params, tokens: jax.Array,
           pos: jax.Array, cache: KVCache, cross_kv: KVCache, *,
           cross_group: int = 1,
           ) -> tuple[jax.Array, KVCache]:
    """Run the decoder on `tokens` [B, S] starting at position `pos`,
    attending to cached self-attention history and precomputed cross K/V.
    Handles both prefill (S>1) and single-token AR steps (S=1) with the same
    compiled graph per S.

    `pos` may be a scalar (all rows at the same offset — one-shot decode) or
    a [B] vector (continuous batching: every slot at its own offset).

    cross_group > 1 (beam search): every group of `cross_group` consecutive
    rows shares ONE cross-KV row (cross_kv batch must be B / cross_group) —
    the shared audio context is read once per group, not once per beam.
    Requires cross_group · S · n_head ≤ 128 (one lane tile).

    Returns (logits [B, S, n_vocab_padded] fp32, updated cache).
    """
    dec = params["decoder"]
    B, S = tokens.shape
    n_head = cfg.n_text_head
    max_len = cache.k.shape[2]          # flat cache [L, B, T, H*Dh]
    pos = jnp.asarray(pos)
    per_row = pos.ndim == 1

    if cross_group > 1:
        if B % cross_group:
            raise ValueError(f"batch {B} not divisible by "
                             f"cross_group {cross_group}")
        if cross_group * S * n_head > 128:
            raise ValueError(
                f"cross_group·S·H = {cross_group * S * n_head} > 128: "
                "grouped cross-attention needs one lane tile (tile the "
                "cross-KV per row instead for this beam size)")

    x = dec["tok_emb"][tokens]
    if per_row:
        pos_ids = pos[:, None] + jnp.arange(S)[None, :]       # [B, S]
    else:
        pos_ids = pos + jnp.arange(S)
    x = x + dec["pos_emb"][pos_ids].astype(x.dtype)

    if S * n_head <= 128:
        # Hot paths (S=1 AR step, speculative verify, short prefill):
        # read-only cache + one delta write — see _attend_decode_flat_ro.
        return _decode_flat_ro(cfg, params, x, pos, cache, cross_kv,
                               cross_group)

    # Everything below is the LONG-PREFILL path (S·H > 128): the S=1 AR
    # step and all short blocks returned through _decode_flat_ro above,
    # so this body only ever sees write-then-attend prefills on the
    # head-view attention.
    key_idx = jnp.arange(max_len)[None, :]          # [1, max_len]
    q_idx = jnp.arange(S)[:, None]                  # [S, 1]
    if per_row:
        self_mask = (key_idx[None] <=
                     (pos[:, None, None] + q_idx[None]))[:, None]
    else:
        self_mask = (key_idx <= pos + q_idx)[None, None]

    def _update_cache(c, new):
        """c [B,T,...] ← new [B,S,...] at per-row or shared offset.
        Casts to the cache dtype: a bf16 serving cache composes with
        fp32 params (tests) without caring who allocated what."""
        new = new.astype(c.dtype)
        if per_row:
            return jax.vmap(
                lambda cb, nb, p: jax.lax.dynamic_update_slice(
                    cb, nb, (p,) + (0,) * (cb.ndim - 1)))(c, new, pos)
        return jax.lax.dynamic_update_slice(
            c, new, (0, pos) + (0,) * (c.ndim - 2))

    quantized = isinstance(cross_kv, QuantKVCache)
    # Opt-in int8 SELF-cache (halves the third-largest decode read):
    # values int8 [L,B,T,H*Dh] + per-(position, head) scales, quantized
    # at write time, consumed by the same scale-folded attention paths
    # as the int8 cross-KV.
    quant_self = isinstance(cache, QuantKVCache)
    d_model = cfg.n_text_state
    dh = d_model // n_head

    def block(x, scanned):
        if quantized:
            (lp, k_cache, v_cache, *self_scales, xk, xks, xv,
             xvs) = scanned
        else:
            lp, k_cache, v_cache, *self_scales, xk, xv = scanned
        # --- causal self-attention against the cache ---
        h = layer_norm(x, lp["ln1_scale"], lp["ln1_bias"])
        q = _mm(h, lp["q_w"]) + lp["q_b"]                    # [B, S, HD]
        k_new = _mm(h, lp["k_w"])
        v_new = _mm(h, lp["v_w"]) + lp["v_b"]
        if quant_self:
            ks_cache, vs_cache = self_scales
            k8, k_s = _quantize_heads(k_new, n_head)
            v8, v_s = _quantize_heads(v_new, n_head)
            k_cache = _update_cache(k_cache, k8)
            v_cache = _update_cache(v_cache, v8)
            ks_cache = _update_cache(ks_cache, k_s)
            vs_cache = _update_cache(vs_cache, v_s)
            self_ks, self_vs = ks_cache, vs_cache
        else:
            k_cache = _update_cache(k_cache, k_new)
            v_cache = _update_cache(v_cache, v_new)
            self_ks = self_vs = None
        attn = _attend_views(
            q.reshape(B, S, n_head, dh),
            k_cache.reshape(B, max_len, n_head, dh),
            v_cache.reshape(B, max_len, n_head, dh), self_mask,
            ks=self_ks, vs=self_vs)
        x = x + _mm(attn, lp["o_w"]) + lp["o_b"]
        # --- cross-attention over audio features ---
        h = layer_norm(x, lp["ln2_scale"], lp["ln2_bias"])
        xq = _mm(h, lp["xq_w"]) + lp["xq_b"]                 # [B, S, HD]
        T_a = xk.shape[1]
        attn = _attend_views(
            xq.reshape(B, S, n_head, dh),
            xk.reshape(B, T_a, n_head, dh),
            xv.reshape(B, T_a, n_head, dh), None,
            ks=xks if quantized else None,
            vs=xvs if quantized else None)
        x = x + _mm(attn, lp["xo_w"]) + lp["xo_b"]
        # --- MLP ---
        h = layer_norm(x, lp["ln3_scale"], lp["ln3_bias"])
        x = x + _mlp(h, lp)
        if quant_self:
            return x, (k_cache, v_cache, ks_cache, vs_cache)
        return x, (k_cache, v_cache)

    self_cache = ((cache.k, cache.v, cache.k_scale, cache.v_scale)
                  if quant_self else (cache.k, cache.v))
    if quantized:
        xs = (dec["layers"], *self_cache, cross_kv.k,
              cross_kv.k_scale, cross_kv.v, cross_kv.v_scale)
    else:
        xs = (dec["layers"], *self_cache, cross_kv.k, cross_kv.v)
    x, cache_out = jax.lax.scan(block, x, xs)
    new_cache = (QuantKVCache(cache_out[0], cache_out[2], cache_out[1],
                              cache_out[3]) if quant_self
                 else KVCache(*cache_out))

    x = layer_norm(x, dec["ln_scale"], dec["ln_bias"])
    logits = jnp.dot(x.astype(jnp.float32),
                     dec["tok_emb"].T.astype(jnp.float32),
                     preferred_element_type=jnp.float32)
    # Mask vocab padding.
    if cfg.n_vocab_padded > cfg.n_vocab:
        pad_mask = jnp.arange(cfg.n_vocab_padded) >= cfg.n_vocab
        logits = jnp.where(pad_mask[None, None], jnp.finfo(jnp.float32).min,
                           logits)
    return logits, new_cache


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
