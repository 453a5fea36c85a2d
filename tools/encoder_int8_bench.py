"""int8-encoder experiment: do int8×int8 MXU projections beat bf16?

The encoder's matmul projections (QKV/out/MLP) are ~26 TFLOP per
large-v3 B=16 batch; v5e's int8 MXU peak is ~2x bf16. This measures a
variant where every linear runs dynamic per-row activation int8 against
per-column int8 weights (attention itself stays bf16 flash), reporting
wall time and logit drift vs the bf16 encoder — measurement only, like
tools/encoder_phases.py; a shipped rung would go behind the WER gate.

Usage: python tools/encoder_int8_bench.py [model] [batch]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bench_util import bench, fence as _fence
from openhush_tpu.models.whisper import model as whisper
from openhush_tpu.models.whisper.config import get_config
from openhush_tpu.ops import frontend_pallas, mel as mel_ops


def quantize_w(w):
    """[d, out] → (int8 [d, out], fp32 [out]) per-column scales."""
    w32 = w.astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(w32), axis=0), 1e-10) * (1 / 127)
    q = jnp.clip(jnp.round(w32 / scale[None, :]), -127, 127
                 ).astype(jnp.int8)
    return q, scale


def int8_mm(x, wq, wscale):
    """x [..., d] bf16 → fp32 out: dynamic per-row activation int8,
    native int8×int8→int32 MXU dot, rescale by (row × column) scales."""
    x32 = x.astype(jnp.float32)
    xs = jnp.maximum(jnp.max(jnp.abs(x32), axis=-1, keepdims=True),
                     1e-10) * (1 / 127)
    xq = jnp.clip(jnp.round(x32 / xs), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, wq, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * xs * wscale


def main() -> int:
    model = sys.argv[1] if len(sys.argv) > 1 else "large-v3"
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    cfg = get_config(model)
    params = whisper.init_params(cfg, jax.random.PRNGKey(0),
                                 dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    audio = jnp.asarray(
        0.1 * rng.standard_normal((B, mel_ops.N_SAMPLES)), jnp.float32)
    mel = jax.jit(lambda a: jax.vmap(lambda x: frontend_pallas.log_mel(
        x, n_mels=cfg.n_mels))(a).astype(jnp.bfloat16))(audio)
    _fence(mel)

    encode_bf16 = jax.jit(lambda p, m: whisper.encode(cfg, p, m))
    n_head = cfg.n_audio_head

    def prequant(params):
        enc = params["encoder"]
        lq = {}
        for name in ("q_w", "k_w", "v_w", "o_w", "fc1_w", "fc2_w"):
            q, s = jax.vmap(quantize_w)(enc["layers"][name])
            lq[name + "_q"], lq[name + "_s"] = q, s
        return {**enc["layers"], **lq}

    def encode_int8(params, layers, mel):
        enc = params["encoder"]
        x = mel.transpose(0, 2, 1)
        dn = ("NHC", "HIO", "NHC")
        x = jax.lax.conv_general_dilated(x, enc["conv1_w"], (1,), [(1, 1)],
                                         dimension_numbers=dn)
        x = jax.nn.gelu(x + enc["conv1_b"], approximate=False)
        x = jax.lax.conv_general_dilated(x, enc["conv2_w"], (2,), [(1, 1)],
                                         dimension_numbers=dn)
        x = jax.nn.gelu(x + enc["conv2_b"], approximate=False)
        x = x + enc["pos_emb"][None, : x.shape[1]].astype(x.dtype)

        def block(x, lp):
            h = whisper.layer_norm(x, lp["ln1_scale"], lp["ln1_bias"])
            q = whisper._split_heads(
                (int8_mm(h, lp["q_w_q"], lp["q_w_s"])
                 + lp["q_b"]).astype(x.dtype), n_head)
            k = whisper._split_heads(
                int8_mm(h, lp["k_w_q"], lp["k_w_s"]).astype(x.dtype),
                n_head)
            v = whisper._split_heads(
                (int8_mm(h, lp["v_w_q"], lp["v_w_s"])
                 + lp["v_b"]).astype(x.dtype), n_head)
            a = whisper._merge_heads(whisper._attend_full(q, k, v))
            x = x + (int8_mm(a, lp["o_w_q"], lp["o_w_s"])
                     + lp["o_b"]).astype(x.dtype)
            h = whisper.layer_norm(x, lp["ln2_scale"], lp["ln2_bias"])
            m = jax.nn.gelu((int8_mm(h, lp["fc1_w_q"], lp["fc1_w_s"])
                             + lp["fc1_b"]).astype(x.dtype),
                            approximate=False)
            x = x + (int8_mm(m, lp["fc2_w_q"], lp["fc2_w_s"])
                     + lp["fc2_b"]).astype(x.dtype)
            return x, None

        x, _ = jax.lax.scan(block, x, layers)
        return whisper.layer_norm(x, enc["ln_post_scale"],
                                  enc["ln_post_bias"])

    layers = jax.jit(prequant)(params)
    _fence(layers)
    enc8 = jax.jit(lambda p, l, m: encode_int8(p, l, m))

    t_bf16 = bench(encode_bf16, params, mel)
    t_int8 = bench(enc8, params, layers, mel)
    ref = np.asarray(encode_bf16(params, mel), np.float32)
    got = np.asarray(enc8(params, layers, mel), np.float32)
    denom = max(1e-6, float(np.abs(ref).max()))
    drift = float(np.abs(ref - got).max()) / denom
    print(f"model={model} B={B} backend={jax.default_backend()}")
    print(f"encode bf16: {t_bf16:8.1f} ms")
    print(f"encode int8: {t_int8:8.1f} ms  (speedup {t_bf16/t_int8:.2f}x)")
    print(f"max |drift| / max |ref|: {drift:.4f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
