"""Encoder sub-op timing: where do the ~580 ms of encode go?

Times, on the attached TPU: (a) the mel frontend, (b) the conv stem
alone, (c) the full encoder, (d) the full encoder with tanh-approximate
GELU (upper bound for swapping the exact erf), (e) a fused-QKV
projection variant (one [d, 3d] dot instead of three [d, d] dots per
layer), and (f) the W8A8 int8 encoder rung (int8 weights + per-row int8
activations on the MXU). Measurement-only — results feed the optimization notes in
docs/STATUS.md; any shipped change must stay parity-exact.

Usage: python tools/encoder_phases.py [model] [batch]
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


def main() -> int:
    model = sys.argv[1] if len(sys.argv) > 1 else "large-v3"
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    cfg = get_config(model)
    params = whisper.init_params(cfg, jax.random.PRNGKey(0),
                                 dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    audio = jnp.asarray(
        0.1 * rng.standard_normal((B, mel_ops.N_SAMPLES)), jnp.float32)

    @jax.jit
    def mel_only(audio):
        return jax.vmap(lambda a: frontend_pallas.log_mel(
            a, n_mels=cfg.n_mels))(audio).astype(jnp.bfloat16)

    mel = mel_only(audio)
    jax.block_until_ready(mel)

    @jax.jit
    def conv_stem(params, mel):
        enc = params["encoder"]
        x = mel.transpose(0, 2, 1)
        dn = ("NHC", "HIO", "NHC")
        x = jax.lax.conv_general_dilated(x, enc["conv1_w"], (1,), [(1, 1)],
                                         dimension_numbers=dn)
        x = jax.nn.gelu(x + enc["conv1_b"], approximate=False)
        x = jax.lax.conv_general_dilated(x, enc["conv2_w"], (2,), [(1, 1)],
                                         dimension_numbers=dn)
        x = jax.nn.gelu(x + enc["conv2_b"], approximate=False)
        return x

    encode = jax.jit(lambda p, m: whisper.encode(cfg, p, m))

    t_mel = bench(mel_only, audio)
    t_stem = bench(conv_stem, params, mel)
    t_full = bench(encode, params, mel)

    # (d) tanh-approximate GELU everywhere in the encoder.
    real_gelu = jax.nn.gelu
    try:
        jax.nn.gelu = lambda x, approximate=False: real_gelu(
            x, approximate=True)
        encode_tanh = jax.jit(lambda p, m: whisper.encode(cfg, p, m))
        t_tanh = bench(encode_tanh, params, mel)
    finally:
        jax.nn.gelu = real_gelu

    # (e) fused QKV: one [d, 3d] projection per layer.
    n_head = cfg.n_audio_head

    def encode_fused(params, mel):
        enc = params["encoder"]
        x = conv_stem(params, mel)
        x = x + enc["pos_emb"][None, : x.shape[1]].astype(x.dtype)
        layers = dict(enc["layers"])
        layers["qkv_w"] = jnp.concatenate(
            [enc["layers"]["q_w"], enc["layers"]["k_w"],
             enc["layers"]["v_w"]], axis=-1)
        layers["qkv_b"] = jnp.concatenate(
            [enc["layers"]["q_b"],
             jnp.zeros_like(enc["layers"]["q_b"]),
             enc["layers"]["v_b"]], axis=-1)

        def block(x, lp):
            h = whisper.layer_norm(x, lp["ln1_scale"], lp["ln1_bias"])
            qkv = h @ lp["qkv_w"] + lp["qkv_b"]
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q, k, v = (whisper._split_heads(a, n_head) for a in (q, k, v))
            x = x + whisper._merge_heads(
                whisper._attend_full(q, k, v)) @ lp["o_w"] + lp["o_b"]
            h = whisper.layer_norm(x, lp["ln2_scale"], lp["ln2_bias"])
            x = x + whisper._mlp(h, lp)
            return x, None

        x, _ = jax.lax.scan(block, x, layers)
        return whisper.layer_norm(x, enc["ln_post_scale"],
                                  enc["ln_post_bias"])

    t_fused = bench(jax.jit(encode_fused), params, mel)

    # (f) W8A8 int8 encoder rung: int8 weights + per-row int8 activations
    # on the MXU (model.quantize_encoder_weights / encode's block_i8).
    q_enc = whisper.quantize_encoder_weights(params)
    t_int8 = bench(encode, q_enc, mel)

    # Cross-KV projection + int8 quantization (the remainder of
    # bench_phases' "encode phase").
    feats = encode(params, mel)
    _fence(feats)
    xkv_quant = jax.jit(
        lambda p, f: whisper.compute_cross_kv_quant(cfg, p, f))
    t_xkv = bench(xkv_quant, params, feats)
    # Quantization alone, one layer's worth (×2L gives the full cost).
    quant_one = jax.jit(
        lambda f: whisper._quantize_heads(f, cfg.n_text_head))
    t_quant1 = bench(quant_one, feats)

    L = cfg.n_audio_layer
    print(f"model={model} B={B} layers={L} d={cfg.n_audio_state} "
          f"backend={jax.default_backend()}")
    print(f"mel frontend:        {t_mel:8.1f} ms")
    print(f"conv stem:           {t_stem:8.1f} ms")
    print(f"full encode:         {t_full:8.1f} ms "
          f"({(t_full - t_stem) / L:.2f} ms/layer)")
    print(f"encode tanh-gelu:    {t_tanh:8.1f} ms "
          f"(delta {t_full - t_tanh:+.1f})")
    print(f"encode fused-qkv:    {t_fused:8.1f} ms "
          f"(delta {t_full - t_fused:+.1f})")
    print(f"encode int8 W8A8:    {t_int8:8.1f} ms "
          f"(delta {t_full - t_int8:+.1f}, "
          f"{t_full / max(t_int8, 1e-9):.3f}x)")
    L2 = 2 * cfg.n_text_layer
    print(f"cross-KV int8 scan:  {t_xkv:8.1f} ms")
    print(f"quantize_heads x1:   {t_quant1:8.2f} ms "
          f"(x{L2} = {t_quant1 * L2:.1f} ms)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
