"""Experimental Pallas decode-attention kernel: numerical correctness vs a
dense reference (interpret mode on CPU; validated on-chip at 3e-3 bf16)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openhush_tpu.ops.decode_attention import decode_cross_attend

INTERPRET = jax.devices()[0].platform != "tpu"


def _ref(q, k, v, t_actual):
    scores = np.einsum("bhd,bthd->bth", q, k)
    scores[:, t_actual:, :] = -1e30
    m = scores.max(axis=1, keepdims=True)
    e = np.exp(scores - m)
    p = e / e.sum(axis=1, keepdims=True)
    return np.einsum("bth,bthd->bhd", p, v)


@pytest.mark.parametrize("t_actual", [1500, 700])
def test_kernel_matches_dense(t_actual):
    B, H, D, T = 4, 20, 64, 1536
    hd = H * D
    rng = np.random.default_rng(0)
    q = rng.standard_normal((B, H, D)).astype(np.float32) * 0.5
    k = rng.standard_normal((B, T, H, D)).astype(np.float32) * 0.5
    v = rng.standard_normal((B, T, H, D)).astype(np.float32) * 0.5
    ref = _ref(q, k, v, t_actual).reshape(B, hd)
    out = np.asarray(decode_cross_attend(
        jnp.asarray(q.reshape(B, hd)),
        jnp.asarray(k.reshape(B, T, hd), jnp.bfloat16),
        jnp.asarray(v.reshape(B, T, hd), jnp.bfloat16),
        n_heads=H, t_actual=t_actual, interpret=INTERPRET))
    assert np.abs(out - ref).max() < 2e-2   # bf16 K/V quantization noise
    # Per-head structure: no cross-head leakage (zero a head's V → its
    # output slice must be ~0).
    v2 = v.copy()
    v2[:, :, 3, :] = 0.0
    out2 = np.asarray(decode_cross_attend(
        jnp.asarray(q.reshape(B, hd)),
        jnp.asarray(k.reshape(B, T, hd), jnp.bfloat16),
        jnp.asarray(v2.reshape(B, T, hd), jnp.bfloat16),
        n_heads=H, t_actual=t_actual, interpret=INTERPRET))
    assert np.abs(out2[:, 3 * 64:4 * 64]).max() < 1e-3
    np.testing.assert_allclose(out2[:, :3 * 64], out[:, :3 * 64],
                               atol=1e-2)


def test_kernel_int8_inputs():
    B, H, D, T = 2, 4, 64, 512
    hd = H * D
    rng = np.random.default_rng(1)
    q = rng.standard_normal((B, H, D)).astype(np.float32)
    k8 = rng.integers(-100, 100, (B, T, hd)).astype(np.int8)
    v8 = rng.integers(-100, 100, (B, T, hd)).astype(np.int8)
    out = np.asarray(decode_cross_attend(
        jnp.asarray(q.reshape(B, hd)), jnp.asarray(k8), jnp.asarray(v8),
        n_heads=H, interpret=INTERPRET))
    ref = _ref(q, k8.reshape(B, T, H, D).astype(np.float32),
               v8.reshape(B, T, H, D).astype(np.float32), T).reshape(B, hd)
    rel = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 2e-2


def test_dma_kernel_matches_dense():
    from openhush_tpu.ops.decode_attention_dma import decode_cross_attend_dma
    if INTERPRET:
        pytest.skip("v2 kernel uses explicit DMA — TPU only")
    B, H, D, T = 4, 20, 64, 1536
    hd = H * D
    rng = np.random.default_rng(0)
    q = rng.standard_normal((B, H, D)).astype(np.float32) * 0.5
    k = rng.standard_normal((B, T, H, D)).astype(np.float32) * 0.5
    v = rng.standard_normal((B, T, H, D)).astype(np.float32) * 0.5
    ref = _ref(q, k, v, 1500).reshape(B, hd)
    out = np.asarray(decode_cross_attend_dma(
        jnp.asarray(q.reshape(B, hd)),
        jnp.asarray(k.reshape(B, T, hd), jnp.bfloat16),
        jnp.asarray(v.reshape(B, T, hd), jnp.bfloat16),
        n_heads=H, t_actual=1500))
    assert np.abs(out - ref).max() < 2e-2
