"""Fused quantize kernel == the XLA _quantize_heads formulation, bit for
bit (interpret mode off-TPU; the on-chip path shares the same fp32 ops)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openhush_tpu.models.whisper import model as whisper
from openhush_tpu.ops import quantize_pallas as qp


def _xla_reference(x, n_head):
    B, T, HD = x.shape
    x32 = jnp.asarray(x, jnp.float32).reshape(B, T, n_head, HD // n_head)
    scale = jnp.max(jnp.abs(x32), axis=-1) * jnp.float32(1.0 / 127.0)
    safe = jnp.maximum(scale, 1e-10)
    q = jnp.clip(jnp.round(x32 / safe[..., None]), -127, 127
                 ).astype(jnp.int8).reshape(B, T, HD)
    return np.asarray(q), np.asarray(safe)


@pytest.mark.parametrize("B,T,n_head,head_dim", [
    (2, 128, 4, 64),        # whisper-ish
    (1, 500, 20, 64),       # large-v3 cross-KV block shape
    (3, 192, 2, 128),
])
def test_kernel_matches_xla(B, T, n_head, head_dim):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, T, n_head * head_dim)) * 3,
                    jnp.bfloat16)
    q, s = qp.quantize_heads_pallas(x, n_head, interpret=True)
    q_ref, s_ref = _xla_reference(x, n_head)
    # Scales: bit-identical.
    np.testing.assert_array_equal(np.asarray(s), s_ref)
    # Values: identical except at exact .5 rounding ties, where the two
    # lowerings' division ULP may differ by one level (both valid).
    qn, qrn = np.asarray(q, np.int32), q_ref.astype(np.int32)
    diff = np.argwhere(qn != qrn)
    assert len(diff) <= qn.size * 1e-3
    x32 = np.asarray(x, np.float32).reshape(B, T, n_head, head_dim)
    for b, t, i in diff:
        assert abs(qn[b, t, i] - qrn[b, t, i]) == 1
        ratio = x32[b, t, i // head_dim, i % head_dim] / s_ref[
            b, t, i // head_dim]
        assert abs(ratio * 2 - round(ratio * 2)) < 1e-4, ratio


def test_kernel_handles_zeros_and_extremes():
    x = jnp.zeros((1, 128, 256), jnp.bfloat16)
    q, s = qp.quantize_heads_pallas(x, 4, interpret=True)
    assert np.all(np.asarray(q) == 0)
    assert np.all(np.asarray(s) == 1e-10)
    big = jnp.full((1, 128, 256), 3.0e4, jnp.bfloat16)
    q, s = qp.quantize_heads_pallas(big, 4, interpret=True)
    assert np.all(np.asarray(q) == 127)


def test_quantize_ok_gating():
    x = jnp.zeros((2, 1500, 1280), jnp.bfloat16)
    # CPU backend in tests → kernel must NOT be selected.
    assert not qp.quantize_ok(x, 20)
    assert not qp.quantize_ok(jnp.zeros((2, 1, 1280), jnp.bfloat16), 20)
    assert not qp.quantize_ok(jnp.zeros((2, 1500, 1283)), 20)


def test_model_quantize_heads_unchanged_on_cpu():
    # The model entry point keeps its XLA semantics on CPU.
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 96, 256)), jnp.bfloat16)
    q, s = whisper._quantize_heads(x, 4)
    q_ref, s_ref = _xla_reference(x, 4)
    np.testing.assert_array_equal(np.asarray(q), q_ref)
    np.testing.assert_array_equal(np.asarray(s), s_ref)


@pytest.mark.tpu
def test_kernel_on_chip_matches_xla():
    """Hardware-validation lane (OPENHUSH_TEST_TPU=1): the compiled
    Mosaic kernel agrees with the XLA path at the large-v3 cross-KV
    shape — scales bit-identical, values within the .5-tie allowance."""
    if jax.default_backend() != "tpu":
        pytest.skip("needs a real TPU")
    import os
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((4, 1500, 1280)) * 3,
                    jnp.bfloat16)
    kq, ks = qp.quantize_heads_pallas(x, 20)
    os.environ["OPENHUSH_NO_QUANT_KERNEL"] = "1"
    try:
        xq, xs = jax.jit(lambda a: whisper._quantize_heads(a, 20))(x)
    finally:
        os.environ.pop("OPENHUSH_NO_QUANT_KERNEL")
    np.testing.assert_array_equal(np.asarray(ks), np.asarray(xs))
    d = np.abs(np.asarray(kq, np.int32) - np.asarray(xq, np.int32))
    assert d.max() <= 1 and (d > 0).mean() < 1e-3
