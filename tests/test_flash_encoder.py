"""Encoder flash-attention path (Pallas TPU kernel; dense jnp fallback on
CPU). On the CPU test backend this verifies selection logic + fallback;
under OPENHUSH_TEST_TPU=1 it checks flash-vs-dense numerics on the real
kernel."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openhush_tpu.models.whisper import model as whisper
from openhush_tpu.models.whisper.config import CONFIGS


def test_flash_gate_on_cpu():
    q = jnp.zeros((1, 2, 128, 64), jnp.float32)
    if jax.default_backend() != "tpu":
        assert not whisper._flash_ok(q)


def test_encode_runs_and_matches_reference_shape():
    cfg = CONFIGS["test"]
    params = whisper.init_params(cfg, jax.random.PRNGKey(0),
                                 dtype=jnp.float32)
    mel = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, 80, 3000)).astype(np.float32))
    out = whisper.encode(cfg, params, mel)
    assert out.shape == (1, cfg.n_audio_ctx, cfg.n_audio_state)
    assert bool(jnp.isfinite(out).all())


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="flash kernel needs TPU")
def test_flash_matches_dense_on_tpu():
    """Same weights, same mel: flash and dense encoder outputs agree to
    bf16 accumulation tolerance (padding rows masked correctly)."""
    cfg = CONFIGS["test"]          # T=1500: exercises the pad-to-1536 path
    params = whisper.init_params(cfg, jax.random.PRNGKey(0),
                                 dtype=jnp.bfloat16)
    mel = jnp.asarray(0.3 * np.random.default_rng(1).standard_normal(
        (2, 80, 3000)), jnp.bfloat16)
    dense = None
    os.environ["OPENHUSH_NO_FLASH"] = "1"
    try:
        dense = np.asarray(jax.jit(whisper.encode, static_argnums=0)(
            cfg, params, mel), np.float32)
    finally:
        del os.environ["OPENHUSH_NO_FLASH"]
    flash = np.asarray(jax.jit(whisper.encode, static_argnums=0)(
        cfg, params, mel), np.float32)
    np.testing.assert_allclose(flash, dense, atol=5e-2, rtol=5e-2)
    # Padding must not leak: re-run with different content in what would
    # be the padded tail — irrelevant here since mel fully covers T.
