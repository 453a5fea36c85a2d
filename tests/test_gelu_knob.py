"""OPENHUSH_GELU knob: tanh approximation tracks the exact erf GELU.

whisper.cpp's GGML evaluates a tanh-approximation GELU while
openai-whisper uses exact erf; the knob lets deployments pick the
whisper.cpp-flavored fast path (models/whisper/model.py:_gelu)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openhush_tpu.models.whisper import model as whisper
from openhush_tpu.models.whisper.config import get_config


@pytest.fixture(scope="module")
def setup():
    cfg = get_config("test")
    params = whisper.init_params(cfg, jax.random.PRNGKey(0),
                                 dtype=jnp.float32)
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal(
        (2, cfg.n_mels, 2 * cfg.n_audio_ctx)), jnp.float32)
    return cfg, params, mel


def _encode(cfg, params, mel):
    # The GELU mode caches per process (and jit caches per function
    # object): reset both so each call re-resolves the knob.
    whisper._GELU_MODE = None
    return np.asarray(jax.jit(
        lambda p, m: whisper.encode(cfg, p, m))(params, mel))


def test_tanh_gelu_close_to_erf(setup, monkeypatch):
    cfg, params, mel = setup
    monkeypatch.delenv("OPENHUSH_GELU", raising=False)
    exact = _encode(cfg, params, mel)
    monkeypatch.setenv("OPENHUSH_GELU", "tanh")
    approx = _encode(cfg, params, mel)
    # The knob must take effect...
    assert not np.array_equal(exact, approx)
    # ...and stay numerically close (per-activation error < 3e-3 before
    # layer mixing; the encoder output keeps it small).
    assert np.max(np.abs(exact - approx)) < 0.05
    assert np.allclose(exact, approx, atol=0.05)


def test_default_is_exact(setup, monkeypatch):
    cfg, params, mel = setup
    monkeypatch.delenv("OPENHUSH_GELU", raising=False)
    a = _encode(cfg, params, mel)
    monkeypatch.setenv("OPENHUSH_GELU", "erf")
    b = _encode(cfg, params, mel)
    np.testing.assert_array_equal(a, b)


def test_marker_flips_default(setup, monkeypatch, tmp_path):
    cfg, params, mel = setup
    monkeypatch.delenv("OPENHUSH_GELU", raising=False)
    monkeypatch.setenv("OPENHUSH_MODEL_DIR", str(tmp_path))
    erf_out = _encode(cfg, params, mel)
    (tmp_path / "gelu_tanh.ok").write_text("{}")
    marker_out = _encode(cfg, params, mel)
    assert not np.array_equal(erf_out, marker_out)
    # Env always wins over the marker.
    monkeypatch.setenv("OPENHUSH_GELU", "erf")
    forced = _encode(cfg, params, mel)
    np.testing.assert_array_equal(erf_out, forced)
