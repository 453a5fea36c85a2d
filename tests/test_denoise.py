"""Denoiser tests: STFT/iSTFT reconstruction, Wiener gate actually improves
SNR, RNNoise-shaped network runs, strength mixing, streaming state."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openhush_tpu.ops import denoise as dn


def _tone(secs, freq=440.0, amp=0.5, rate=16000):
    t = np.arange(int(rate * secs)) / rate
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def test_istft_reconstruction():
    """Unity gains → (near) perfect reconstruction through STFT→iSTFT."""
    rng = np.random.default_rng(0)
    audio = (0.3 * rng.standard_normal(16000)).astype(np.float32)
    n_frames = len(audio) // dn.HOP
    pad = dn.N_FFT // 2
    padded = jnp.pad(jnp.asarray(audio), (pad, pad), mode="reflect")
    re, im = dn._stft(padded, n_frames)
    out = np.asarray(dn._istft(re, im, len(audio) + 2 * pad))
    # Interior (away from OLA edges) reconstructs to float precision.
    np.testing.assert_allclose(out[pad + 400:pad + 15000],
                               audio[400:15000], atol=2e-4)


def test_bark_bands_cover_spectrum():
    fb = dn.bark_bands()
    assert fb.shape == (201, 22)
    np.testing.assert_allclose(fb.sum(axis=1), 1.0, atol=1e-5)


def test_wiener_improves_snr():
    """Tone + noise, after a noise-only preamble → denoised output has
    higher SNR than input."""
    rng = np.random.default_rng(1)
    noise_amp = 0.05
    preamble = (noise_amp * rng.standard_normal(16000)).astype(np.float32)
    tone = _tone(2.0, amp=0.3)
    noisy = tone + (noise_amp
                    * rng.standard_normal(len(tone))).astype(np.float32)

    _, state = dn.denoise(preamble, strength=1.0)        # learn the floor
    out, _ = dn.denoise(noisy, strength=1.0, state=state)

    def snr(x):
        # 440 Hz power vs total-minus-tone power via Goertzel-ish probe.
        t = np.arange(len(x)) / 16000
        ref = np.sin(2 * np.pi * 440 * t)
        a = 2 * np.mean(x * ref)
        tone_p = a ** 2 / 2
        resid = x - a * ref
        return tone_p / max(np.mean(resid ** 2), 1e-12)

    assert snr(out[8000:]) > snr(noisy[8000:]) * 1.5


def test_strength_zero_is_identity():
    x = _tone(1.0)
    out, _ = dn.denoise(x, strength=0.0)
    np.testing.assert_array_equal(out, x)


def test_strength_mixes():
    rng = np.random.default_rng(2)
    x = (0.2 * rng.standard_normal(16000)).astype(np.float32)
    full, _ = dn.denoise(x, strength=1.0)
    half, _ = dn.denoise(x, strength=0.5)
    np.testing.assert_allclose(half, 0.5 * x + 0.5 * full, atol=1e-5)


def test_output_length_preserved():
    for n in (6400, 6500, 16001):
        x = _tone(n / 16000)
        out, _ = dn.denoise(x, strength=1.0)
        assert len(out) == len(x)
    short = np.zeros(100, np.float32)
    out, _ = dn.denoise(short)
    np.testing.assert_array_equal(out, short)


def test_rnn_gains_shape_and_state():
    params = dn.init_rnn_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(3)
    x = (0.2 * rng.standard_normal(16000)).astype(np.float32)
    out, state = dn.denoise(x, strength=1.0, params=params)
    assert out.shape == x.shape
    assert np.isfinite(out).all()
    assert np.abs(np.asarray(state.gru_h)).max() > 0   # state advanced
    # Streaming continuation reuses the state without error.
    out2, _ = dn.denoise(x, strength=1.0, state=state, params=params)
    assert np.isfinite(out2).all()


def test_build_preprocess_pipeline():
    from openhush_tpu.runtime.daemon import build_preprocess
    from openhush_tpu.utils.config import AudioConfig
    cfg = AudioConfig(noise_reduction_enabled=True,
                      compression_enabled=True)
    pre = build_preprocess(cfg)
    rng = np.random.default_rng(4)
    x = (0.6 * rng.standard_normal(16000)).astype(np.float32)
    y = pre(x)
    assert y.shape == x.shape
    assert np.isfinite(y).all()
    # Limiter ceiling enforced.
    assert np.abs(y).max() <= 10 ** (cfg.limiter_ceiling_db / 20) * 1.02
    # Streaming state persists across calls (noise floor carried).
    y2 = pre(x)
    assert np.isfinite(y2).all()
