"""Log-mel spectrogram frontend (JAX reference implementation).

Computes Whisper's 80/128-bin log-mel features: hann-windowed STFT (n_fft=400,
hop=160, centered/reflect-padded), power spectrum, slaney-normalized mel
filterbank (fmax 8 kHz), log10 with dynamic-range clamp, (x+4)/4 scaling.

TPU-first design: the DFT is expressed as two real matmuls against fixed
cos/sin basis matrices (400x201 each) so the whole frontend is
frame-extraction + 3 matmuls — all MXU work, no FFT primitive needed. The
fused Pallas kernel in ``mel_pallas.py`` uses the same bases.

Reference parity: whisper.cpp's mel frontend as consumed by the reference
engine (src/engine/whisper.rs:204-305 drives `state.full`, which includes the
log-mel stage). Golden-tested against transformers' WhisperFeatureExtractor.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

SAMPLE_RATE = 16_000
N_FFT = 400
HOP_LENGTH = 160
CHUNK_LENGTH = 30                      # seconds per Whisper window
N_SAMPLES = CHUNK_LENGTH * SAMPLE_RATE  # 480_000
N_FRAMES = N_SAMPLES // HOP_LENGTH      # 3000 encoder input frames


def _hz_to_mel_slaney(freq: np.ndarray) -> np.ndarray:
    """Slaney mel scale: linear below 1 kHz, log above."""
    freq = np.asarray(freq, dtype=np.float64)
    min_log_hz = 1000.0
    min_log_mel = 15.0
    logstep = 27.0 / np.log(6.4)
    mels = 3.0 * freq / 200.0
    safe = np.maximum(freq, 1e-10)
    return np.where(freq >= min_log_hz,
                    min_log_mel + np.log(safe / min_log_hz) * logstep, mels)


def _mel_to_hz_slaney(mels: np.ndarray) -> np.ndarray:
    mels = np.asarray(mels, dtype=np.float64)
    min_log_mel = 15.0
    logstep = np.log(6.4) / 27.0
    freq = 200.0 * mels / 3.0
    return np.where(mels >= min_log_mel,
                    1000.0 * np.exp(logstep * (mels - min_log_mel)), freq)


@functools.lru_cache(maxsize=4)
def mel_filter_bank(n_mels: int = 80, n_freqs: int = N_FFT // 2 + 1,
                    sample_rate: int = SAMPLE_RATE,
                    fmin: float = 0.0, fmax: float = 8000.0) -> np.ndarray:
    """Triangular slaney-normalized mel filterbank, shape [n_freqs, n_mels]."""
    fft_freqs = np.linspace(0.0, sample_rate / 2, n_freqs)
    mel_pts = np.linspace(_hz_to_mel_slaney(fmin), _hz_to_mel_slaney(fmax),
                          n_mels + 2)
    filter_freqs = _mel_to_hz_slaney(mel_pts)
    fdiff = np.diff(filter_freqs)
    slopes = filter_freqs[None, :] - fft_freqs[:, None]   # [n_freqs, n_mels+2]
    down = -slopes[:, :-2] / fdiff[None, :-1]
    up = slopes[:, 2:] / fdiff[None, 1:]
    fb = np.maximum(0.0, np.minimum(down, up))
    # Slaney normalization: constant energy per band.
    enorm = 2.0 / (filter_freqs[2:] - filter_freqs[:-2])
    fb = fb * enorm[None, :]
    return fb.astype(np.float32)


@functools.lru_cache(maxsize=2)
def _dft_bases(n_fft: int = N_FFT) -> tuple[np.ndarray, np.ndarray]:
    """Real-DFT bases with the periodic hann window folded in.

    Returns (cos_basis, sin_basis), each [n_fft, n_fft//2+1], such that for a
    frame x: Re = x @ cos, Im = x @ sin, power = Re^2 + Im^2.
    """
    n = np.arange(n_fft, dtype=np.float64)
    k = np.arange(n_fft // 2 + 1, dtype=np.float64)
    window = 0.5 * (1.0 - np.cos(2.0 * np.pi * n / n_fft))  # periodic hann
    ang = 2.0 * np.pi * np.outer(n, k) / n_fft
    cos_b = (np.cos(ang) * window[:, None]).astype(np.float32)
    sin_b = (-np.sin(ang) * window[:, None]).astype(np.float32)
    return cos_b, sin_b


def frame_signal(audio: jax.Array, n_frames: int) -> jax.Array:
    """Extract centered STFT frames: reflect-pad n_fft//2, stride hop.

    audio: [n_samples] float32. Returns [n_frames, n_fft].
    """
    pad = N_FFT // 2
    padded = jnp.pad(audio, (pad, pad), mode="reflect")
    # Gather frames via strided slice trick: build [n_frames, n_fft] indices.
    starts = jnp.arange(n_frames) * HOP_LENGTH
    idx = starts[:, None] + jnp.arange(N_FFT)[None, :]
    return padded[idx]


@functools.partial(jax.jit, static_argnames=("n_mels", "n_frames"))
def log_mel_spectrogram(audio: jax.Array, n_mels: int = 80,
                        n_frames: int = N_FRAMES) -> jax.Array:
    """Whisper log-mel features.

    audio: [n_samples] float32 at 16 kHz, already padded/trimmed so that
    n_samples == n_frames * HOP_LENGTH (e.g. 480_000 for a 30 s window).
    Returns [n_mels, n_frames] float32 in Whisper's normalized log scale.

    Note: whisper drops the final STFT frame (stft[..., :-1]); with
    n_samples = n_frames*hop and center padding there are n_frames+1 frames,
    so we simply compute the first n_frames.
    """
    cos_b, sin_b = _dft_bases()
    fb = mel_filter_bank(n_mels)
    frames = frame_signal(audio.astype(jnp.float32), n_frames)
    # HIGHEST precision: the DFT suffers catastrophic cancellation at low
    # bins; default (bf16-ish) matmul precision visibly corrupts log-mel.
    hi = jax.lax.Precision.HIGHEST
    re = jnp.dot(frames, jnp.asarray(cos_b), precision=hi)
    im = jnp.dot(frames, jnp.asarray(sin_b), precision=hi)
    power = re * re + im * im                       # [n_frames, n_freqs]
    mel = jnp.dot(power, jnp.asarray(fb), precision=hi)  # [n_frames, n_mels]
    log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
    log_spec = jnp.maximum(log_spec, jnp.max(log_spec) - 8.0)
    log_spec = (log_spec + 4.0) / 4.0
    return log_spec.T                               # [n_mels, n_frames]


def pad_or_trim(audio: jax.Array | np.ndarray,
                length: int = N_SAMPLES) -> jax.Array:
    """Pad with zeros or trim to exactly `length` samples (host-side ok)."""
    audio = jnp.asarray(audio)
    n = audio.shape[-1]
    if n > length:
        return audio[..., :length]
    if n < length:
        return jnp.pad(audio, [(0, 0)] * (audio.ndim - 1) + [(0, length - n)])
    return audio
