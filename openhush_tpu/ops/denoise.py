"""Speech denoising: Bark-band spectral gains (RNNoise-style) in JAX.

Parity target: the reference runs RNNoise (GRU denoiser, 480-sample/10 ms
frames @48 kHz) via nnnoiseless with a 16→48→16 kHz round trip, first-frame
fade-in, and a strength mix (src/input/audio.rs:249-341). TPU-first
redesign: the denoiser operates directly at 16 kHz on the same hop-160/
win-400 STFT grid as the Whisper frontend (no resample round trip), with
two interchangeable gain estimators:

- `wiener_gains` — weight-free adaptive gate: per-band noise floor tracked
  by an asymmetric EMA (fast down, slow up), Wiener-rule gains. Works
  untrained; the default for `noise_reduction_enabled`.
- `rnn_gains` — the RNNoise network shape (dense→GRU 24→48→96→sigmoid 22)
  over Bark-band features; weights load from npz (train with training/ or
  convert from a trained checkpoint).

Gains are per-Bark-band (22 bands, 0–8 kHz), interpolated to FFT bins,
applied to the complex spectrum, and resynthesized by inverse-DFT matmul +
overlap-add with exact COLA normalization — all matmul/VPU work, jittable,
streaming-stateful.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from openhush_tpu.ops import mel as mel_ops

N_BANDS = 22
N_FFT = mel_ops.N_FFT          # 400
HOP = mel_ops.HOP_LENGTH       # 160
N_FREQS = N_FFT // 2 + 1       # 201
SAMPLE_RATE = 16_000


# ---------------------------------------------------------------------------
# Bark bands + synthesis bases
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=1)
def bark_bands() -> np.ndarray:
    """Triangular Bark-scale bands [N_FREQS, N_BANDS] over 0–8 kHz
    (RNNoise uses 22 opus-scale bands; same role)."""
    freqs = np.linspace(0, SAMPLE_RATE / 2, N_FREQS)
    bark = 6.0 * np.arcsinh(freqs / 600.0)
    edges = np.linspace(0.0, bark[-1], N_BANDS + 2)
    fb = np.zeros((N_FREQS, N_BANDS), np.float32)
    for b in range(N_BANDS):
        lo, mid, hi = edges[b], edges[b + 1], edges[b + 2]
        up = (bark - lo) / max(mid - lo, 1e-6)
        down = (hi - bark) / max(hi - mid, 1e-6)
        fb[:, b] = np.clip(np.minimum(up, down), 0.0, 1.0)
    # Edge bins (DC, Nyquist) fall outside the triangles — pin them to the
    # outermost bands so every bin belongs somewhere.
    fb[0, 0] = 1.0
    fb[-1, -1] = 1.0
    fb /= np.maximum(fb.sum(axis=1, keepdims=True), 1e-6)
    return fb


@functools.lru_cache(maxsize=1)
def _synthesis_bases():
    """Inverse real-DFT bases with the hann window folded in:
    frame = (Re @ icos + Im @ isin) reconstructs window*signal."""
    n = np.arange(N_FFT, dtype=np.float64)
    k = np.arange(N_FREQS, dtype=np.float64)
    window = 0.5 * (1.0 - np.cos(2.0 * np.pi * n / N_FFT))
    ang = 2.0 * np.pi * np.outer(k, n) / N_FFT
    # irfft scaling: bin 0 and Nyquist count once, others twice.
    scale = np.full(N_FREQS, 2.0 / N_FFT)
    scale[0] = 1.0 / N_FFT
    scale[-1] = 1.0 / N_FFT
    icos = (np.cos(ang) * scale[:, None] * window[None, :]).astype(
        np.float32)
    isin = (-np.sin(ang) * scale[:, None] * window[None, :]).astype(
        np.float32)
    return icos, isin


@functools.lru_cache(maxsize=4)
def _ola_norm(n_frames: int) -> np.ndarray:
    """COLA normalization: sum of squared hann windows at each sample."""
    n = np.arange(N_FFT)
    w2 = (0.5 * (1.0 - np.cos(2.0 * np.pi * n / N_FFT))) ** 2
    total = n_frames * HOP + N_FFT
    acc = np.zeros(total, np.float64)
    for f in range(n_frames):
        acc[f * HOP:f * HOP + N_FFT] += w2
    return np.maximum(acc, 1e-6).astype(np.float32)


# ---------------------------------------------------------------------------
# STFT analysis / synthesis (matmul DFT, shared bases with the frontend)
# ---------------------------------------------------------------------------

def _stft(audio: jax.Array, n_frames: int):
    cos_b, sin_b = mel_ops._dft_bases()
    idx = (jnp.arange(n_frames)[:, None] * HOP
           + jnp.arange(N_FFT)[None, :])
    frames = audio[idx]
    hi = jax.lax.Precision.HIGHEST
    re = jnp.dot(frames, jnp.asarray(cos_b), precision=hi)
    im = jnp.dot(frames, jnp.asarray(sin_b), precision=hi)
    return re, im                      # [n_frames, N_FREQS]


def _istft(re: jax.Array, im: jax.Array, n_samples: int) -> jax.Array:
    icos, isin = _synthesis_bases()
    hi = jax.lax.Precision.HIGHEST
    frames = (jnp.dot(re, jnp.asarray(icos), precision=hi)
              + jnp.dot(im, jnp.asarray(isin), precision=hi))
    n_frames = frames.shape[0]
    # Overlap-add via 3 stride-aligned families (hop*2.5 = frame span is
    # not integral, so scatter-add on index grids).
    idx = (jnp.arange(n_frames)[:, None] * HOP
           + jnp.arange(N_FFT)[None, :]).reshape(-1)
    out = jnp.zeros(n_frames * HOP + N_FFT, jnp.float32)
    out = out.at[idx].add(frames.reshape(-1))
    out = out / jnp.asarray(_ola_norm(n_frames))
    return out[:n_samples]


# ---------------------------------------------------------------------------
# Gain estimators
# ---------------------------------------------------------------------------

class DenoiseState(NamedTuple):
    noise_floor: jax.Array      # [N_BANDS] log-energy floor
    gru_h: jax.Array            # [24+48+96] hidden (rnn mode)
    initialized: jax.Array


def init_state() -> DenoiseState:
    return DenoiseState(jnp.full((N_BANDS,), -10.0, jnp.float32),
                        jnp.zeros((168,), jnp.float32),
                        jnp.asarray(False))


def wiener_gains(band_energy: jax.Array,
                 state: DenoiseState) -> tuple[jax.Array, DenoiseState]:
    """band_energy [n_frames, N_BANDS] (linear). Asymmetric-EMA noise floor
    (fast down, slow up) + Wiener rule, scanned over frames."""
    log_e = jnp.log(band_energy + 1e-10)

    def step(floor, le):
        init = jnp.minimum(le, floor)
        rate = jnp.where(le < floor, 0.3, 0.003)
        floor = floor + rate * (le - floor)
        snr = jnp.exp(jnp.maximum(le - floor, 0.0)) - 1.0
        gain = snr / (snr + 1.0)
        return floor, jnp.maximum(gain, 0.05)

    floor0 = jnp.where(state.initialized, state.noise_floor, log_e[0])
    floor, gains = jax.lax.scan(step, floor0, log_e)
    return gains, DenoiseState(floor, state.gru_h, jnp.asarray(True))


# -- RNNoise-shaped network ---------------------------------------------------

def init_rnn_params(key: jax.Array) -> dict:
    """dense(24,tanh) → GRU(24) → GRU(48) → GRU(96) → dense(22,sigmoid),
    the RNNoise topology, over [22 log-band energies + 22 deltas]."""
    ks = iter(jax.random.split(key, 16))
    g = lambda sh: jax.random.normal(next(ks), sh) / np.sqrt(sh[0])

    def gru(i, h):
        return {"wx": g((i, 3 * h)), "wh": g((h, 3 * h)),
                "b": jnp.zeros((3 * h,))}

    return {
        "in_w": g((2 * N_BANDS, 24)), "in_b": jnp.zeros((24,)),
        "gru1": gru(24, 24), "gru2": gru(24 + 24, 48),
        "gru3": gru(24 + 48, 96),
        "out_w": g((96, N_BANDS)), "out_b": jnp.zeros((N_BANDS,)),
        "vad_w": g((24, 1)), "vad_b": jnp.zeros((1,)),
    }


def _gru_step(p, x, h):
    xg = x @ p["wx"] + p["b"]
    hg = h @ p["wh"]
    n = h.shape[-1]
    z = jax.nn.sigmoid(xg[:n] + hg[:n])
    r = jax.nn.sigmoid(xg[n:2 * n] + hg[n:2 * n])
    c = jnp.tanh(xg[2 * n:] + r * hg[2 * n:])
    return (1 - z) * c + z * h


def rnn_gains(params: dict, band_energy: jax.Array,
              state: DenoiseState) -> tuple[jax.Array, DenoiseState, jax.Array]:
    """Returns (gains [n_frames, 22], new state, vad [n_frames])."""
    log_e = jnp.log(band_energy + 1e-10)
    deltas = jnp.diff(log_e, axis=0, prepend=log_e[:1])
    feats = jnp.concatenate([log_e, deltas], axis=-1)

    def step(h, f):
        h1, h2, h3 = h[:24], h[24:72], h[72:168]
        x = jnp.tanh(f @ params["in_w"] + params["in_b"])
        h1 = _gru_step(params["gru1"], x, h1)
        h2 = _gru_step(params["gru2"], jnp.concatenate([x, h1]), h2)
        h3 = _gru_step(params["gru3"], jnp.concatenate([x, h2]), h3)
        gains = jax.nn.sigmoid(h3 @ params["out_w"] + params["out_b"])
        vad = jax.nn.sigmoid(h1 @ params["vad_w"] + params["vad_b"])[0]
        return jnp.concatenate([h1, h2, h3]), (gains, vad)

    h, (gains, vad) = jax.lax.scan(step, state.gru_h, feats)
    return gains, DenoiseState(state.noise_floor, h,
                               jnp.asarray(True)), vad


# ---------------------------------------------------------------------------
# Full denoise pass
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("n_frames",))
def _denoise_jit(audio, state, strength, n_frames, params=None):
    pad = N_FFT // 2
    padded = jnp.pad(audio, (pad, pad), mode="reflect")
    re, im = _stft(padded, n_frames)
    power = re * re + im * im
    fb = jnp.asarray(bark_bands())
    band_e = power @ fb                              # [n_frames, 22]
    if params is None:
        gains, state = wiener_gains(band_e, state)
    else:
        gains, state, _ = rnn_gains(params, band_e, state)
    # Interpolate band gains to bins (fb rows are normalized to sum 1, so
    # this is a proper weighted average).
    bin_gains = gains @ fb.T
    # First-frames fade-in (parity: audio.rs denoise first-frame fade).
    fade = jnp.clip((jnp.arange(n_frames, dtype=jnp.float32) + 1.0) / 2.0,
                    0.0, 1.0)
    bin_gains = bin_gains * fade[:, None]
    out = _istft(re * bin_gains, im * bin_gains, audio.shape[0] + 2 * pad)
    out = out[pad:pad + audio.shape[0]]
    mixed = audio * (1.0 - strength) + out * strength
    return mixed.astype(jnp.float32), state


def denoise(audio: np.ndarray, strength: float = 1.0,
            state: Optional[DenoiseState] = None,
            params: Optional[dict] = None
            ) -> tuple[np.ndarray, DenoiseState]:
    """Denoise mono 16 kHz audio; returns (audio, streaming state).
    strength mixes dry/wet (parity: audio.rs:249-341)."""
    if strength <= 0.0 or len(audio) < N_FFT:
        return np.asarray(audio, np.float32), state or init_state()
    n_frames = len(audio) // HOP
    usable = n_frames * HOP
    head = jnp.asarray(audio[:usable], jnp.float32)
    out, new_state = _denoise_jit(head, state or init_state(),
                                  jnp.float32(np.clip(strength, 0, 1)),
                                  n_frames, params)
    result = np.asarray(out)
    if usable < len(audio):
        result = np.concatenate([result,
                                 np.asarray(audio[usable:], np.float32)])
    return result, new_state
