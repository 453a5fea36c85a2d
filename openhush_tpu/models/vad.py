"""Voice activity detection: device-side gate + streaming state machine.

Replaces the reference's Silero-ONNX VAD (src/vad/silero.rs, 512-sample/32 ms
chunks @16 kHz → speech probability) with two TPU-native engines behind one
interface:

- EnergyVad: adaptive noise-floor spectral-energy gate — pure jnp, stateful
  ((state, chunk) → (state, prob)), zero weights needed. This is the default
  in air-gapped deployments and the admission gate for continuous batching.
- GruVad: Silero-like learned model (log-mel features → GRU → sigmoid) as a
  JAX pytree; weights load from npz (convert from a trained checkpoint) or
  train with training/. Same functional state threading, jit/vmap-able
  across concurrent sessions.

The VadState streaming segmenter reproduces the reference's transition rules
exactly (src/vad/mod.rs:158-224): min_silence to end a segment, min_speech
to accept it, avg probability reporting, pad handling left to the caller.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

CHUNK_SIZE = 512          # samples per VAD chunk (32 ms @ 16 kHz)
SAMPLE_RATE = 16_000


@dataclasses.dataclass(frozen=True)
class VadResult:
    probability: float
    is_speech: bool


# ---------------------------------------------------------------------------
# Energy VAD (no weights)
# ---------------------------------------------------------------------------

class EnergyVadState(NamedTuple):
    noise_floor: jax.Array    # EMA of non-speech band energy (log domain)
    initialized: jax.Array    # bool


@functools.lru_cache(maxsize=1)
def _band_basis():
    """DFT power basis restricted to the speech band (250–3800 Hz) for a
    hann-windowed 512-sample chunk: returns (cos, sin) [512, n_bins] fp32."""
    n = np.arange(CHUNK_SIZE)
    window = 0.5 * (1 - np.cos(2 * np.pi * n / CHUNK_SIZE))
    freqs = np.fft.rfftfreq(CHUNK_SIZE, 1.0 / SAMPLE_RATE)
    keep = (freqs >= 250.0) & (freqs <= 3800.0)
    k = np.nonzero(keep)[0].astype(np.float64)
    ang = 2 * np.pi * np.outer(n, k) / CHUNK_SIZE
    cos_b = (np.cos(ang) * window[:, None]).astype(np.float32)
    sin_b = (-np.sin(ang) * window[:, None]).astype(np.float32)
    return cos_b, sin_b


def energy_vad_init() -> EnergyVadState:
    return EnergyVadState(jnp.float32(-12.0), jnp.asarray(False))


@jax.jit
def energy_vad_step(state: EnergyVadState,
                    chunk: jax.Array) -> tuple[EnergyVadState, jax.Array]:
    """chunk [512] fp32 → (state, speech probability). Adaptive noise floor:
    the floor tracks quiet chunks fast and loud chunks very slowly, so
    sustained speech doesn't get absorbed into the floor."""
    cos_b, sin_b = _band_basis()
    hi = jax.lax.Precision.HIGHEST
    re = jnp.dot(chunk, jnp.asarray(cos_b), precision=hi)
    im = jnp.dot(chunk, jnp.asarray(sin_b), precision=hi)
    band_energy = jnp.log(jnp.mean(re * re + im * im) + 1e-10)

    floor = jnp.where(state.initialized, state.noise_floor, band_energy)
    over = band_energy - floor
    # ~8 dB (log ≈ 1.8) above the floor → speech; logistic around +0.9.
    prob = jax.nn.sigmoid((over - 0.9) * 2.5)
    rate = jnp.where(band_energy < floor, 0.3, 0.005)
    floor = floor + rate * (band_energy - floor)
    return EnergyVadState(floor, jnp.asarray(True)), prob


# ---------------------------------------------------------------------------
# GRU VAD (Silero-like, trainable/loadable)
# ---------------------------------------------------------------------------

N_FEATS = 40
HIDDEN = 64


class GruVadState(NamedTuple):
    h: jax.Array              # [HIDDEN]


def gru_vad_init_params(key: jax.Array, dtype=jnp.float32) -> dict:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    s = lambda *sh: 1.0 / np.sqrt(sh[0])

    def init(k, sh):
        return (jax.random.normal(k, sh) * s(*sh)).astype(dtype)

    return {
        "feat_w": init(k1, (N_FEATS, HIDDEN)),
        "feat_b": jnp.zeros((HIDDEN,), dtype),
        # fused GRU gates: [update, reset, candidate]
        "gru_wx": init(k2, (HIDDEN, 3 * HIDDEN)),
        "gru_wh": init(k3, (HIDDEN, 3 * HIDDEN)),
        "gru_b": jnp.zeros((3 * HIDDEN,), dtype),
        "out_w": init(k4, (HIDDEN, 1)),
        "out_b": jnp.zeros((1,), dtype),
    }


@functools.lru_cache(maxsize=1)
def _mel_basis_512():
    from openhush_tpu.ops.mel import mel_filter_bank
    n = np.arange(CHUNK_SIZE)
    window = 0.5 * (1 - np.cos(2 * np.pi * n / CHUNK_SIZE))
    k = np.arange(CHUNK_SIZE // 2 + 1, dtype=np.float64)
    ang = 2 * np.pi * np.outer(n, k) / CHUNK_SIZE
    cos_b = (np.cos(ang) * window[:, None]).astype(np.float32)
    sin_b = (-np.sin(ang) * window[:, None]).astype(np.float32)
    fb = mel_filter_bank(N_FEATS, CHUNK_SIZE // 2 + 1, SAMPLE_RATE)
    return cos_b, sin_b, fb


def gru_vad_init_state() -> GruVadState:
    return GruVadState(jnp.zeros((HIDDEN,), jnp.float32))


@jax.jit
def gru_vad_step(params: dict, state: GruVadState,
                 chunk: jax.Array) -> tuple[GruVadState, jax.Array]:
    cos_b, sin_b, fb = _mel_basis_512()
    hi = jax.lax.Precision.HIGHEST
    re = jnp.dot(chunk, jnp.asarray(cos_b), precision=hi)
    im = jnp.dot(chunk, jnp.asarray(sin_b), precision=hi)
    mel = jnp.log10(jnp.maximum((re * re + im * im) @ jnp.asarray(fb),
                                1e-10))
    x = jnp.tanh(mel @ params["feat_w"] + params["feat_b"])
    xg = x @ params["gru_wx"] + params["gru_b"]
    hg = state.h @ params["gru_wh"]
    z = jax.nn.sigmoid(xg[:HIDDEN] + hg[:HIDDEN])
    r = jax.nn.sigmoid(xg[HIDDEN:2 * HIDDEN] + hg[HIDDEN:2 * HIDDEN])
    n = jnp.tanh(xg[2 * HIDDEN:] + r * hg[2 * HIDDEN:])
    h = (1 - z) * n + z * state.h
    prob = jax.nn.sigmoid((h @ params["out_w"] + params["out_b"])[0])
    return GruVadState(h), prob


# ---------------------------------------------------------------------------
# Engines (stateful wrappers, reference trait parity: src/vad/mod.rs:34-55)
# ---------------------------------------------------------------------------

class VadEngine:
    """Stateful host wrapper over a functional VAD step."""

    def __init__(self, threshold: float = 0.5, kind: str = "energy",
                 params: Optional[dict] = None):
        self.threshold = threshold
        self.kind = kind
        if kind == "gru":
            self.params = params or gru_vad_init_params(jax.random.PRNGKey(0))
            self._state = gru_vad_init_state()
        else:
            self._state = energy_vad_init()

    def process(self, samples: np.ndarray) -> VadResult:
        chunk = np.zeros(CHUNK_SIZE, np.float32)
        n = min(len(samples), CHUNK_SIZE)
        chunk[:n] = samples[:n]
        if self.kind == "gru":
            self._state, prob = gru_vad_step(self.params, self._state,
                                             jnp.asarray(chunk))
        else:
            self._state, prob = energy_vad_step(self._state,
                                                jnp.asarray(chunk))
        p = float(prob)
        return VadResult(p, p >= self.threshold)

    def reset(self) -> None:
        if self.kind == "gru":
            self._state = gru_vad_init_state()
        else:
            self._state = energy_vad_init()

    @property
    def chunk_size(self) -> int:
        return CHUNK_SIZE

    @property
    def sample_rate(self) -> int:
        return SAMPLE_RATE


class OnnxSileroVad:
    """Silero VAD from the published .onnx, executed by the ONNX→JAX
    importer. The v5 graph signature is (input [1,512], state [2,1,128],
    sr scalar) → (prob, state); this wrapper threads the state."""

    def __init__(self, path: str, threshold: float = 0.5):
        from openhush_tpu.models.onnx2jax import OnnxJaxModel
        self._model = OnnxJaxModel.load(path)
        self.threshold = threshold
        names = self._model.input_names
        self._has_sr = any(n in ("sr", "sample_rate") for n in names)
        self.reset()

    def reset(self) -> None:
        self._state = jnp.zeros((2, 1, 128), jnp.float32)

    def process(self, samples: np.ndarray) -> VadResult:
        chunk = np.zeros((1, CHUNK_SIZE), np.float32)
        n = min(len(samples), CHUNK_SIZE)
        chunk[0, :n] = samples[:n]
        args = [jnp.asarray(chunk), self._state]
        if self._has_sr:
            args.append(np.asarray(SAMPLE_RATE, np.int64))
        out = self._model(*args)
        prob, state = (out if isinstance(out, tuple) else (out, None))[:2]
        if state is not None:
            self._state = state
        p = float(np.asarray(prob).reshape(-1)[0])
        return VadResult(p, p >= self.threshold)

    @property
    def chunk_size(self) -> int:
        return CHUNK_SIZE

    @property
    def sample_rate(self) -> int:
        return SAMPLE_RATE


def create_engine(cfg) -> "VadEngine":
    """Build the configured VAD engine with graceful degradation: a
    missing/broken model falls back to the weight-free energy gate
    (reference behavior: optional init logs and continues,
    src/daemon.rs:79-86)."""
    import logging
    engine = getattr(cfg, "engine", "energy")
    threshold = getattr(cfg, "threshold", 0.5)
    path = getattr(cfg, "model_path", "")
    try:
        if engine == "silero" and path.endswith(".onnx"):
            return OnnxSileroVad(path, threshold)
        if engine == "silero":
            from openhush_tpu.models.silero import SileroVad
            return SileroVad.load(path, threshold)
        if engine == "gru":
            params = None
            if path:
                from openhush_tpu.models.whisper.convert import load_npz
                params = load_npz(path)
            return VadEngine(threshold, kind="gru", params=params)
    except Exception as e:  # noqa: BLE001
        logging.getLogger(__name__).warning(
            "VAD engine %r unavailable (%s); using energy gate", engine, e)
    return VadEngine(threshold, kind="energy")


# ---------------------------------------------------------------------------
# Streaming state machine (exact parity: src/vad/mod.rs:158-224)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class SpeechSegment:
    start: int                # sample position
    end: int
    avg_probability: float


@dataclasses.dataclass
class VadStateConfig:
    threshold: float = 0.5
    min_silence_ms: int = 700
    min_speech_ms: int = 250
    speech_pad_ms: int = 30


class VadState:
    """Tracks speech/silence transitions, emits segments on speech end."""

    def __init__(self, config: Optional[VadStateConfig] = None,
                 sample_rate: int = SAMPLE_RATE):
        self.config = config or VadStateConfig()
        self.sample_rate = sample_rate
        self.reset()

    def reset(self) -> None:
        self._probs: list[float] = []
        self.in_speech = False
        self.speech_start: Optional[int] = None
        self._silence_samples = 0
        self._total_samples = 0

    def update(self, result: VadResult,
               chunk_samples: int) -> Optional[SpeechSegment]:
        self._probs.append(result.probability)
        prev_total = self._total_samples
        self._total_samples += chunk_samples
        min_silence = int(self.config.min_silence_ms / 1000 *
                          self.sample_rate)
        min_speech = int(self.config.min_speech_ms / 1000 * self.sample_rate)

        if result.is_speech:
            self._silence_samples = 0
            if not self.in_speech:
                self.in_speech = True
                self.speech_start = prev_total
            return None

        self._silence_samples += chunk_samples
        if self.in_speech and self._silence_samples >= min_silence:
            self.in_speech = False
            start = self.speech_start or 0
            self.speech_start = None
            end = prev_total       # reference semantics: position at the
            # chunk where the silence threshold was crossed
            if end - start >= min_speech:
                avg = (sum(self._probs) / len(self._probs)
                       if self._probs else 0.0)
                self._probs.clear()
                return SpeechSegment(start, end, avg)
            self._probs.clear()
        return None
