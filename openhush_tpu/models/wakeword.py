"""Wake-word detection: 3-stage streaming pipeline as JAX models.

Parity: the reference runs openWakeWord's ONNX pipeline
(src/input/wake_word.rs:22-40, inference :296-420): an 80 ms (1280-sample)
melspectrogram stage (32 mel bins, spec/10+2 normalization), an embedding
stage over a sliding 76-frame mel window (→ 96-d), and a per-word classifier
over the last 16 embeddings (1536-d → score).

Here each stage is a jittable JAX function sharing the matmul-DFT frontend
machinery; weights load from npz (converted from trained openWakeWord
checkpoints) or initialize randomly for structure tests / custom training
via training/. The streaming detector keeps the mel/embedding histories and
a refractory period, mirroring the reference's detection cadence (one
classifier evaluation every 80 ms chunk).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from openhush_tpu.ops import mel as mel_ops

CHUNK_SAMPLES = 1280       # 80 ms @ 16 kHz per pipeline step
N_MEL_BINS = 32
MEL_FRAMES_PER_CHUNK = CHUNK_SAMPLES // mel_ops.HOP_LENGTH   # 8
EMB_WINDOW = 76            # mel frames per embedding
EMB_DIM = 96
CLS_WINDOW = 16            # embeddings per classification
EMB_STRIDE = 8             # mel frames between embeddings (one chunk)


@functools.lru_cache(maxsize=1)
def _mel32_bases():
    cos_b, sin_b = mel_ops._dft_bases()
    fb = mel_ops.mel_filter_bank(N_MEL_BINS)
    return (jnp.asarray(cos_b), jnp.asarray(sin_b), jnp.asarray(fb))


@functools.partial(jax.jit, static_argnames=())
def melspectrogram_chunk(audio: jax.Array, tail: jax.Array) -> jax.Array:
    """Stage 1: one 1280-sample chunk (+240-sample tail for window overlap)
    → [8, 32] normalized log-mel frames (openWakeWord's spec/10 + 2)."""
    signal = jnp.concatenate([tail, audio])            # [1520]
    idx = (jnp.arange(MEL_FRAMES_PER_CHUNK)[:, None] * mel_ops.HOP_LENGTH
           + jnp.arange(mel_ops.N_FFT)[None, :])
    frames = signal[idx]                               # [8, 400]
    cos_b, sin_b, fb = _mel32_bases()
    hi = jax.lax.Precision.HIGHEST
    re = jnp.dot(frames, cos_b, precision=hi)
    im = jnp.dot(frames, sin_b, precision=hi)
    melspec = jnp.dot(re * re + im * im, fb, precision=hi)
    log_mel = jnp.log10(jnp.maximum(melspec, 1e-10)) * 10.0  # dB-ish
    return log_mel / 10.0 + 2.0                        # spec/10 + 2


def init_embedding_params(key, dtype=jnp.float32) -> dict:
    """Embedding model: [76, 32] mel window → 96-d. Conv over time +
    global pooling + dense (a compact stand-in for openWakeWord's
    embedding net; same I/O contract)."""
    k1, k2, k3 = jax.random.split(key, 3)
    s = lambda fan: fan ** -0.5
    return {
        "conv_w": jax.random.normal(k1, (8, N_MEL_BINS, 64)) * s(8 * 32),
        "conv_b": jnp.zeros((64,)),
        "dense_w": jax.random.normal(k2, (64, 128)) * s(64),
        "dense_b": jnp.zeros((128,)),
        "out_w": jax.random.normal(k3, (128, EMB_DIM)) * s(128),
        "out_b": jnp.zeros((EMB_DIM,)),
    }


@jax.jit
def embed_window(params: dict, mel_window: jax.Array) -> jax.Array:
    """[76, 32] → [96]."""
    x = mel_window[None]                                  # [1, 76, 32]
    x = jax.lax.conv_general_dilated(
        x, params["conv_w"], (4,), [(2, 2)],
        dimension_numbers=("NHC", "HIO", "NHC"))
    x = jax.nn.relu(x + params["conv_b"])
    x = jnp.mean(x, axis=1)                               # pool time → [1,64]
    x = jax.nn.relu(x @ params["dense_w"] + params["dense_b"])
    return (x @ params["out_w"] + params["out_b"])[0]


def init_classifier_params(key, dtype=jnp.float32) -> dict:
    """Per-word classifier: [16*96] → score (hey_jarvis.onnx contract)."""
    k1, k2 = jax.random.split(key)
    d = CLS_WINDOW * EMB_DIM
    return {
        "w1": jax.random.normal(k1, (d, 128)) * d ** -0.5,
        "b1": jnp.zeros((128,)),
        "w2": jax.random.normal(k2, (128, 1)) * 128 ** -0.5,
        "b2": jnp.zeros((1,)),
    }


@jax.jit
def classify_window(params: dict, embeddings: jax.Array) -> jax.Array:
    """[16, 96] → scalar probability."""
    x = embeddings.reshape(-1)
    h = jax.nn.relu(x @ params["w1"] + params["b1"])
    return jax.nn.sigmoid((h @ params["w2"] + params["b2"])[0])


@dataclasses.dataclass
class WakeWordConfig:
    threshold: float = 0.5
    refractory_secs: float = 2.0     # suppress repeat triggers
    model_name: str = "hey_jarvis"


class WakeWordDetector:
    """Streaming detector: feed 1280-sample chunks, get detections.

    Parity surface: WakeWordDetector::process (src/input/wake_word.rs:296).
    """

    def __init__(self, config: Optional[WakeWordConfig] = None,
                 emb_params: Optional[dict] = None,
                 cls_params: Optional[dict] = None,
                 emb_fn=None, cls_fn=None):
        self.config = config or WakeWordConfig()
        key = jax.random.PRNGKey(0)
        self.emb_params = emb_params or init_embedding_params(key)
        self.cls_params = cls_params or init_classifier_params(
            jax.random.fold_in(key, 1))
        # Injectable stages: converted openWakeWord ONNX graphs
        # (src/input/wake_word.rs:121-146) run here via models/onnx2jax.
        self._emb_fn = emb_fn or (
            lambda mel: embed_window(self.emb_params, mel))
        self._cls_fn = cls_fn or (
            lambda embs: classify_window(self.cls_params, embs))
        self.reset()

    @classmethod
    def from_onnx(cls, embedding_path: str, classifier_path: str,
                  config: Optional[WakeWordConfig] = None
                  ) -> "WakeWordDetector":
        """Back stages 2+3 with converted openWakeWord .onnx graphs.

        openWakeWord's embedding model takes a [1, 76, 32, 1] mel image
        and emits [1, 1, 1, 96]; the per-word classifier takes
        [1, 16, 96] and emits [1, 1] (pipeline constants:
        src/input/wake_word.rs:22-40). Adapters reshape between those
        layouts and this detector's [76,32]/[16,96] histories.
        """
        from openhush_tpu.models.onnx2jax import OnnxJaxModel
        emb = OnnxJaxModel.load(embedding_path)
        cls_m = OnnxJaxModel.load(classifier_path)

        def emb_fn(mel):
            out = emb.jitted(jnp.reshape(mel, (1, EMB_WINDOW,
                                               N_MEL_BINS, 1)))
            out = out[0] if isinstance(out, tuple) else out
            return jnp.reshape(out, (-1,))[:EMB_DIM]

        def cls_fn(embs):
            out = cls_m.jitted(jnp.reshape(embs, (1, CLS_WINDOW, EMB_DIM)))
            out = out[0] if isinstance(out, tuple) else out
            return jnp.reshape(out, (-1,))[-1]

        return cls(config, emb_fn=emb_fn, cls_fn=cls_fn)

    def reset(self) -> None:
        self._tail = np.zeros(mel_ops.N_FFT - mel_ops.HOP_LENGTH,
                              np.float32)
        self._mel_hist = np.zeros((EMB_WINDOW, N_MEL_BINS), np.float32)
        self._mel_filled = 0
        self._emb_hist = np.zeros((CLS_WINDOW, EMB_DIM), np.float32)
        self._emb_filled = 0
        self._chunks_since_trigger = 10 ** 9

    def process(self, chunk: np.ndarray) -> Optional[float]:
        """One 1280-sample chunk → score when the pipeline is warm (None
        while buffers fill), with refractory suppression applied by
        `detected`."""
        buf = np.zeros(CHUNK_SAMPLES, np.float32)
        n = min(len(chunk), CHUNK_SAMPLES)
        buf[:n] = chunk[:n]
        mel8 = np.asarray(melspectrogram_chunk(jnp.asarray(buf),
                                               jnp.asarray(self._tail)))
        self._tail = buf[-(mel_ops.N_FFT - mel_ops.HOP_LENGTH):].copy()

        self._mel_hist = np.roll(self._mel_hist, -MEL_FRAMES_PER_CHUNK,
                                 axis=0)
        self._mel_hist[-MEL_FRAMES_PER_CHUNK:] = mel8
        self._mel_filled = min(self._mel_filled + MEL_FRAMES_PER_CHUNK,
                               EMB_WINDOW)
        if self._mel_filled < EMB_WINDOW:
            return None

        emb = np.asarray(self._emb_fn(jnp.asarray(self._mel_hist)))
        self._emb_hist = np.roll(self._emb_hist, -1, axis=0)
        self._emb_hist[-1] = emb
        self._emb_filled = min(self._emb_filled + 1, CLS_WINDOW)
        if self._emb_filled < CLS_WINDOW:
            return None

        score = float(self._cls_fn(jnp.asarray(self._emb_hist)))
        self._chunks_since_trigger += 1
        return score

    def detected(self, score: Optional[float]) -> bool:
        """Threshold + refractory period."""
        if score is None or score < self.config.threshold:
            return False
        refractory_chunks = int(self.config.refractory_secs * 16000
                                / CHUNK_SAMPLES)
        if self._chunks_since_trigger <= refractory_chunks:
            return False
        self._chunks_since_trigger = 0
        return True

    @property
    def chunk_size(self) -> int:
        return CHUNK_SAMPLES

    # -- persistence ----------------------------------------------------------

    def save(self, path: str) -> None:
        from openhush_tpu.models.whisper.convert import save_npz
        save_npz({"embedding": self.emb_params,
                  "classifier": self.cls_params}, path)

    @classmethod
    def load(cls, path: str,
             config: Optional[WakeWordConfig] = None) -> "WakeWordDetector":
        from openhush_tpu.models.whisper.convert import load_npz
        params = load_npz(path)
        return cls(config, emb_params=params["embedding"],
                   cls_params=params["classifier"])
