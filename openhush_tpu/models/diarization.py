"""Speaker diarization: segmentation + speaker embeddings + clustering.

Parity: the reference embeds pyannote's ONNX models
(src/diarization/mod.rs:1-385): segmentation-3.0 for speech regions,
wespeaker CAM++ embeddings, then incremental cosine-similarity clustering
with a threshold and a max-speaker cap (get_segments +
EmbeddingExtractor::compute + EmbeddingManager::search_speaker,
mod.rs:266-299).

TPU-native layout:
- Segmentation: the device-side VAD (models/vad.py) provides speech
  regions — the reference's segmentation model fills the same role.
- SpeakerEmbedder: log-mel → TDNN-ish conv stack → statistics pooling
  (mean||std) → d-vector, as one jittable function; weights load from npz
  (converted from a trained x-vector/CAM++ checkpoint) or random for
  structure tests.
- EmbeddingClusterer: incremental cosine clustering (threshold + max
  speakers) — pure numpy, exact reference behavior and fully testable with
  synthetic embeddings.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from openhush_tpu.ops import mel as mel_ops

EMB_DIM = 192
N_MELS = 80


def init_embedder_params(key, dtype=jnp.float32) -> dict:
    ks = jax.random.split(key, 4)
    s = lambda fan: fan ** -0.5
    return {
        "conv1_w": jax.random.normal(ks[0], (5, N_MELS, 128)) * s(5 * 80),
        "conv1_b": jnp.zeros((128,)),
        "conv2_w": jax.random.normal(ks[1], (3, 128, 128)) * s(3 * 128),
        "conv2_b": jnp.zeros((128,)),
        "dense_w": jax.random.normal(ks[2], (256, EMB_DIM)) * s(256),
        "dense_b": jnp.zeros((EMB_DIM,)),
    }


@functools.partial(jax.jit, static_argnames=("n_frames",))
def speaker_embedding(params: dict, audio: jax.Array,
                      n_frames: int = 300) -> jax.Array:
    """audio [n_frames*160] (≥1 s recommended) → L2-normalized [EMB_DIM]."""
    mel = mel_ops.log_mel_spectrogram(audio, n_mels=N_MELS,
                                      n_frames=n_frames).T  # [T, 80]
    x = mel[None]
    dn = ("NHC", "HIO", "NHC")
    x = jax.nn.relu(jax.lax.conv_general_dilated(
        x, params["conv1_w"], (2,), [(2, 2)], dimension_numbers=dn)
        + params["conv1_b"])
    x = jax.nn.relu(jax.lax.conv_general_dilated(
        x, params["conv2_w"], (2,), [(1, 1)], dimension_numbers=dn)
        + params["conv2_b"])
    # Statistics pooling: mean || std over time.
    mean = jnp.mean(x, axis=1)
    std = jnp.sqrt(jnp.maximum(jnp.var(x, axis=1), 1e-6))
    stats = jnp.concatenate([mean, std], axis=-1)          # [1, 256]
    emb = stats @ params["dense_w"] + params["dense_b"]
    return (emb / jnp.linalg.norm(emb, axis=-1, keepdims=True))[0]


def kaldi_fbank(audio: np.ndarray, n_mels: int = N_MELS) -> np.ndarray:
    """Kaldi-style log-mel fbank features for wespeaker embedders:
    25 ms/10 ms frames @16 kHz, 0.97 pre-emphasis, povey-ish (hamming)
    window, per-utterance mean normalization (wespeaker's CMN)."""
    sr, win, hop = 16000, 400, 160
    a = np.asarray(audio, np.float32)
    if len(a) < win:
        a = np.pad(a, (0, win - len(a)))
    n_frames = 1 + (len(a) - win) // hop
    idx = np.arange(n_frames)[:, None] * hop + np.arange(win)[None, :]
    frames = a[idx]
    frames = frames - 0.97 * np.concatenate(
        [frames[:, :1], frames[:, :-1]], axis=1)
    frames = frames * np.hamming(win).astype(np.float32)
    spec = np.abs(np.fft.rfft(frames, n=512, axis=1)) ** 2
    fb = mel_ops.mel_filter_bank(n_mels, 257, sr)
    feats = np.log(np.maximum(spec @ fb, 1e-10)).astype(np.float32)
    return feats - feats.mean(axis=0, keepdims=True)


@dataclasses.dataclass
class DiarizationConfig:
    similarity_threshold: float = 0.6
    max_speakers: int = 8


class EmbeddingClusterer:
    """Incremental speaker assignment by cosine similarity to running
    centroids (parity: EmbeddingManager::search_speaker semantics)."""

    def __init__(self, config: Optional[DiarizationConfig] = None):
        self.config = config or DiarizationConfig()
        self.centroids: list[np.ndarray] = []
        self.counts: list[int] = []

    def assign(self, embedding: np.ndarray) -> int:
        """Return a speaker id (0-based), creating one if below threshold
        and under the cap; else the closest existing speaker."""
        e = np.asarray(embedding, np.float64)
        e = e / (np.linalg.norm(e) + 1e-12)
        if not self.centroids:
            self.centroids.append(e.copy())
            self.counts.append(1)
            return 0
        sims = np.array([float(c @ e) for c in self.centroids])
        best = int(sims.argmax())
        if sims[best] >= self.config.similarity_threshold or \
                len(self.centroids) >= self.config.max_speakers:
            c, n = self.centroids[best], self.counts[best]
            c = (c * n + e) / (n + 1)
            self.centroids[best] = c / (np.linalg.norm(c) + 1e-12)
            self.counts[best] += 1
            return best
        self.centroids.append(e.copy())
        self.counts.append(1)
        return len(self.centroids) - 1

    @property
    def n_speakers(self) -> int:
        return len(self.centroids)


@dataclasses.dataclass
class SpeakerSegment:
    start_secs: float
    end_secs: float
    speaker_id: int


class DiarizationEngine:
    """Segment audio into speaker turns: VAD for speech regions + embedding
    clustering (parity surface: DiarizationEngine, mod.rs:101-338)."""

    def __init__(self, config: Optional[DiarizationConfig] = None,
                 params: Optional[dict] = None,
                 vad_engine=None, embedder_fn=None):
        from openhush_tpu.models.vad import VadEngine
        self.config = config or DiarizationConfig()
        self.params = params or init_embedder_params(jax.random.PRNGKey(0))
        self.clusterer = EmbeddingClusterer(self.config)
        self.vad = vad_engine or VadEngine(kind="energy")
        self._embedder_fn = embedder_fn      # audio [T] → embedding [D]

    @classmethod
    def from_onnx(cls, embedder_path: str,
                  config: Optional[DiarizationConfig] = None
                  ) -> "DiarizationEngine":
        """Back the embedder with a converted wespeaker .onnx
        (reference: EmbeddingExtractor::compute,
        src/diarization/mod.rs:266-299). wespeaker graphs take kaldi
        fbank features [1, T, 80] and emit [1, D]."""
        from openhush_tpu.models.onnx2jax import OnnxJaxModel
        model = OnnxJaxModel.load(embedder_path)

        def fn(audio: np.ndarray) -> np.ndarray:
            feats = kaldi_fbank(audio)[None]           # [1, T, 80]
            out = model(jnp.asarray(feats))
            out = out[0] if isinstance(out, tuple) else out
            e = np.asarray(out).reshape(-1)
            return e / (np.linalg.norm(e) + 1e-12)

        return cls(config, embedder_fn=fn)

    def embed(self, audio: np.ndarray) -> np.ndarray:
        if self._embedder_fn is not None:
            return self._embedder_fn(np.asarray(audio, np.float32))
        n_frames = max(1, len(audio) // mel_ops.HOP_LENGTH)
        need = n_frames * mel_ops.HOP_LENGTH
        a = np.zeros(need, np.float32)
        a[:min(len(audio), need)] = audio[:need]
        return np.asarray(speaker_embedding(self.params, jnp.asarray(a),
                                            n_frames=n_frames))

    def diarize_chunk(self, audio: np.ndarray,
                      offset_secs: float = 0.0,
                      window_secs: float = 1.5) -> list[SpeakerSegment]:
        """Assign speakers over fixed windows of one audio chunk."""
        sr = 16000
        win = int(window_secs * sr)
        segments: list[SpeakerSegment] = []
        for start in range(0, max(1, len(audio) - win // 2), win):
            piece = audio[start:start + win]
            if len(piece) < sr // 4:
                break
            if float(np.sqrt(np.mean(piece ** 2))) < 1e-4:
                continue  # silence — skip embedding
            sid = self.clusterer.assign(self.embed(piece))
            segments.append(SpeakerSegment(
                offset_secs + start / sr,
                offset_secs + min(start + win, len(audio)) / sr, sid))
        # Merge adjacent same-speaker windows.
        merged: list[SpeakerSegment] = []
        for s in segments:
            if merged and merged[-1].speaker_id == s.speaker_id and \
                    abs(merged[-1].end_secs - s.start_secs) < 1e-6:
                merged[-1] = SpeakerSegment(merged[-1].start_secs,
                                            s.end_secs, s.speaker_id)
            else:
                merged.append(s)
        return merged
