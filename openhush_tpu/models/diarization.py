"""Speaker diarization: segmentation + speaker embeddings + clustering.

Parity: the reference embeds pyannote's ONNX models
(src/diarization/mod.rs:1-385): segmentation-3.0 for speech regions,
wespeaker CAM++ embeddings, then incremental cosine-similarity clustering
with a threshold and a max-speaker cap (get_segments +
EmbeddingExtractor::compute + EmbeddingManager::search_speaker,
mod.rs:266-299).

TPU-native layout:
- SegmentationModel: per-frame local-speaker activities (the
  segmentation-3.0 role): log-mel → strided convs → GRU scan → K sigmoid
  activity channels. Trainable (training/speaker.py trains it on
  synthetic mixtures); when no checkpoint is installed the device-side
  VAD (models/vad.py) fills the same role (speech/non-speech only — it
  cannot separate overlapping speakers; documented degradation).
- SpeakerEmbedder: log-mel → TDNN-ish conv stack → statistics pooling
  (mean||std) → d-vector, as one jittable function; weights load from npz
  (converted from a trained x-vector/CAM++ checkpoint, or trained with
  training/speaker.py) or random for structure tests.
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


def init_embedder_params(key, dtype=jnp.float32, width: int = 128) -> dict:
    ks = jax.random.split(key, 4)
    s = lambda fan: fan ** -0.5
    return {
        "conv1_w": jax.random.normal(ks[0], (5, N_MELS, width)) * s(5 * 80),
        "conv1_b": jnp.zeros((width,)),
        "conv2_w": jax.random.normal(ks[1],
                                     (3, width, width)) * s(3 * width),
        "conv2_b": jnp.zeros((width,)),
        "dense_w": jax.random.normal(ks[2], (2 * width, EMB_DIM)
                                     ) * s(2 * width),
        "dense_b": jnp.zeros((EMB_DIM,)),
    }


def embed_batch(params: dict, mel: jax.Array) -> jax.Array:
    """Core embedder on batched mel: [B, T, n_mels] → L2-normed
    [B, EMB_DIM]. Differentiable — training/speaker.py optimizes through
    this exact function, so trained checkpoints match inference."""
    dn = ("NHC", "HIO", "NHC")
    x = jax.nn.relu(jax.lax.conv_general_dilated(
        mel, params["conv1_w"], (2,), [(2, 2)], dimension_numbers=dn)
        + params["conv1_b"])
    x = jax.nn.relu(jax.lax.conv_general_dilated(
        x, params["conv2_w"], (2,), [(1, 1)], dimension_numbers=dn)
        + params["conv2_b"])
    # Statistics pooling: mean || std over time.
    mean = jnp.mean(x, axis=1)
    std = jnp.sqrt(jnp.maximum(jnp.var(x, axis=1), 1e-6))
    stats = jnp.concatenate([mean, std], axis=-1)          # [B, 2*width]
    emb = stats @ params["dense_w"] + params["dense_b"]
    return emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)


@functools.partial(jax.jit, static_argnames=("n_frames",))
def speaker_embedding(params: dict, audio: jax.Array,
                      n_frames: int = 300) -> jax.Array:
    """audio [n_frames*160] (≥1 s recommended) → L2-normalized [EMB_DIM]."""
    mel = mel_ops.log_mel_spectrogram(audio, n_mels=N_MELS,
                                      n_frames=n_frames).T  # [T, 80]
    return embed_batch(params, mel[None])[0]


# ---------------------------------------------------------------------------
# Segmentation model (role of pyannote segmentation-3.0,
# src/diarization/mod.rs:266 get_segments): per-frame activity of up to
# SEG_K locally-active speakers, so overlapping speech separates — the
# capability the VAD substitute lacks.
# ---------------------------------------------------------------------------

SEG_K = 3          # local speaker channels per window (pyannote uses 3)
SEG_HIDDEN = 64


def init_segmentation_params(key, n_mels: int = N_MELS,
                             hidden: int = SEG_HIDDEN,
                             k: int = SEG_K) -> dict:
    ks = jax.random.split(key, 6)
    s = lambda fan: fan ** -0.5
    return {
        "conv1_w": jax.random.normal(ks[0],
                                     (5, n_mels, hidden)) * s(5 * n_mels),
        "conv1_b": jnp.zeros((hidden,)),
        "conv2_w": jax.random.normal(ks[1],
                                     (3, hidden, hidden)) * s(3 * hidden),
        "conv2_b": jnp.zeros((hidden,)),
        # fused GRU gates [update, reset, candidate]
        "gru_wx": jax.random.normal(ks[2],
                                    (hidden, 3 * hidden)) * s(hidden),
        "gru_wh": jax.random.normal(ks[3],
                                    (hidden, 3 * hidden)) * s(hidden),
        "gru_b": jnp.zeros((3 * hidden,)),
        "out_w": jax.random.normal(ks[4], (hidden, k)) * s(hidden),
        "out_b": jnp.zeros((k,)),
    }


def powerset_to_activities(probs: np.ndarray, k: int = SEG_K
                           ) -> np.ndarray:
    """pyannote segmentation-3.0 emits POWERSET classes over 3 local
    speakers — [∅, {0}, {1}, {2}, {0,1}, {0,2}, {1,2}] — rather than
    per-speaker sigmoids. Marginalize: activity of speaker s = Σ probs of
    classes containing s. probs [T, 7] → activities [T, k]."""
    classes = [(), (0,), (1,), (2,), (0, 1), (0, 2), (1, 2)]
    acts = np.zeros((probs.shape[0], k), np.float32)
    for c, members in enumerate(classes[:probs.shape[1]]):
        for m in members:
            if m < k:
                acts[:, m] += probs[:, c]
    return acts


def segmentation_fn_from_onnx(path: str):
    """Back segmentation with a converted pyannote segmentation-3.0
    .onnx (reference: get_segments, src/diarization/mod.rs:266): graph
    takes waveform [1, 1, N] and emits powerset scores [1, T, 7]
    (log-softmax in the published export). Returns
    fn(audio [N]) → activities [T, SEG_K]."""
    from openhush_tpu.models.onnx2jax import OnnxJaxModel
    model = OnnxJaxModel.load(path)

    def fn(audio: np.ndarray) -> np.ndarray:
        x = jnp.asarray(audio, jnp.float32)[None, None, :]
        out = model(x)
        out = out[0] if isinstance(out, (tuple, list)) else out
        scores = np.asarray(out)[0]                         # [T, C]
        row_sum = scores.sum(axis=-1)
        if scores.max() <= 1e-6 and np.allclose(
                np.exp(scores).sum(axis=-1), 1.0, atol=0.05):
            probs = np.exp(scores)                          # log-softmax
        elif scores.min() >= 0 and np.allclose(row_sum, 1.0, atol=0.05):
            probs = scores                                  # already probs
        else:                                               # raw logits
            e = np.exp(scores - scores.max(axis=-1, keepdims=True))
            probs = e / e.sum(axis=-1, keepdims=True)
        return powerset_to_activities(probs)

    return fn


def segmentation_activities(params: dict, mel: jax.Array) -> jax.Array:
    """mel [B, T, n_mels] → activities [B, T//4, SEG_K] in (0, 1).

    Strided convs (10 ms mel hop → 40 ms activity frames) + GRU scan over
    time (XLA-friendly: lax.scan, static shapes) + per-frame sigmoid
    heads. Channel order is order-of-appearance within the window (the
    training recipe sorts labels that way)."""
    h = params["gru_wx"].shape[0]
    dn = ("NHC", "HIO", "NHC")
    x = jax.nn.relu(jax.lax.conv_general_dilated(
        mel, params["conv1_w"], (2,), [(2, 2)], dimension_numbers=dn)
        + params["conv1_b"])
    x = jax.nn.relu(jax.lax.conv_general_dilated(
        x, params["conv2_w"], (2,), [(1, 1)], dimension_numbers=dn)
        + params["conv2_b"])                      # [B, T/4, hidden]

    def step(carry, xt):                          # xt [B, hidden]
        xg = xt @ params["gru_wx"] + params["gru_b"]
        hg = carry @ params["gru_wh"]
        z = jax.nn.sigmoid(xg[:, :h] + hg[:, :h])
        r = jax.nn.sigmoid(xg[:, h:2 * h] + hg[:, h:2 * h])
        n = jnp.tanh(xg[:, 2 * h:] + r * hg[:, 2 * h:])
        new = (1 - z) * n + z * carry
        return new, new

    h0 = jnp.zeros((mel.shape[0], h), mel.dtype)
    _, hs = jax.lax.scan(step, h0, x.transpose(1, 0, 2))
    hs = hs.transpose(1, 0, 2)                    # [B, T/4, hidden]
    return jax.nn.sigmoid(hs @ params["out_w"] + params["out_b"])


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
                 vad_engine=None, embedder_fn=None,
                 seg_params: Optional[dict] = None,
                 seg_fn=None):
        from openhush_tpu.models.vad import VadEngine
        self.config = config or DiarizationConfig()
        self.params = params or init_embedder_params(jax.random.PRNGKey(0))
        self.clusterer = EmbeddingClusterer(self.config)
        self.vad = vad_engine or VadEngine(kind="energy")
        self._embedder_fn = embedder_fn      # audio [T] → embedding [D]
        # Segmentation backends, either of: a converted pyannote ONNX
        # (seg_fn, audio → activities) or the in-tree trained net
        # (seg_params, training/speaker.py). When absent the fixed-window
        # VAD-substitute path runs (cannot split overlap).
        self.seg_params = seg_params
        self.seg_fn = seg_fn

    @property
    def has_segmentation(self) -> bool:
        return self.seg_fn is not None or self.seg_params is not None

    def reset(self) -> None:
        """Forget the speaker bank (new meeting/recording): multi-file
        evaluations must not let file A's speakers absorb file B's."""
        self.clusterer = EmbeddingClusterer(self.config)

    @classmethod
    def from_local(cls, config: Optional[DiarizationConfig] = None
                   ) -> "DiarizationEngine":
        """Best available local checkpoints, in preference order:
        wespeaker ONNX embedder > trained npz embedder > random-init;
        plus the trained segmentation net when present. Files live in
        <model_dir>/aux/ (written by `model convert-aux` or
        `python -m openhush_tpu.training.speaker`)."""
        import os

        from openhush_tpu.models.whisper.convert import load_npz
        from openhush_tpu.runtime.engine import default_model_dir

        aux = os.path.join(default_model_dir(), "aux")
        # Packaged fallback: small in-tree trained checkpoints (synthetic
        # voices, training/speaker.py recipe; DER on the synthetic
        # meeting set: 0.185 — `openhush evaluate --diarization`), so
        # diarization works out of the box with zero downloads.
        assets = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "assets", "diarization")

        def find(name):
            for base in (aux, assets):
                p = os.path.join(base, name)
                if os.path.exists(p):
                    return p
            return None

        seg_onnx = os.path.join(aux, "segmentation.onnx")
        seg_fn = segmentation_fn_from_onnx(seg_onnx) \
            if os.path.exists(seg_onnx) else None
        seg_path = find("segmentation.npz")
        seg = {k: jnp.asarray(v) for k, v in load_npz(seg_path).items()} \
            if seg_fn is None and seg_path else None
        onnx_path = os.path.join(aux, "wespeaker.onnx")
        if os.path.exists(onnx_path):
            eng = cls.from_onnx(onnx_path, config)
            eng.seg_params, eng.seg_fn = seg, seg_fn
            return eng
        emb_path = find("speaker_embedder.npz")
        params = ({k: jnp.asarray(v)
                   for k, v in load_npz(emb_path).items()}
                  if emb_path else None)
        return cls(config, params=params, seg_params=seg, seg_fn=seg_fn)

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

    def activities(self, audio: np.ndarray) -> np.ndarray:
        """Per-frame local-speaker activities [T', K] from whichever
        segmentation backend is installed."""
        if self.seg_fn is not None:
            return np.asarray(self.seg_fn(np.asarray(audio, np.float32)))
        assert self.seg_params is not None
        hop = mel_ops.HOP_LENGTH
        n_frames = max(8, len(audio) // hop)
        need = n_frames * hop
        a = np.zeros(need, np.float32)
        a[:min(len(audio), need)] = audio[:need]
        mel = np.asarray(jax.jit(
            mel_ops.log_mel_spectrogram,
            static_argnames=("n_mels", "n_frames"))(
                jnp.asarray(a), n_mels=N_MELS, n_frames=n_frames)).T
        return np.asarray(segmentation_activities(
            self.seg_params, jnp.asarray(mel)[None])[0])   # [T/4, K]

    def segment_regions(self, audio: np.ndarray,
                        threshold: float = 0.5,
                        min_frames: int = 3) -> list[tuple[int, int, int]]:
        """Run segmentation: (start_sample, end_sample, channel)
        contiguous active regions per local-speaker channel. Frame
        duration is inferred from the backend's output rate (40 ms for
        the in-tree net; ~17 ms for pyannote exports)."""
        acts = self.activities(audio)
        regions = []
        frame = max(1, len(audio) // max(1, acts.shape[0]))  # samples/frame
        for ch in range(acts.shape[1]):
            active = acts[:, ch] >= threshold
            start = None
            for t, on in enumerate(list(active) + [False]):
                if on and start is None:
                    start = t
                elif not on and start is not None:
                    if t - start >= min_frames:
                        regions.append((start * frame,
                                        min(t * frame, len(audio)), ch))
                    start = None
        regions.sort()
        return regions

    def diarize_chunk(self, audio: np.ndarray,
                      offset_secs: float = 0.0,
                      window_secs: float = 1.5) -> list[SpeakerSegment]:
        """Assign speakers: trained-segmentation regions when available
        (separates overlap), fixed windows otherwise."""
        sr = 16000
        if self.has_segmentation:
            segments = []
            for s0, s1, _ch in self.segment_regions(audio):
                piece = audio[s0:s1]
                if len(piece) < sr // 4:
                    continue
                sid = self.clusterer.assign(self.embed(piece))
                segments.append(SpeakerSegment(
                    offset_secs + s0 / sr, offset_secs + s1 / sr, sid))
            return segments
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
