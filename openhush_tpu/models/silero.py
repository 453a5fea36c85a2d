"""Silero VAD (v5 family) as a native JAX model + checkpoint converter.

The reference consumes Silero through the bundled ONNX model and the ONNX
Runtime (`silero-vad-rust`, model.forward_chunk(chunk, 16000) at
src/vad/silero.rs:54, 512-sample/32 ms chunks @16 kHz → speech prob).
Here the same network is a functional JAX step — (params, state, chunk) →
(state, prob) — that jits, vmaps across concurrent capture sessions, and
runs on TPU beside the Whisper decoder.

Architecture (Silero VAD v5, 16 kHz path), matching the published
checkpoint's tensor inventory:

  chunk[512] ── concat(context[64]) ──► x[576]
  STFT: reflect-pad 64, conv1d(basis [258,1,256], stride 128) → 4 frames;
        split 129 re / 129 im → magnitude [129, 4]
  encoder: 4× (conv1d k=3, ReLU), channels 129→128→64→64→128,
           strides 1,2,2,1, pad 1 → [128, 1]
  decoder: LSTMCell(128) carried across chunks → ReLU → conv1x1 → sigmoid

The converter maps the torch-jit checkpoint's names
(_model.stft.forward_basis_buffer, _model.encoder.N.reparam_conv.*,
_model.decoder.rnn.*, _model.decoder.decoder.2.*) into the params pytree.
ONNX checkpoints run via the generic importer (models/onnx2jax.py)
instead, which executes whatever graph the file actually contains.

The exact reflect-padding placement of the STFT differs between exports;
`stft_pad_mode` selects it, and tools/validate_aux.py picks the variant
that matches a real checkpoint's outputs on a networked machine and
records it into the npz (`meta_stft_pad_mode`).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

CHUNK = 512
CONTEXT = 64
SR = 16_000
N_FFT = 256
HOP = 128
N_BINS = N_FFT // 2 + 1      # 129
HIDDEN = 128

# STFT reflect-pad variants seen across Silero exports.
PAD_MODES = ("left", "right", "both")


class SileroState(NamedTuple):
    h: jax.Array           # [HIDDEN] LSTM hidden
    c: jax.Array           # [HIDDEN] LSTM cell
    context: jax.Array     # [CONTEXT] tail of previous chunk


def init_state(batch: Optional[int] = None) -> SileroState:
    shape = (HIDDEN,) if batch is None else (batch, HIDDEN)
    ctx = (CONTEXT,) if batch is None else (batch, CONTEXT)
    z = jnp.zeros
    return SileroState(z(shape, jnp.float32), z(shape, jnp.float32),
                       z(ctx, jnp.float32))


def init_params(key: jax.Array) -> dict:
    """Random-init params with the checkpoint's exact shapes (structure
    tests / custom training)."""
    ks = jax.random.split(key, 6)
    g = lambda k, sh: (jax.random.normal(k, sh)
                       * (1.0 / np.sqrt(np.prod(sh[1:])))).astype(jnp.float32)
    # Real DFT basis (what the checkpoint stores) as the default
    n = np.arange(N_FFT)
    k = np.arange(N_BINS)
    window = np.hanning(N_FFT + 1)[:-1]
    ang = 2 * np.pi * np.outer(k, n) / N_FFT
    basis = np.concatenate([np.cos(ang), -np.sin(ang)]) * window
    return {
        "stft_basis": jnp.asarray(basis, jnp.float32),        # [258, 256]
        "enc0_w": g(ks[0], (128, N_BINS, 3)), "enc0_b": jnp.zeros((128,)),
        "enc1_w": g(ks[1], (64, 128, 3)), "enc1_b": jnp.zeros((64,)),
        "enc2_w": g(ks[2], (64, 64, 3)), "enc2_b": jnp.zeros((64,)),
        "enc3_w": g(ks[3], (128, 64, 3)), "enc3_b": jnp.zeros((128,)),
        "lstm_wi": g(ks[4], (4 * HIDDEN, HIDDEN)),
        "lstm_wh": g(ks[5], (4 * HIDDEN, HIDDEN)),
        "lstm_bi": jnp.zeros((4 * HIDDEN,)),
        "lstm_bh": jnp.zeros((4 * HIDDEN,)),
        "out_w": jnp.zeros((1, HIDDEN, 1)) + 0.01,
        "out_b": jnp.zeros((1,)),
    }


def _conv1d(x: jax.Array, w: jax.Array, b: Optional[jax.Array],
            stride: int, pad: int) -> jax.Array:
    """x [C, T], w [O, C, K] → [O, T']."""
    out = jax.lax.conv_general_dilated(
        x[None], w, (stride,), [(pad, pad)],
        dimension_numbers=("NCH", "OIH", "NCH"),
        precision=jax.lax.Precision.HIGHEST)[0]
    return out if b is None else out + b[:, None]


def _stft_magnitude(params: dict, x: jax.Array, pad_mode: str) -> jax.Array:
    """x [576] → magnitude [129, 4]."""
    if pad_mode == "left":
        x = jnp.pad(x, (CONTEXT, 0), mode="reflect")
    elif pad_mode == "right":
        x = jnp.pad(x, (0, CONTEXT), mode="reflect")
    else:
        x = jnp.pad(x, (CONTEXT // 2, CONTEXT // 2), mode="reflect")
    spec = _conv1d(x[None], params["stft_basis"][:, None, :], None,
                   HOP, 0)                                   # [258, T]
    re, im = spec[:N_BINS], spec[N_BINS:]
    return jnp.sqrt(re * re + im * im + 1e-12)


def forward_chunk(params: dict, state: SileroState, chunk: jax.Array,
                  pad_mode: str = "left") -> tuple[SileroState, jax.Array]:
    """One 512-sample 16 kHz chunk → (new state, speech probability).

    Functional parity surface: silero-vad-rust's
    `model.forward_chunk(chunk, 16000)` (reference src/vad/silero.rs:54).
    """
    x = jnp.concatenate([state.context, chunk])              # [576]
    mag = _stft_magnitude(params, x, pad_mode)               # [129, T]
    h = jax.nn.relu(_conv1d(mag, params["enc0_w"], params["enc0_b"], 1, 1))
    h = jax.nn.relu(_conv1d(h, params["enc1_w"], params["enc1_b"], 2, 1))
    h = jax.nn.relu(_conv1d(h, params["enc2_w"], params["enc2_b"], 2, 1))
    h = jax.nn.relu(_conv1d(h, params["enc3_w"], params["enc3_b"], 1, 1))
    feat = jnp.mean(h, axis=1)                               # [128] (T'→1)

    # torch LSTMCell, gate order i, f, g, o
    gates = (params["lstm_wi"] @ feat + params["lstm_bi"]
             + params["lstm_wh"] @ state.h + params["lstm_bh"])
    i, f, g, o = jnp.split(gates, 4)
    c = jax.nn.sigmoid(f) * state.c + jax.nn.sigmoid(i) * jnp.tanh(g)
    hh = jax.nn.sigmoid(o) * jnp.tanh(c)

    out = jax.nn.relu(hh)
    prob = jax.nn.sigmoid(params["out_w"][0, :, 0] @ out + params["out_b"])
    new_state = SileroState(hh, c, chunk[-CONTEXT:])
    return new_state, prob[0]


# ---------------------------------------------------------------------------
# Checkpoint conversion (torch-jit names → params pytree)
# ---------------------------------------------------------------------------

_JIT_NAME_MAP = {
    "_model.stft.forward_basis_buffer": ("stft_basis", (258, 1, N_FFT)),
    "_model.encoder.0.reparam_conv.weight": ("enc0_w", (128, N_BINS, 3)),
    "_model.encoder.0.reparam_conv.bias": ("enc0_b", (128,)),
    "_model.encoder.1.reparam_conv.weight": ("enc1_w", (64, 128, 3)),
    "_model.encoder.1.reparam_conv.bias": ("enc1_b", (64,)),
    "_model.encoder.2.reparam_conv.weight": ("enc2_w", (64, 64, 3)),
    "_model.encoder.2.reparam_conv.bias": ("enc2_b", (64,)),
    "_model.encoder.3.reparam_conv.weight": ("enc3_w", (128, 64, 3)),
    "_model.encoder.3.reparam_conv.bias": ("enc3_b", (128,)),
    "_model.decoder.rnn.weight_ih": ("lstm_wi", (4 * HIDDEN, HIDDEN)),
    "_model.decoder.rnn.weight_hh": ("lstm_wh", (4 * HIDDEN, HIDDEN)),
    "_model.decoder.rnn.bias_ih": ("lstm_bi", (4 * HIDDEN,)),
    "_model.decoder.rnn.bias_hh": ("lstm_bh", (4 * HIDDEN,)),
    "_model.decoder.decoder.2.weight": ("out_w", (1, HIDDEN, 1)),
    "_model.decoder.decoder.2.bias": ("out_b", (1,)),
}


def convert_state_dict(sd: dict) -> dict:
    """Map a Silero v5 torch state_dict (jit or eager) to the params
    pytree, validating every expected tensor's presence and shape."""
    def to_np(v):
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach")
                          else v, np.float32)

    # jit checkpoints carry the _model. prefix; accept both.
    lookup = {}
    for name, v in sd.items():
        lookup[name] = v
        if not name.startswith("_model."):
            lookup["_model." + name] = v

    params = {}
    missing = []
    for src, (dst, shape) in _JIT_NAME_MAP.items():
        if src not in lookup:
            missing.append(src)
            continue
        arr = to_np(lookup[src])
        if tuple(arr.shape) != shape:
            raise ValueError(
                f"{src}: expected shape {shape}, checkpoint has "
                f"{tuple(arr.shape)} — not a Silero v5 16 kHz model?")
        if dst == "stft_basis":
            arr = arr[:, 0, :]
        params[dst] = jnp.asarray(arr)
    if missing:
        raise ValueError(
            "checkpoint is missing expected Silero v5 tensors:\n  "
            + "\n  ".join(missing))
    return params


def convert_jit(path: str) -> dict:
    """Convert the official silero_vad.jit checkpoint."""
    import torch
    model = torch.jit.load(path, map_location="cpu")
    return convert_state_dict(model.state_dict())


def save_npz(params: dict, path: str, pad_mode: str = "left") -> None:
    arrays = {k: np.asarray(v) for k, v in params.items()}
    arrays["meta_stft_pad_mode"] = np.asarray(
        PAD_MODES.index(pad_mode), np.int64)
    np.savez(path, **arrays)


def load_npz(path: str) -> tuple[dict, str]:
    data = np.load(path)
    pad_mode = "left"
    params = {}
    for k in data.files:
        if k == "meta_stft_pad_mode":
            pad_mode = PAD_MODES[int(data[k])]
        else:
            params[k] = jnp.asarray(data[k])
    return params, pad_mode


class SileroVad:
    """Stateful host wrapper, drop-in alongside VadEngine kinds."""

    def __init__(self, params: Optional[dict] = None, threshold: float = 0.5,
                 pad_mode: str = "left"):
        self.params = params or init_params(jax.random.PRNGKey(0))
        self.threshold = threshold
        self.pad_mode = pad_mode
        self._state = init_state()
        self._step = jax.jit(forward_chunk,
                             static_argnames=("pad_mode",))

    @classmethod
    def load(cls, path: str, threshold: float = 0.5) -> "SileroVad":
        params, pad_mode = load_npz(path)
        return cls(params, threshold, pad_mode)

    def process(self, samples: np.ndarray):
        from openhush_tpu.models.vad import VadResult
        chunk = np.zeros(CHUNK, np.float32)
        n = min(len(samples), CHUNK)
        chunk[:n] = samples[:n]
        self._state, prob = self._step(self.params, self._state,
                                       jnp.asarray(chunk),
                                       pad_mode=self.pad_mode)
        p = float(prob)
        return VadResult(p, p >= self.threshold)

    def reset(self) -> None:
        self._state = init_state()

    @property
    def chunk_size(self) -> int:
        return CHUNK

    @property
    def sample_rate(self) -> int:
        return SR
