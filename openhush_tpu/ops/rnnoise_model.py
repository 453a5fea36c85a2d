"""RNNoise: published-model-file parser + the exact network topology.

The reference denoises with `nnnoiseless` (a Rust port of xiph RNNoise;
DenoiseState::process_frame at src/input/audio.rs:293). RNNoise models are
published as whitespace-separated integer text files (the format written
by xiph rnnoise's dump/training tooling and read by
`rnnoise_model_from_file` in src/rnn_reader.c): a "rnnoise-nu model file
version 1" header, then the six layers in order

    input_dense (Dense), vad_gru, noise_gru, denoise_gru (GRU),
    denoise_output, vad_output (Dense)

each as `nb_inputs nb_neurons <weights…> <bias…> activation`, weights
quantized ×256. This module parses that format into a params pytree and
implements the exact compute graph:

    x42 → input_dense(tanh) → d24
    vad_gru(d24) → v24;          vad = vad_output(v24)        (sigmoid)
    noise_gru([d24, v24, x42]) → n48
    denoise_gru([v24, n48, x42]) → dn96
    gains = denoise_output(dn96)                              (sigmoid)

RNNoise's GRU applies the reset gate to the state BEFORE the recurrent
matmul (r*state @ Wh — "linear after reset") and updates
state = z*state + (1-z)*h; both are reproduced exactly. Weights/biases are
pre-scaled by 1/256 at load (equivalent to RNNoise's WEIGHTS_SCALE at
compute time).

Scope note: this gives weight-exact network evaluation. The reference's
48 kHz feature frontend (BFCC + pitch features) is a separate stage; the
in-tree denoiser (ops/denoise.py) uses its own 16 kHz Bark frontend with
either the weight-free Wiener gate or a retrained GRU. Running published
RNNoise weights end-to-end additionally needs the 48 kHz feature path —
tracked in docs/RUNBOOK.md.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

MAGIC = "rnnoise-nu model file version"
WEIGHTS_SCALE = 1.0 / 256.0
_ACTIVATIONS = {0: jnp.tanh, 1: jax.nn.sigmoid, 2: jax.nn.relu}


class _Reader:
    def __init__(self, text: str):
        self.toks = text.split()
        self.pos = 0

    def ints(self, n: int) -> np.ndarray:
        out = np.asarray(self.toks[self.pos:self.pos + n], np.float32)
        if out.size != n:
            raise ValueError("model file truncated")
        self.pos += n
        return out

    def int1(self) -> int:
        v = int(self.toks[self.pos])
        self.pos += 1
        return v


def _read_dense(r: _Reader) -> dict:
    m, n = r.int1(), r.int1()
    w = r.ints(m * n).reshape(m, n) * WEIGHTS_SCALE     # out_i = x @ w + b
    b = r.ints(n) * WEIGHTS_SCALE
    act = r.int1()
    return {"w": jnp.asarray(w), "b": jnp.asarray(b), "act": act}


def _read_gru(r: _Reader) -> dict:
    m, n = r.int1(), r.int1()
    wx = r.ints(m * 3 * n).reshape(m, 3 * n) * WEIGHTS_SCALE  # [z|r|h] cols
    wh = r.ints(n * 3 * n).reshape(n, 3 * n) * WEIGHTS_SCALE
    b = r.ints(3 * n) * WEIGHTS_SCALE
    act = r.int1()
    return {"wx": jnp.asarray(wx), "wh": jnp.asarray(wh),
            "b": jnp.asarray(b), "act": act}


def parse_model_file(text: str) -> dict:
    """Parse the RNNoise text model format into a params pytree."""
    header, _, rest = text.partition("\n")
    if not header.startswith(MAGIC):
        raise ValueError(f"not an RNNoise model file (header {header!r})")
    version = int(header[len(MAGIC):].strip())
    if version != 1:
        raise ValueError(f"unsupported RNNoise model version {version}")
    r = _Reader(rest)
    params = {
        "input_dense": _read_dense(r),
        "vad_gru": _read_gru(r),
        "noise_gru": _read_gru(r),
        "denoise_gru": _read_gru(r),
        "denoise_output": _read_dense(r),
        "vad_output": _read_dense(r),
    }
    # Structural validation: the concat pattern must be consistent.
    d = params["input_dense"]["w"].shape[1]
    v = params["vad_gru"]["wx"].shape[1] // 3
    x = params["input_dense"]["w"].shape[0]
    n = params["noise_gru"]["wx"].shape[1] // 3
    expect_noise_in = d + v + x
    expect_den_in = v + n + x
    if params["noise_gru"]["wx"].shape[0] != expect_noise_in:
        raise ValueError("noise_gru input dim inconsistent with topology")
    if params["denoise_gru"]["wx"].shape[0] != expect_den_in:
        raise ValueError("denoise_gru input dim inconsistent with topology")
    return params


def load(path: str) -> dict:
    with open(path) as fh:
        return parse_model_file(fh.read())


def save_npz(params: dict, path: str) -> None:
    flat = {}
    for layer, p in params.items():
        for k, v in p.items():
            flat[f"{layer}.{k}"] = np.asarray(v)
    np.savez(path, **flat)


def load_npz(path: str) -> dict:
    data = np.load(path)
    params: dict = {}
    for key in data.files:
        layer, _, k = key.rpartition(".")
        arr = data[key]
        params.setdefault(layer, {})[k] = (
            int(arr) if k == "act" else jnp.asarray(arr))
    return params


# ---------------------------------------------------------------------------
# Exact compute graph
# ---------------------------------------------------------------------------

class RnnoiseRnnState(NamedTuple):
    vad: jax.Array        # [24]
    noise: jax.Array      # [48]
    denoise: jax.Array    # [96]


def init_rnn_state(params: dict) -> RnnoiseRnnState:
    z = lambda layer: jnp.zeros((params[layer]["wx"].shape[1] // 3,),
                                jnp.float32)
    return RnnoiseRnnState(z("vad_gru"), z("noise_gru"), z("denoise_gru"))


def _dense(p: dict, x: jax.Array) -> jax.Array:
    return _ACTIVATIONS[p["act"]](x @ p["w"] + p["b"])


def _gru(p: dict, x: jax.Array, h: jax.Array) -> jax.Array:
    """RNNoise GRU: reset applied to state before the recurrent matmul;
    state' = z*state + (1-z)*h_cand (src/rnn.c compute_gru semantics)."""
    n = h.shape[-1]
    xg = x @ p["wx"] + p["b"]
    hg = h @ p["wh"]
    z = jax.nn.sigmoid(xg[..., :n] + hg[..., :n])
    r = jax.nn.sigmoid(xg[..., n:2 * n] + hg[..., n:2 * n])
    cand = _ACTIVATIONS[p["act"]](
        xg[..., 2 * n:] + (r * h) @ p["wh"][:, 2 * n:])
    return z * h + (1 - z) * cand


def rnn_step(params: dict, state: RnnoiseRnnState,
             features: jax.Array) -> tuple[RnnoiseRnnState,
                                           jax.Array, jax.Array]:
    """One 10 ms frame: features [42] → (state, gains [22], vad prob)."""
    d = _dense(params["input_dense"], features)
    v = _gru(params["vad_gru"], d, state.vad)
    vad = _dense(params["vad_output"], v)[0]
    noise_in = jnp.concatenate([d, v, features])
    nz = _gru(params["noise_gru"], noise_in, state.noise)
    den_in = jnp.concatenate([v, nz, features])
    dn = _gru(params["denoise_gru"], den_in, state.denoise)
    gains = _dense(params["denoise_output"], dn)
    return RnnoiseRnnState(v, nz, dn), gains, vad


def rnn_sequence(params: dict, state: RnnoiseRnnState,
                 features: jax.Array):
    """features [T, 42] → (state, gains [T, 22], vad [T]) via lax.scan.

    Not jitted here: the integer `act` selectors in params must stay
    static. Jit a wrapper that closes over params instead."""
    def step(s, f):
        s, gains, vad = rnn_step(params, s, f)
        return s, (gains, vad)

    state, (gains, vad) = jax.lax.scan(step, state, features)
    return state, gains, vad
