"""The combined int8 performance rung behind ONE flag.

Rung = int8 decoder weights + int8 self-cache + int8 cross-KV (always on)
+ the fused Pallas quantize kernel — the fastest measured serving
configuration (295x realtime vs 250x bf16 at B=32 on-chip, round 3). It
stays default-off until a real-weight WER run shows <0.1 abs drift:
tools/checkpoint_gate.py runs that comparison through the actual serving
path and drops the `int8_rung.ok` marker to flip the default atomically
(reference behavior being matched: whisper.cpp ships quantized GGML
variants as first-class models, /root/reference/src/engine/whisper.rs:159-287).
"""

from __future__ import annotations

import os

RUNG_MARKER = "int8_rung.ok"
ENCODER_MARKER = "int8_encoder.ok"


def _flag(env_name: str, marker: str, model_dir: str | None) -> bool:
    env = os.environ.get(env_name)
    if env is not None:
        return env == "1"
    if model_dir is None:
        from openhush_tpu.runtime.engine import default_model_dir
        model_dir = default_model_dir()
    return os.path.exists(os.path.join(model_dir, marker))


def int8_rung_enabled(model_dir: str | None = None) -> bool:
    """True when the combined int8 rung is on: OPENHUSH_INT8_RUNG=1 (0
    forces off), else the checkpoint-gate marker in the models dir."""
    return _flag("OPENHUSH_INT8_RUNG", RUNG_MARKER, model_dir)


def int8_encoder_enabled(model_dir: str | None = None) -> bool:
    """True when the W8A8 encoder rung is on (int8 encoder weights +
    per-row int8 activations on the MXU — model.quantize_encoder_weights):
    OPENHUSH_INT8_ENCODER=1 (0 forces off), else the checkpoint-gate
    marker. Separate flag from the decoder rung: the two attack different
    bottlenecks (encoder = MXU compute, decoder = HBM bandwidth) and
    carry different WER-drift profiles, so the gate decides them
    independently (tools/checkpoint_gate.py)."""
    return _flag("OPENHUSH_INT8_ENCODER", ENCODER_MARKER, model_dir)
