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


def int8_rung_enabled(model_dir: str | None = None) -> bool:
    """True when the combined int8 rung is on: OPENHUSH_INT8_RUNG=1 (0
    forces off), else the checkpoint-gate marker in the models dir."""
    env = os.environ.get("OPENHUSH_INT8_RUNG")
    if env is not None:
        return env == "1"
    if model_dir is None:
        from openhush_tpu.runtime.engine import default_model_dir
        model_dir = default_model_dir()
    return os.path.exists(os.path.join(model_dir, RUNG_MARKER))
