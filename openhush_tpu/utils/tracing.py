"""Structured tracing: per-stage timing logs + JAX profiler hooks.

Parity: the reference's per-job timing breakdown (audio/preprocess/
transcribe/total + RTF ratio, src/queue/worker.rs:170-180), model-load and
chunk-benchmark timings (src/main.rs:1006-1014), and tracing-subscriber
EnvFilter-style level control (src/main.rs:350-412: RUST_LOG > --verbose >
config). The TPU addition: `profile()` wraps jax.profiler traces for
perfetto-compatible device timelines.
"""

from __future__ import annotations

import contextlib
import logging
import logging.handlers
import os
import time
from typing import Optional

log = logging.getLogger("openhush")


def setup_logging(level: Optional[str] = None, verbose: int = 0,
                  config_level: str = "info",
                  file_path: Optional[str] = None) -> None:
    """Priority: OPENHUSH_LOG env > --verbose count > config level
    (mirrors RUST_LOG > --verbose > config.logging.level)."""
    env = os.environ.get("OPENHUSH_LOG")
    if level is None:
        if env:
            level = env
        elif verbose >= 2:
            level = "debug"
        elif verbose == 1:
            level = "info"
        else:
            level = config_level
    numeric = getattr(logging, level.upper(), logging.INFO)
    handlers: list[logging.Handler] = [logging.StreamHandler()]
    if file_path:
        os.makedirs(os.path.dirname(file_path), exist_ok=True)
        handlers.append(logging.handlers.TimedRotatingFileHandler(
            file_path, when="midnight", backupCount=7))
    logging.basicConfig(
        level=numeric, handlers=handlers, force=True,
        format="%(asctime)s %(levelname)-5s %(name)s: %(message)s")


class StageTimer:
    """Accumulates named stage durations; emits one structured line.

    Usage:
        t = StageTimer("transcribe-job")
        with t.stage("preprocess"): ...
        with t.stage("transcribe"): ...
        t.finish(audio_secs=4.2)
    """

    def __init__(self, name: str):
        self.name = name
        self.stages: dict[str, float] = {}
        self._t0 = time.monotonic()

    @contextlib.contextmanager
    def stage(self, stage_name: str):
        start = time.monotonic()
        try:
            yield
        finally:
            self.stages[stage_name] = self.stages.get(stage_name, 0.0) \
                + time.monotonic() - start

    def finish(self, audio_secs: Optional[float] = None) -> dict:
        total = time.monotonic() - self._t0
        parts = {k: round(v * 1000, 1) for k, v in self.stages.items()}
        record = {"job": self.name, "total_ms": round(total * 1000, 1),
                  **{f"{k}_ms": v for k, v in parts.items()}}
        if audio_secs:
            record["audio_secs"] = round(audio_secs, 2)
            record["rtf"] = round(total / audio_secs, 4)
        # One line per job, greppable (parity: worker.rs:170-180 format).
        log.info("timing %s", " ".join(f"{k}={v}" for k, v in
                                       record.items()))
        return record


@contextlib.contextmanager
def profile(out_dir: Optional[str] = None):
    """Capture a JAX device profile around a block (view with perfetto /
    tensorboard). No-op when profiling is unsupported on the backend."""
    import jax
    out_dir = out_dir or os.path.join("/tmp", "openhush-profile")
    try:
        jax.profiler.start_trace(out_dir)
        started = True
    except Exception as e:  # noqa: BLE001
        log.warning("profiler unavailable: %s", e)
        started = False
    try:
        yield out_dir
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
                log.info("profile written to %s", out_dir)
            except Exception:  # noqa: BLE001
                pass
