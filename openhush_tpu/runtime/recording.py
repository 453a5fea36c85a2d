"""Long-form recording sessions (`openhush record`).

Parity: src/recording.rs (577 LoC) — streams audio from a source (system
audio/mic/WAV file), transcribes in 5 s chunks with 0.5 s overlap
(:28-32), optional per-chunk speaker diarization, live stdout, and
text/timestamped/SRT/VTT output with a final flush on interrupt
(:237-506). Here chunks flow through the continuous-batching engine server
instead of a blocking per-chunk FFI call, so transcription of chunk N
overlaps capture of chunk N+1 by construction.
"""

from __future__ import annotations

import dataclasses
import logging
import signal
import sys
import time
from typing import Optional

import numpy as np

from openhush_tpu.text import formats

log = logging.getLogger(__name__)

CHUNK_DURATION_SECS = 5.0
CHUNK_OVERLAP_SECS = 0.5
SAMPLE_RATE = 16_000


@dataclasses.dataclass
class RecordingConfig:
    """Parity: RecordingConfig (src/recording.rs:104-116)."""
    source: str = "mic"                   # mic|monitor|file:<path>
    output_file: Optional[str] = None
    enable_diarization: bool = False
    live_mode: bool = True
    output_format: str = "text"


class RecordingSession:
    """Capture → chunk → transcribe (→ diarize) → format loop."""

    def __init__(self, config: RecordingConfig, server, audio_source,
                 tokenizer=None, diarizer=None,
                 stdout=None):
        self.config = config
        self.server = server
        self.source = audio_source
        self.stdout = stdout or sys.stdout
        self.segments: list[formats.TranscribedSegment] = []
        self._buffer = np.zeros(0, np.float32)
        self._consumed_secs = 0.0
        self._session_id: Optional[int] = None
        self._pending = 0
        self._stop = False
        self.diarizer = diarizer
        if config.enable_diarization and diarizer is None:
            from openhush_tpu.models.diarization import DiarizationEngine
            self.diarizer = DiarizationEngine.from_local()

    # -- loop -------------------------------------------------------------------

    def run(self, max_duration: Optional[float] = None) -> None:
        self._session_id = self.server.open_session()
        if hasattr(self.server, "start"):
            self.server.start()
        self.source.start(self._on_audio)
        fmt = formats.parse_format(self.config.output_format)
        if self.config.live_mode and fmt == "vtt":
            print("WEBVTT\n", file=self.stdout)
        started = time.monotonic()
        try:
            while not self._stop:
                if max_duration and time.monotonic() - started > max_duration:
                    break
                self._maybe_submit_chunk()
                self._drain(final=False)
                if getattr(self.source, "_thread", None) is not None and \
                        not self.source._thread.is_alive() and \
                        len(self._buffer) < SAMPLE_RATE // 2 and \
                        self._pending == 0:
                    break  # file source exhausted and everything drained
                time.sleep(0.01)
        finally:
            self.finish()

    def stop(self) -> None:
        self._stop = True

    def finish(self) -> None:
        """Final flush: submit the remainder, wait for results, save.
        Parity: Ctrl+C final flush + save_to_file (recording.rs:506)."""
        try:
            self.source.stop()
        except Exception:  # noqa: BLE001
            pass
        if len(self._buffer) >= SAMPLE_RATE // 10:
            self._submit(self._buffer)
            self._buffer = np.zeros(0, np.float32)
        deadline = time.monotonic() + 120
        while self._pending > 0 and time.monotonic() < deadline:
            self._drain(final=True)
            time.sleep(0.01)
        if hasattr(self.server, "stop"):
            self.server.stop()
        if self.config.output_file:
            self.save_to_file(self.config.output_file)

    # -- internals ----------------------------------------------------------------

    def _on_audio(self, samples: np.ndarray) -> None:
        self._buffer = np.concatenate([self._buffer,
                                       np.asarray(samples, np.float32)])

    def _maybe_submit_chunk(self) -> None:
        chunk_len = int(CHUNK_DURATION_SECS * SAMPLE_RATE)
        if len(self._buffer) < chunk_len:
            return
        overlap = int(CHUNK_OVERLAP_SECS * SAMPLE_RATE)
        chunk = self._buffer[:chunk_len]
        self._buffer = self._buffer[chunk_len - overlap:]
        self._submit(chunk)

    def _submit(self, chunk: np.ndarray) -> None:
        offset = self._consumed_secs
        self._consumed_secs += max(
            0.0, len(chunk) / SAMPLE_RATE - CHUNK_OVERLAP_SECS)
        self.server.submit_window(
            self._session_id, chunk,
            window_id=int(offset * 1000), timestamps=False)
        self._pending += 1
        if self.diarizer is not None:
            self._chunk_speakers = getattr(self, "_chunk_speakers", {})
            self._chunk_speakers[int(offset * 1000)] = \
                self.diarizer.diarize_chunk(chunk, offset_secs=offset)

    def _drain(self, final: bool) -> None:
        while True:
            res = self.server.poll(self._session_id)
            if res is None:
                return
            self._pending -= 1
            offset = res.window_id / 1000.0
            text = res.text.strip()
            if not text:
                continue
            speaker = None
            if self.diarizer is not None:
                segs = getattr(self, "_chunk_speakers", {}).get(
                    res.window_id, [])
                if segs:
                    # Dominant speaker of the chunk.
                    durations: dict[int, float] = {}
                    for s in segs:
                        durations[s.speaker_id] = durations.get(
                            s.speaker_id, 0.0) + s.end_secs - s.start_secs
                    speaker = max(durations, key=durations.get)
            seg = formats.TranscribedSegment(
                start_secs=offset,
                end_secs=offset + CHUNK_DURATION_SECS,
                text=text, speaker_id=speaker)
            self.segments.append(seg)
            if self.config.live_mode:
                self._emit_live(seg)

    def _emit_live(self, seg: formats.TranscribedSegment) -> None:
        fmt = formats.parse_format(self.config.output_format)
        if fmt == "text":
            print(seg.text, file=self.stdout, flush=True)
        elif fmt == "timestamped":
            print(formats.format_timestamped(seg), file=self.stdout,
                  flush=True)
        elif fmt == "srt":
            print(formats.format_srt(seg, len(self.segments)),
                  file=self.stdout, flush=True)
        else:
            print(formats.format_vtt(seg), file=self.stdout, flush=True)

    def save_to_file(self, path: str) -> None:
        self.segments.sort(key=lambda s: s.start_secs)
        with open(path, "w") as f:
            f.write(formats.render(self.segments,
                                   self.config.output_format))
        log.info("Saved %d segments to %s", len(self.segments), path)


# ---------------------------------------------------------------------------
# CLI entry (dispatched via daemon_cli: `openhush record ...`)
# ---------------------------------------------------------------------------

def cmd_record(args: list[str]) -> int:
    import argparse

    from openhush_tpu.audio.capture import (FileSource, NullSource,
                                            SoundDeviceSource)
    from openhush_tpu.audio.wav import load_wav
    from openhush_tpu.runtime.engine import WhisperEngine
    from openhush_tpu.runtime.server import EngineServer
    from openhush_tpu.utils.config import Config
    import os

    p = argparse.ArgumentParser(prog="openhush record")
    p.add_argument("--source", "-s", default="mic",
                   help="mic|monitor|file:<path>")
    p.add_argument("--output", "-o", default=None)
    p.add_argument("--format", "-F", default="text")
    p.add_argument("--diarize", action="store_true")
    p.add_argument("--model", "-m", default=None)
    p.add_argument("--max-duration", type=float, default=None)
    ns = p.parse_args(args)

    try:
        formats.parse_format(ns.format)
    except ValueError as e:
        print(e, file=sys.stderr)
        return 2

    config = Config.load_or_default()
    model = ns.model or config.transcription.effective_model()
    allow_random = os.environ.get("OPENHUSH_ALLOW_RANDOM_INIT") == "1"
    try:
        eng = WhisperEngine(model, language=config.transcription.language,
                            allow_random_init=allow_random,
                            draft_model=config.transcription.draft_model
                            or None)
    except FileNotFoundError as e:
        print(e, file=sys.stderr)
        return 1
    server = EngineServer(eng.cfg, eng.params, tokenizer=eng.tokenizer)

    if ns.source.startswith("file:"):
        source = FileSource(load_wav(ns.source[5:]), realtime=False)
    elif ns.source == "mic":
        try:
            source = SoundDeviceSource()
        except Exception as e:  # noqa: BLE001
            print(f"Microphone capture unavailable ({e})", file=sys.stderr)
            return 1
    elif ns.source == "monitor":
        from openhush_tpu.audio.system_audio_hosts import open_system_source
        try:
            source = open_system_source()
        except RuntimeError as e:
            print(f"System-audio capture unavailable ({e})",
                  file=sys.stderr)
            return 1
    elif ns.source == "both":
        from openhush_tpu.audio.system_audio import MixedSource
        from openhush_tpu.audio.system_audio_hosts import open_system_source
        try:
            source = MixedSource(SoundDeviceSource(), open_system_source())
        except Exception as e:  # noqa: BLE001
            print(f"Mixed capture unavailable ({e})", file=sys.stderr)
            return 1
    else:
        print(f"unknown source {ns.source!r}", file=sys.stderr)
        return 2

    session = RecordingSession(
        RecordingConfig(source=ns.source, output_file=ns.output,
                        enable_diarization=ns.diarize, live_mode=True,
                        output_format=ns.format),
        server, source)
    signal.signal(signal.SIGINT, lambda *a: session.stop())
    session.run(max_duration=ns.max_duration)
    return 0
