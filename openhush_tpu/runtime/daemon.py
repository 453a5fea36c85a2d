"""Daemon orchestrator: state machine, chunked streaming, IPC, PID lifecycle.

The TPU-native counterpart of src/daemon.rs (2,719 LoC): always-on capture
into the ring buffer, push-to-talk/toggle/continuous modes, auto-tuned chunk
timer, VAD-gated segmentation, results → tracker (ordering + dedup) → output
pipeline. The tokio::select! event loop (daemon.rs:1623-2234) becomes a
polling loop over thread-safe queues; the 1-thread whisper worker becomes the
continuous-batching EngineServer.

States (parity: daemon.rs:739-762): IDLE / RECORDING / CONTINUOUS.
PID lifecycle (parity: daemon.rs:2269-2355,2509-2588): O_EXCL create, stale
cleanup with /proc existence + cmdline verification.
"""

from __future__ import annotations

import dataclasses
import enum
import json
import logging
import os
import signal
import sys
import threading
import time
from typing import Callable, Optional

import numpy as np

from openhush_tpu import __version__
from openhush_tpu.models import vad as vad_mod
from openhush_tpu.runtime import ipc
from openhush_tpu.runtime.ring_buffer import RingBuffer
from openhush_tpu.runtime.tracker import ChunkResult, TranscriptionTracker

log = logging.getLogger(__name__)


class DaemonState(enum.Enum):
    IDLE = "idle"
    RECORDING = "recording"
    CONTINUOUS = "continuous"


def pid_file_path() -> str:
    runtime = os.environ.get("XDG_RUNTIME_DIR", "/tmp")
    return os.path.join(runtime, "openhush.pid")


def write_pid_file(path: Optional[str] = None) -> None:
    """O_EXCL create with stale-PID cleanup (daemon.rs:2269-2355)."""
    path = path or pid_file_path()
    while True:
        try:
            fd = os.open(path, os.O_WRONLY | os.O_CREAT | os.O_EXCL, 0o600)
            os.write(fd, str(os.getpid()).encode())
            os.close(fd)
            return
        except FileExistsError:
            try:
                with open(path) as f:
                    old_pid = int(f.read().strip() or "0")
            except (ValueError, OSError):
                old_pid = 0
            if old_pid and _pid_is_openhush(old_pid):
                raise RuntimeError(
                    f"Daemon already running (pid {old_pid})")
            log.warning("Removing stale PID file (pid %d gone)", old_pid)
            try:
                os.unlink(path)
            except FileNotFoundError:
                pass


def _pid_is_openhush(pid: int) -> bool:
    """Verify the process exists AND is ours before refusing/killing —
    parity with the /proc/<pid>/exe check (daemon.rs:2509-2588)."""
    try:
        with open(f"/proc/{pid}/cmdline", "rb") as f:
            cmdline = f.read().decode(errors="replace")
    except OSError:
        return False
    return "openhush" in cmdline


def remove_pid_file(path: Optional[str] = None) -> None:
    try:
        os.unlink(path or pid_file_path())
    except FileNotFoundError:
        pass


@dataclasses.dataclass
class DaemonStatus:
    running: bool
    recording: bool
    state: str
    model: str
    queue_depth: int
    model_loaded: bool = True
    version: str = __version__


class Daemon:
    """Composable daemon: inject audio source / engine server / output."""

    def __init__(self, config, server, audio_source,
                 output: Optional[Callable[[str], None]] = None,
                 ipc_path: Optional[str] = None,
                 vad_engine: Optional[vad_mod.VadEngine] = None,
                 chunk_interval: Optional[float] = None,
                 server_factory: Optional[Callable[[], object]] = None):
        self.config = config
        self.server = server
        # Rebuilds the engine server after an idle unload (parity:
        # WorkerCommand::LoadEngine/UnloadEngine dynamic device-memory
        # management, src/queue/worker.rs:18-25, daemon.rs:2181-2234).
        self._server_factory = server_factory
        # Serializes server load/unload/final-submit so an idle unload
        # can't pull the server out from under an in-flight submission
        # (never nested inside self._lock — take it first).
        self._model_lock = threading.Lock()
        self._running = False
        self._last_activity = time.monotonic()
        self.source = audio_source
        self._handler = None
        if output is None:
            # Real daemon path: clipboard/paste per [output] config with
            # [queue].separator between pasted chunks (parity:
            # OutputHandler::output, src/output/mod.rs:44); falls back
            # to stdout when no clipboard/display is available.
            from openhush_tpu.output.handlers import OutputHandler
            self._handler = OutputHandler(
                mode=config.output.mode,
                paste_method=config.output.paste_method,
                separator=getattr(config.queue, "separator", " "))
            output = self._handler.output
        self.output = output
        self._batch_outputs = 0
        self.ring = RingBuffer(duration_secs=60.0)
        self.tracker = TranscriptionTracker(streaming=True)
        self.vad_engine = vad_engine or vad_mod.create_engine(config.vad)
        self.vad_state = vad_mod.VadState(vad_mod.VadStateConfig(
            threshold=config.vad.threshold,
            min_silence_ms=config.vad.min_silence_ms,
            min_speech_ms=config.vad.min_speech_ms,
            speech_pad_ms=config.vad.pad_ms))
        self.chunk_interval = chunk_interval or (
            config.queue.chunk_interval_secs
            if config.queue.chunk_interval_secs > 0 else 5.0)

        # Post-processing pipeline (parity: process_and_output,
        # daemon.rs:459-560) — every stage degrades gracefully.
        from openhush_tpu.output.handlers import (ActionContext,
                                                  ActionRunner)
        from openhush_tpu.postproc.correction import (CorrectionConfig,
                                                      TextCorrector)
        from openhush_tpu.postproc.translation import (TranslationConfig,
                                                       Translator)
        from openhush_tpu.text.vocabulary import VocabularyManager
        self._ActionContext = ActionContext
        self.vocabulary = VocabularyManager(
            config.vocabulary.path or None,
            config.vocabulary.reload_interval_secs)
        self.corrector = None
        if config.correction.enabled:
            self.corrector = TextCorrector(CorrectionConfig(
                enabled=True, ollama_url=config.correction.ollama_url,
                model=config.correction.model,
                remove_fillers=config.correction.remove_fillers,
                filler_mode=config.correction.filler_mode,
                timeout_secs=config.correction.timeout_secs))
        self.translator = None
        if config.translation.enabled:
            try:
                self.translator = Translator(TranslationConfig(
                    enabled=True, backend=config.translation.backend,
                    target_language=config.translation.target_language,
                    ollama_url=config.translation.ollama_url,
                    ollama_model=config.translation.ollama_model))
            except Exception as e:  # noqa: BLE001
                log.warning("Translation disabled: %s", e)
        try:
            self.actions = ActionRunner.from_config_list(
                list(config.output.actions))
        except Exception as e:  # noqa: BLE001
            log.warning("Actions disabled: %s", e)
            self.actions = ActionRunner([])

        # Per-app profiles (parity: context.rs + Config::find_profile).
        from openhush_tpu.utils.context import (AppContext,
                                                profiles_from_config)
        self.app_context = AppContext(
            profiles_from_config(list(getattr(config, "profiles", []))))
        self._profile_vocab: dict[str, VocabularyManager] = {}

        # Wake word: always-on while IDLE (parity: daemon.rs:2105-2179).
        self.wake_detector = None
        self._wake_pos = 0
        if getattr(config.wake_word, "enabled", False):
            try:
                from openhush_tpu.models.wakeword import (WakeWordConfig,
                                                          WakeWordDetector)
                ww_cfg = WakeWordConfig(
                    threshold=config.wake_word.threshold,
                    model_name=config.wake_word.model)
                emb_p = getattr(config.wake_word, "embedding_path", "")
                cls_p = getattr(config.wake_word, "classifier_path", "")
                if emb_p and cls_p:
                    # converted openWakeWord ONNX stages
                    self.wake_detector = WakeWordDetector.from_onnx(
                        emb_p, cls_p, ww_cfg)
                else:
                    self.wake_detector = WakeWordDetector(ww_cfg)
            except Exception as e:  # noqa: BLE001
                log.warning("Wake word disabled: %s", e)

        self.state = DaemonState.IDLE
        self._session_id: Optional[int] = None
        self._sequence = 0
        self._chunk_id = 0
        self._chunk_mark = 0         # ring position of last submitted chunk
        self._vad_pos = 0
        self._stop_event = threading.Event()
        self._lock = threading.Lock()
        self._ipc = ipc.create_server(self._handle_ipc, path=ipc_path)
        self._results_flushed = threading.Event()

    # -- recording control (parity: daemon.rs:1274-1308) ----------------------

    def start_recording(self) -> bool:
        if not self.ensure_model():
            return False
        with self._lock:
            if self.state != DaemonState.IDLE or self.server is None:
                return False
            self.state = DaemonState.RECORDING
            self._sequence += 1
            self._chunk_id = 0
            self._chunk_mark = self.ring.current_position()
            self.tracker.reset_dedup()
            self._session_id = self.server.open_session()
            self._last_chunk_time = time.monotonic()
            self._last_activity = self._last_chunk_time
        log.info("Recording started (seq %d)", self._sequence)
        self._emit_recording_changed()
        self._feedback(started=True)
        return True

    def _feedback(self, started: bool) -> None:
        """[feedback] section parity (config.example.toml:51-57): beep +
        desktop notification on recording start/stop."""
        fb = getattr(self.config, "feedback", None)
        if fb is None:
            return
        try:
            from openhush_tpu.utils.platform_hosts import get_host_platform
            host = get_host_platform()
            if fb.audio:
                host.play_sound("start" if started else "stop")
            if fb.visual:
                host.notify("OpenHush",
                            "Recording…" if started else "Recording stopped")
        except Exception:  # noqa: BLE001 — feedback is never fatal
            pass

    def stop_recording(self) -> bool:
        with self._lock:
            if self.state == DaemonState.IDLE:
                return False
            state = self.state
            self.state = DaemonState.IDLE
        if state == DaemonState.RECORDING:
            # Under the model lock: state is already IDLE here, so an
            # idle/IPC unload could otherwise race the final submit.
            with self._model_lock:
                if self.server is not None:
                    self._submit_chunk(final=True)
        self._last_activity = time.monotonic()
        log.info("Recording stopped (seq %d)", self._sequence)
        self._emit_recording_changed()
        self._feedback(started=False)
        return True

    def toggle_recording(self) -> bool:
        if self.state == DaemonState.IDLE:
            return self.start_recording()
        return self.stop_recording()

    # -- dynamic model residency (parity: WorkerCommand::{Load,Unload}Engine
    # + the idle-unload timer, daemon.rs:1155-1173,2181-2234) ------------------

    @property
    def model_loaded(self) -> bool:
        return self.server is not None

    def ensure_model(self) -> bool:
        """Load the engine server if it was unloaded; True when usable.
        Concurrent callers (IPC load + hotkey start) build at most ONE
        server: the factory runs under the model lock, losers reuse it."""
        if self.server is not None:
            return True
        if self._server_factory is None:
            return False
        with self._model_lock:
            if self.server is not None:   # built while we waited
                return True
            log.info("Loading model on demand…")
            try:
                server = self._server_factory()
            except Exception as e:  # noqa: BLE001 — soft failure
                log.error("Model load failed: %s", e)
                return False
            with self._lock:
                self.server = server
                self._last_activity = time.monotonic()
            if self._running and hasattr(server, "start"):
                server.start()
        return True

    def unload_model(self) -> bool:
        """Free device memory while idle; reloads on the next recording.
        No-op (False) while recording or without a rebuild factory."""
        with self._model_lock:
            with self._lock:
                if (self.state != DaemonState.IDLE or self.server is None
                        or self._server_factory is None
                        or self.tracker.pending_count):
                    return False
                server, self.server = self.server, None
                self._session_id = None
            if hasattr(server, "stop"):
                try:
                    server.stop()
                except Exception:  # noqa: BLE001
                    pass
            del server
            import gc
            gc.collect()  # drop device buffers (HBM) now, not at next GC
        log.info("Model unloaded")
        return True

    def _idle_check(self, now: float) -> None:
        idle_secs = getattr(self.config.transcription,
                            "idle_unload_secs", 0)
        if (idle_secs > 0 and self.state == DaemonState.IDLE
                and self.server is not None
                and self._server_factory is not None
                and now - self._last_activity >= idle_secs):
            if self.unload_model():
                log.info("Unloaded model after %.0f s of inactivity",
                         now - self._last_activity)

    def start_continuous(self) -> bool:
        if not self.ensure_model():
            return False
        with self._lock:
            if self.state != DaemonState.IDLE or self.server is None:
                return False
            self.state = DaemonState.CONTINUOUS
            self._sequence += 1
            self._chunk_id = 0
            self._vad_pos = self.ring.current_position()
            self._vad_ring_base = self._vad_pos
            self.vad_state.reset()
            self.vad_engine.reset()
            self.tracker.reset_dedup()
            self._session_id = self.server.open_session()
        log.info("Continuous dictation started (seq %d)", self._sequence)
        self._emit_recording_changed()
        return True

    # -- chunk submission -------------------------------------------------------

    def _submit_chunk(self, final: bool = False) -> None:
        now = self.ring.current_position()
        audio = self.ring.extract_range(self._chunk_mark, now)
        self._chunk_mark = now
        min_samples = int(0.2 * 16000)
        if len(audio) < min_samples and not final:
            return
        if len(audio) < min_samples:
            audio = np.pad(audio, (0, min_samples - len(audio)))
        self._submit_audio(audio, final)

    def _submit_audio(self, audio: np.ndarray, final: bool) -> None:
        """Submit audio, splitting anything longer than the server's
        (audio_ctx-restricted) window."""
        # Snapshot: an unload on another thread nulls self.server, but a
        # local reference keeps this submission safe end-to-end.
        server, session_id = self.server, self._session_id
        if server is None or session_id is None:
            return
        max_window = getattr(server, "audio_ctx", 1500) * 2 * 160
        pieces = [audio[i:i + max_window]
                  for i in range(0, max(1, len(audio)), max_window)]
        for j, piece in enumerate(pieces):
            is_last = final and j == len(pieces) - 1
            accepted = self.tracker.add_pending(
                self._sequence, self._chunk_id,
                max_pending=self.config.queue.max_pending,
                strategy=self.config.queue.backpressure)
            if accepted:
                server.submit_window(
                    session_id, piece,
                    window_id=self._pack(self._sequence, self._chunk_id,
                                         is_last),
                    language=self.config.transcription.language,
                    task=("translate"
                          if self.config.transcription.translate
                          else "transcribe"),
                    timestamps=False)
            elif not getattr(self, "_backpressure_notified", False):
                # Desktop heads-up on drops (parity: backpressure
                # notifications via notify-rust).
                from openhush_tpu.utils.platform import notify
                notify("OpenHush", "Transcription queue full — audio "
                       "chunks are being dropped", urgency="critical")
                self._backpressure_notified = True
            self._chunk_id += 1

    @staticmethod
    def _pack(seq: int, chunk: int, final: bool) -> int:
        return (seq << 32) | (chunk << 1) | int(final)

    @staticmethod
    def _unpack(window_id: int) -> tuple[int, int, bool]:
        return window_id >> 32, (window_id & 0xFFFFFFFF) >> 1, \
            bool(window_id & 1)

    # -- main loop -----------------------------------------------------------------

    def run(self, max_runtime: Optional[float] = None,
            enable_tray: bool = True) -> None:
        write_pid_file()
        self._ipc.start()
        # System tray (StatusNotifierItem; graceful when no SNI host —
        # parity: daemon.rs:843-859 tray init warning path, gated by the
        # --no-tray flag like main.rs:57-59).
        self._tray = None
        if enable_tray:
            try:
                from openhush_tpu.ui.tray_windows import create_tray
                self._tray = create_tray()
                log.info("System tray initialized")
            except Exception as e:  # noqa: BLE001
                log.info("System tray unavailable (%s); continuing", e)
        # Global hotkey (push-to-talk / toggle by config.hotkey.mode).
        self._hotkey = None
        try:
            from openhush_tpu.runtime.hotkey_hosts import (
                create_hotkey_listener)
            mode = self.config.hotkey.mode
            if mode == "toggle":
                on_press, on_release = self.toggle_recording, lambda: None
            elif mode == "continuous":
                on_press, on_release = self.start_continuous, lambda: None
            else:  # push_to_talk
                on_press, on_release = (self.start_recording,
                                        self.stop_recording)
            hk = create_hotkey_listener(self.config.hotkey.key, on_press,
                                        on_release)
            if hk.start():
                self._hotkey = hk
                log.info("Global hotkey %s active (%s mode)",
                         self.config.hotkey.key, mode)
        except (ValueError, OSError) as e:
            log.warning("Hotkey disabled: %s", e)
        self._api = None
        if getattr(self.config.api, "enabled", False):
            from openhush_tpu.api.server import ApiServer
            self._api = ApiServer(
                host=self.config.api.host, port=self.config.api.port,
                api_key_hash=self.config.api.api_key_hash,
                cors_origins=self.config.api.cors_origins,
                status_fn=lambda: dataclasses.asdict(self.status()),
                command_fn=self._api_command)
            try:
                self._api.start()
                log.info("REST API on %s:%d", self.config.api.host,
                         self._api.port)
            except OSError as e:
                log.warning("REST API failed to start: %s", e)
                self._api = None
        # D-Bus service (Linux desktop control plane; graceful when no
        # session bus — parity: daemon.rs:877-886 D-Bus init warning path).
        self._dbus = None
        try:
            from openhush_tpu.utils.dbus import DbusService
            self._dbus = DbusService(self._handle_dbus)
            log.info("D-Bus service registered: org.openhush.Daemon1")
        except Exception as e:  # noqa: BLE001
            log.info("D-Bus unavailable (%s); socket/REST control only", e)
        self.source.start(self._on_audio)
        self._running = True
        if self.server is not None and hasattr(self.server, "start"):
            self.server.start()
        # SIGHUP → config reload (parity: daemon.rs:1240-1244,417-428);
        # SIGTERM/SIGINT → graceful stop. Only from the main thread.
        if threading.current_thread() is threading.main_thread():
            signal.signal(signal.SIGHUP, lambda *a: self.reload_config())
            signal.signal(signal.SIGTERM,
                          lambda *a: self._stop_event.set())
            signal.signal(signal.SIGINT,
                          lambda *a: self._stop_event.set())
        started = time.monotonic()
        self._last_chunk_time = started
        self._last_activity = started
        last_vad_tick = started
        last_idle_check = started
        try:
            while not self._stop_event.is_set():
                now = time.monotonic()
                if max_runtime and now - started > max_runtime:
                    break
                if now - last_idle_check >= 10.0:
                    last_idle_check = now
                    self._idle_check(now)
                if self.state == DaemonState.RECORDING and \
                        now - self._last_chunk_time >= self.chunk_interval:
                    self._submit_chunk()
                    self._last_chunk_time = now
                if self.state == DaemonState.CONTINUOUS and \
                        now - last_vad_tick >= 0.032:
                    self._vad_tick()
                    last_vad_tick = now
                if self.state == DaemonState.IDLE and \
                        self.wake_detector is not None:
                    self._wake_tick()
                self._drain_results()
                if self._tray is not None and not self._tray_tick():
                    break           # Quit picked from the tray menu
                time.sleep(0.005)
        finally:
            self.shutdown()

    def shutdown(self) -> None:
        self._stop_event.set()
        self._running = False
        try:
            self.source.stop()
        except Exception:
            pass
        if self.server is not None and hasattr(self.server, "stop"):
            self.server.stop()
        if getattr(self, "_api", None) is not None:
            self._api.stop()
        if getattr(self, "_hotkey", None) is not None:
            self._hotkey.stop()
        if getattr(self, "_dbus", None) is not None:
            self._dbus.stop()
        if getattr(self, "_tray", None) is not None:
            try:
                self._tray.stop()
            except Exception:  # noqa: BLE001
                pass
        self._ipc.stop()
        remove_pid_file()

    def _tray_tick(self) -> bool:
        """Poll tray events + refresh the status icon; False = quit
        requested (parity: daemon.rs:1251-1271)."""
        from openhush_tpu.ui.tray import TrayEvent, TrayStatus
        ev = self._tray.try_recv()
        if ev is TrayEvent.QUIT:
            log.info("Quit requested from tray")
            return False
        if ev is TrayEvent.SHOW_PREFERENCES:
            log.info("Opening preferences from tray")
            self._spawn_preferences()
        if self.state != DaemonState.IDLE:
            status = TrayStatus.RECORDING
        elif self.tracker.pending_count > 0:
            status = TrayStatus.PROCESSING
        else:
            status = TrayStatus.IDLE
        try:
            self._tray.set_status(status)
        except Exception:  # noqa: BLE001 — bus went away; keep running
            pass
        return True

    def _spawn_preferences(self) -> None:
        """Open the preferences UI as a detached subprocess (parity:
        gui::spawn_preferences, src/gui/mod.rs:52 — the reference also
        re-execs itself with a `preferences` argument)."""
        import subprocess
        import sys
        try:
            subprocess.Popen(
                [sys.executable, "-m", "openhush_tpu.cli", "preferences",
                 "--open"],
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
                start_new_session=True)
        except OSError as e:
            log.warning("could not spawn preferences UI: %s", e)

    def _handle_dbus(self, member: str):
        """org.openhush.Daemon1 methods (parity: src/dbus/interface.rs:35)."""
        if member == "StartRecording":
            return ("b", self.start_recording())
        if member == "StopRecording":
            return ("b", self.stop_recording())
        if member == "ToggleRecording":
            return ("b", self.toggle_recording())
        if member == "LoadModel":
            return ("b", self.ensure_model())
        if member == "UnloadModel":
            return ("b", (True if self._server_factory is None
                          else self.unload_model()))
        if member == "GetStatus":
            return ("s", json.dumps(dataclasses.asdict(self.status())))
        if member == "GetQueueDepth":
            return ("u", self.tracker.pending_count)
        if member == "GetVersion":
            return ("s", __version__)
        raise ValueError(f"unknown method {member!r}")

    def _emit_recording_changed(self) -> None:
        if getattr(self, "_dbus", None) is not None:
            try:
                self._dbus.emit_recording_changed(
                    self.state != DaemonState.IDLE)
            except Exception:  # noqa: BLE001
                pass

    def _api_command(self, action: str) -> bool:
        return {"start": self.start_recording,
                "stop": self.stop_recording,
                "toggle": self.toggle_recording}[action]()

    def reload_config(self) -> None:
        """Reload hot-swappable config sections (SIGHUP). Model/audio-device
        changes need a restart — same constraint as the reference."""
        from openhush_tpu.utils.config import Config
        try:
            new = Config.load_or_default()
        except Exception as e:  # noqa: BLE001
            log.warning("Config reload failed: %s", e)
            return
        errors = new.validate()
        if errors:
            log.warning("Config reload rejected: %s", "; ".join(errors))
            return
        self.config.vad = new.vad
        self.config.queue = new.queue
        self.config.output = new.output
        self.config.vocabulary = new.vocabulary
        self.config.correction = new.correction
        self.config.translation = new.translation
        self.config.transcription.language = new.transcription.language
        self.config.transcription.translate = new.transcription.translate
        if new.queue.chunk_interval_secs > 0:
            self.chunk_interval = new.queue.chunk_interval_secs
        from openhush_tpu.text.vocabulary import VocabularyManager
        self.vocabulary = VocabularyManager(
            new.vocabulary.path or None,
            new.vocabulary.reload_interval_secs)
        log.info("Configuration reloaded (SIGHUP)")

    def _on_audio(self, samples: np.ndarray) -> None:
        self.ring.push(samples)

    # -- VAD continuous mode (parity: daemon.rs:1955-2079) -------------------------

    def _vad_tick(self) -> None:
        now = self.ring.current_position()
        chunk = self.ring.extract_range(self._vad_pos, now)
        if len(chunk) < vad_mod.CHUNK_SIZE:
            return
        self._vad_pos = now
        # Feed complete 512-sample chunks through the VAD.
        for off in range(0, len(chunk) - vad_mod.CHUNK_SIZE + 1,
                         vad_mod.CHUNK_SIZE):
            result = self.vad_engine.process(
                chunk[off:off + vad_mod.CHUNK_SIZE])
            seg = self.vad_state.update(result, vad_mod.CHUNK_SIZE)
            if seg is not None:
                self._submit_vad_segment(seg, now)

    def _submit_vad_segment(self, seg, now: int) -> None:
        pad = int(self.config.vad.pad_ms / 1000 * 16000)
        # VadState positions are samples since start_continuous; the ring
        # position at that moment anchors them to absolute ring offsets.
        base = self._vad_ring_base
        start = max(base, base + seg.start - pad)
        end = min(now, base + seg.end + pad)
        audio = self.ring.extract_range(start, end)
        if len(audio) == 0:
            return
        self._submit_audio(audio, final=False)

    # -- wake word (parity: daemon.rs:2105-2179) --------------------------------------

    def _wake_tick(self) -> None:
        from openhush_tpu.models.wakeword import CHUNK_SAMPLES
        now = self.ring.current_position()
        if self._wake_pos == 0:
            self._wake_pos = max(0, now - CHUNK_SAMPLES)
        while now - self._wake_pos >= CHUNK_SAMPLES:
            chunk = self.ring.extract_range(self._wake_pos,
                                            self._wake_pos + CHUNK_SAMPLES)
            self._wake_pos += CHUNK_SAMPLES
            score = self.wake_detector.process(chunk)
            if self.wake_detector.detected(score):
                log.info("Wake word detected (score %.2f) — starting "
                         "continuous dictation", score)
                from openhush_tpu.utils.platform_hosts import (
                    get_host_platform)
                host = get_host_platform()
                host.play_sound("start")   # audible cue (parity: beep)
                host.notify("OpenHush", "Listening…")
                self.start_continuous()
                return

    # -- results → output -----------------------------------------------------------

    def _drain_results(self) -> None:
        # Snapshot against a concurrent unload (poll on a stopped server
        # only reads host-side queues, so a stale local ref is safe).
        server, session_id = self.server, self._session_id
        if session_id is None or server is None:
            return
        while True:
            res = server.poll(session_id)
            if res is None:
                break
            self._last_activity = time.monotonic()
            seq, chunk, final = self._unpack(res.window_id)
            self.tracker.add_result(ChunkResult(
                text=res.text.strip(), sequence_id=seq, chunk_id=chunk,
                is_final=final, duration_secs=0.0))
        self._batch_outputs = 0
        for ready in self.tracker.take_ready():
            if ready.text:
                self._process_and_output(ready)

    def _process_and_output(self, ready: ChunkResult) -> None:
        """vocab → LLM correction → translation → output + actions
        (parity: process_and_output, daemon.rs:459-560), with per-app
        profile overrides for vocabulary/filler level."""
        profile = (self.app_context.refresh()
                   if self.app_context.profiles else None)
        vocab = self.vocabulary
        if profile is not None and profile.vocabulary_path:
            from openhush_tpu.text.vocabulary import VocabularyManager
            vocab = self._profile_vocab.setdefault(
                profile.vocabulary_path,
                VocabularyManager(profile.vocabulary_path))
        vocab.check_reload()
        text = vocab.apply(ready.text)
        if self.corrector is not None:
            if profile is not None and profile.filler_mode:
                import dataclasses as _dc
                old = self.corrector.config
                self.corrector.config = _dc.replace(
                    old, filler_mode=profile.filler_mode)
                try:
                    text = self.corrector.correct(text)
                finally:
                    self.corrector.config = old
            else:
                text = self.corrector.correct(text)
        if self.translator is not None:
            pieces = self.translator.add_chunk(text)
            if ready.is_final:
                rest = self.translator.flush()
                if rest:
                    pieces.append(rest)
            texts = pieces
        else:
            texts = [text]
        for out_text in texts:
            if not out_text:
                continue
            if self._handler is not None:
                self._handler.output(out_text,
                                     continuation=self._batch_outputs > 0)
            else:
                self.output(out_text)
            self._batch_outputs += 1
            self.actions.run_all(self._ActionContext(
                text=out_text, duration_secs=ready.duration_secs,
                model=self.config.transcription.effective_model(),
                seq_id=ready.sequence_id))

    # -- IPC (wire parity: src/ipc/mod.rs:41-110) -------------------------------------

    def status(self) -> DaemonStatus:
        return DaemonStatus(
            running=True,
            recording=self.state != DaemonState.IDLE,
            state=self.state.value,
            model=self.config.transcription.effective_model(),
            queue_depth=self.tracker.pending_count,
            model_loaded=self.model_loaded)

    def _handle_ipc(self, request: dict) -> dict:
        cmd = request.get("cmd", "")
        if cmd == "status":
            s = self.status()
            return {"ok": True, "running": True, "recording": s.recording,
                    "model_loaded": self.model_loaded,
                    "version": s.version,
                    "state": s.state, "queue_depth": s.queue_depth}
        if cmd == "stop":
            self._stop_event.set()
            return {"ok": True}
        if cmd == "start_recording":
            return {"ok": self.start_recording()}
        if cmd == "stop_recording":
            return {"ok": self.stop_recording()}
        if cmd == "toggle_recording":
            return {"ok": self.toggle_recording()}
        if cmd == "start_continuous":
            return {"ok": self.start_continuous()}
        if cmd == "queue_depth":
            return {"ok": True, "queue_depth": self.tracker.pending_count}
        if cmd == "version":
            return {"ok": True, "version": __version__}
        if cmd == "load_model":
            return {"ok": self.ensure_model()}
        if cmd == "unload_model":
            # Without a rebuild factory (embedded/test daemons) the model
            # must stay resident: report ok=True, loaded stays True.
            if self._server_factory is None:
                return {"ok": True}
            return {"ok": self.unload_model()}
        if cmd == "reload":
            self.reload_config()
            return {"ok": True}
        return {"ok": False, "error": f"unknown command {cmd!r}"}


# ---------------------------------------------------------------------------
# CLI entry points (dispatched from daemon_cli)
# ---------------------------------------------------------------------------

def build_preprocess(audio_cfg):
    """Per-window preprocess (parity: worker preprocess order denoise →
    normalize → compress → limit, src/queue/worker.rs:196-240). Uses the
    native C++ DSP when available, lax.scan otherwise; denoise keeps a
    streaming noise-floor state across windows."""
    import numpy as np

    from openhush_tpu.ops import denoise as dn
    from openhush_tpu.ops import dsp
    from openhush_tpu.utils import native

    state = {"dn": None}

    def preprocess(audio: "np.ndarray") -> "np.ndarray":
        y = np.asarray(audio, np.float32)
        if audio_cfg.noise_reduction_enabled:
            y, state["dn"] = dn.denoise(
                y, strength=audio_cfg.noise_reduction_strength,
                state=state["dn"])
        if audio_cfg.normalization_enabled:
            y = np.asarray(dsp.normalize_rms(
                y, audio_cfg.normalization_target_db))
        if audio_cfg.compression_enabled:
            nat = native.compress(
                y, audio_cfg.compression_threshold_db,
                audio_cfg.compression_ratio,
                audio_cfg.compression_attack_ms,
                audio_cfg.compression_release_ms,
                audio_cfg.compression_makeup_gain_db)
            y = nat if nat is not None else np.asarray(dsp.compress(
                y, audio_cfg.compression_threshold_db,
                audio_cfg.compression_ratio,
                audio_cfg.compression_attack_ms,
                audio_cfg.compression_release_ms,
                audio_cfg.compression_makeup_gain_db))
        if audio_cfg.limiter_enabled:
            nat = native.limit(y, audio_cfg.limiter_ceiling_db,
                               audio_cfg.limiter_release_ms)
            y = nat if nat is not None else np.asarray(dsp.limit(
                y, audio_cfg.limiter_ceiling_db,
                audio_cfg.limiter_release_ms))
        return y

    return preprocess


def _build_daemon(foreground: bool = True) -> Daemon:
    import jax.numpy as jnp

    from openhush_tpu.audio.capture import NullSource, SoundDeviceSource
    from openhush_tpu.models.whisper import model as whisper
    from openhush_tpu.models.whisper.config import get_config
    from openhush_tpu.runtime.engine import WhisperEngine, default_model_dir
    from openhush_tpu.runtime.server import EngineServer
    from openhush_tpu.utils.config import Config

    config = Config.load_or_default()
    model = config.transcription.effective_model()
    allow_random = os.environ.get("OPENHUSH_ALLOW_RANDOM_INIT") == "1"
    eng = WhisperEngine(model, language=config.transcription.language,
                        allow_random_init=allow_random,
                        draft_model=config.transcription.draft_model
                        or None)
    # Streaming chunk interval: configured value, or auto-tuned from a
    # measured 2 s-silence transcription (parity: WhisperEngine::benchmark
    # overhead × (1 + chunk_safety_margin), src/engine/whisper.rs:329-382).
    # Random-init dev mode skips the measurement (fixed 5 s) — it would
    # time an untrained model just to slow test startup.
    if config.queue.chunk_interval_secs > 0:
        chunk_secs = config.queue.chunk_interval_secs
    elif getattr(eng, "random_init", False):
        chunk_secs = 5.0
    else:
        chunk_secs = eng.benchmark_chunk_interval(
            margin=getattr(config.queue, "chunk_safety_margin", 0.2))
        log.info("Auto-tuned chunk interval: %.2f s", chunk_secs)
    # Size the encoder context to the streaming chunk length (whisper.cpp
    # audio_ctx knob): ~50 positions/s with headroom, 64-aligned. VAD
    # segments longer than the window are split at submission.
    audio_ctx = min(1500, max(256, int(-(-chunk_secs * 50 * 2 // 64)) * 64))
    preprocess = build_preprocess(config.audio)

    first_engine = [eng]

    def make_server():
        """Builds (or rebuilds, after an idle unload) the engine server.
        The first call reuses the engine loaded above; later calls reload
        the checkpoint from disk."""
        e = first_engine.pop() if first_engine else WhisperEngine(
            model, language=config.transcription.language,
            allow_random_init=allow_random,
            draft_model=config.transcription.draft_model or None)
        # Random-init dev mode: neutralize the quality-fallback ladder —
        # untrained logits sit at avg_logprob ~ -log(V) and would send
        # every window through all ladder temperatures.
        guards = ({} if not getattr(e, "random_init", False)
                  else dict(temperatures=(0.0,), logprob_threshold=-1e9,
                            no_speech_threshold=2.0))
        server = EngineServer(e.cfg, e.params, tokenizer=e.tokenizer,
                              audio_ctx=audio_ctx, max_decode_len=256,
                              preprocess=preprocess, **guards)
        if config.transcription.warmup_on_load:
            # Compile every admission bucket before live traffic: a cold
            # bucket compile otherwise lands in some user's first-partial
            # latency (measured 24 s through the dev tunnel).
            t0 = time.monotonic()
            server.warmup()
            log.info("Admission shapes warmed in %.1f s",
                     time.monotonic() - t0)
        return server

    server = make_server()
    try:
        source = SoundDeviceSource(device=config.audio.device or None,
                                   channels=config.audio.channels or None)
    except Exception as e:
        log.warning("No audio capture available (%s); using silence", e)
        source = NullSource()
    return Daemon(config, server, source, chunk_interval=chunk_secs,
                  server_factory=make_server)


def cmd_start(args: list[str]) -> int:
    logging.basicConfig(level=logging.INFO)
    # --no-tray disables the SNI tray icon (parity: main.rs:57-59).
    enable_tray = "--no-tray" not in args
    try:
        daemon = _build_daemon()
    except FileNotFoundError as e:
        print(str(e), file=sys.stderr)
        return 1
    try:
        daemon.run(enable_tray=enable_tray)
    except RuntimeError as e:
        print(str(e), file=sys.stderr)
        return 1
    return 0


def cmd_stop(args: list[str]) -> int:
    try:
        resp = ipc.IpcClient().send("stop")
    except (ConnectionError, OSError):
        print("Daemon not running", file=sys.stderr)
        return 1
    print("Daemon stopping" if resp.get("ok") else "Failed to stop daemon")
    return 0 if resp.get("ok") else 1


def cmd_status(args: list[str]) -> int:
    try:
        resp = ipc.IpcClient().send("status")
    except (ConnectionError, OSError):
        print("Daemon: not running")
        return 1
    print(f"Daemon: running (v{resp.get('version', '?')})")
    print(f"State: {resp.get('state', '?')}")
    print(f"Recording: {resp.get('recording', False)}")
    print(f"Queue depth: {resp.get('queue_depth', 0)}")
    return 0


def cmd_recording(args: list[str]) -> int:
    action = args[0] if args else "toggle"
    cmd = {"start": "start_recording", "stop": "stop_recording",
           "toggle": "toggle_recording",
           "continuous": "start_continuous"}.get(action)
    if cmd is None:
        print(f"unknown recording action {action!r} "
              f"(use start|stop|toggle|continuous)", file=sys.stderr)
        return 2
    try:
        resp = ipc.IpcClient().send(cmd)
    except (ConnectionError, OSError):
        print("Daemon not running", file=sys.stderr)
        return 1
    print("ok" if resp.get("ok") else f"failed: {resp.get('error', '')}")
    return 0 if resp.get("ok") else 1


def cmd_record(args: list[str]) -> int:
    from openhush_tpu.runtime.recording import cmd_record as run
    return run(args)


def cmd_summarize(args: list[str]) -> int:
    """openhush summarize [FILE] [--template NAME] — summarize a transcript
    (stdin if no file). Parity: Commands::Summarize (src/main.rs)."""
    from openhush_tpu.postproc.summarization import (OllamaProvider,
                                                     OpenAiCompatProvider,
                                                     Summarizer,
                                                     TemplateRegistry)
    from openhush_tpu.utils.config import Config

    config = Config.load_or_default()
    template = config.summarization.default_template or "summary"
    path = None
    it = iter(args)
    for a in it:
        if a in ("--template", "-t"):
            template = next(it, "summary")
        elif a == "--list-templates":
            reg = TemplateRegistry(config.summarization.templates_path
                                   or None)
            print("\n".join(reg.names()))
            return 0
        elif not a.startswith("-"):
            path = a
    if path:
        try:
            with open(path) as f:
                transcript = f.read()
        except OSError as e:
            print(f"Cannot read {path}: {e}", file=sys.stderr)
            return 1
    else:
        transcript = sys.stdin.read()
    if not transcript.strip():
        print("Empty transcript", file=sys.stderr)
        return 1
    sc = config.summarization
    if sc.provider == "openai":
        from openhush_tpu.utils.secrets import resolve_secret
        provider = OpenAiCompatProvider(url=sc.openai_url,
                                        model=sc.openai_model,
                                        api_key=resolve_secret(sc.api_key),
                                        timeout_secs=sc.openai_timeout_secs)
    else:
        provider = OllamaProvider(url=sc.ollama_url, model=sc.model,
                                  timeout_secs=sc.ollama_timeout_secs)
    if not provider.is_available():
        print(f"Summarization provider '{sc.provider}' is not available",
              file=sys.stderr)
        return 1
    reg = TemplateRegistry(sc.templates_path or None)
    try:
        summary = Summarizer(provider, reg).summarize(transcript, template)
    except Exception as e:  # noqa: BLE001
        print(f"Summarization failed: {e}", file=sys.stderr)
        return 1
    print(summary)
    return 0


def cmd_config(args: list[str]) -> int:
    """openhush config [show|path|validate|get KEY|set KEY VALUE]
    (parity: Config CLI mutation, src/config.rs:1419)."""
    from openhush_tpu.utils.config import Config, config_path, dumps_toml

    action = args[0] if args else "show"
    cfg = Config.load_or_default()
    if action == "show":
        print(dumps_toml(cfg.to_dict()), end="")
        return 0
    if action == "path":
        print(config_path())
        return 0
    if action == "validate":
        errors = cfg.validate()
        if errors:
            for e in errors:
                print(f"error: {e}", file=sys.stderr)
            return 1
        print("Configuration is valid")
        return 0
    if action == "get" and len(args) >= 2:
        section, _, key = args[1].partition(".")
        node = cfg.to_dict().get(section, {})
        value = node.get(key) if key else node
        if value is None:
            print(f"unknown key {args[1]!r}", file=sys.stderr)
            return 1
        print(value if not isinstance(value, dict)
              else json.dumps(value, indent=2))
        return 0
    if action == "set" and len(args) >= 3:
        section, _, key = args[1].partition(".")
        raw = args[2]
        target = getattr(cfg, section, None)
        if target is None or not hasattr(target, key):
            print(f"unknown key {args[1]!r}", file=sys.stderr)
            return 1
        current = getattr(target, key)
        try:
            if isinstance(current, bool):
                value = raw.lower() in ("1", "true", "yes", "on")
            elif isinstance(current, int):
                value = int(raw)
            elif isinstance(current, float):
                value = float(raw)
            elif isinstance(current, list):
                value = json.loads(raw)
            else:
                value = raw
        except (ValueError, json.JSONDecodeError) as e:
            print(f"invalid value: {e}", file=sys.stderr)
            return 1
        setattr(target, key, value)
        errors = cfg.validate()
        if errors:
            for e in errors:
                print(f"error: {e}", file=sys.stderr)
            return 1
        cfg.save()
        print(f"{args[1]} = {value}")
        return 0
    print("usage: openhush config [show|path|validate|get KEY|"
          "set KEY VALUE]", file=sys.stderr)
    return 2


def cmd_evaluate(args: list[str]) -> int:
    """openhush evaluate --dataset DIR [--model M] [--limit N] — WER on a
    LibriSpeech-layout dataset (the north-star quality gate); or
    `evaluate --diarization [--meetings N]` — DER/JER on synthetic
    meetings (utils/der.py, no network needed)."""
    import argparse

    from openhush_tpu.runtime.engine import WhisperEngine
    from openhush_tpu.utils.wer import evaluate_librispeech

    p = argparse.ArgumentParser(prog="openhush evaluate")
    p.add_argument("--dataset", default=None)
    p.add_argument("--model", "-m", default="large-v3")
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--beam-size", type=int, default=None)
    p.add_argument("--diarization", action="store_true")
    p.add_argument("--meetings", type=int, default=5)
    p.add_argument("--seed", type=int, default=0)
    ns = p.parse_args(args)
    if ns.diarization:
        from openhush_tpu.utils.der import evaluate_synthetic_meetings
        r = evaluate_synthetic_meetings(n_meetings=ns.meetings,
                                        seed=ns.seed, progress=True)
        print(json.dumps({
            "der": round(r.der, 4), "jer": round(r.jer, 4),
            "missed": round(r.missed, 4),
            "false_alarm": round(r.false_alarm, 4),
            "confusion": round(r.confusion, 4),
            "ref_speech_secs": round(r.ref_speech_secs, 1),
            "meetings": ns.meetings,
        }))
        return 0
    if not ns.dataset:
        print("evaluate: --dataset DIR or --diarization required",
              file=sys.stderr)
        return 1
    if not os.path.isdir(ns.dataset):
        print(f"Dataset directory not found: {ns.dataset}", file=sys.stderr)
        return 1
    try:
        engine = WhisperEngine(ns.model)
    except FileNotFoundError as e:
        print(e, file=sys.stderr)
        return 1
    result = evaluate_librispeech(engine, ns.dataset, limit=ns.limit)
    print(json.dumps({
        "wer": round(result.wer, 4),
        "substitutions": result.substitutions,
        "deletions": result.deletions,
        "insertions": result.insertions,
        "n_ref_words": result.n_ref_words,
        "model": ns.model,
    }))
    return 0


def cmd_secret(args: list[str]) -> int:
    """openhush secret set|get|list|delete|check NAME [VALUE]
    (parity: src/secrets.rs:163-216)."""
    from openhush_tpu.utils.secrets import default_store

    store = default_store()
    action = args[0] if args else "list"
    if action == "list":
        names = store.list()
        print("\n".join(names) if names
              else f"(no secrets in {store.backend} store)")
        return 0
    if action == "check":
        print(f"Secret backend: {store.backend}")
        return 0
    if len(args) < 2:
        print("usage: openhush secret set|get|delete NAME [VALUE]",
              file=sys.stderr)
        return 2
    name = args[1]
    if action == "set":
        if len(args) >= 3:
            value = args[2]
        else:
            import getpass
            value = getpass.getpass(f"Value for {name!r}: ")
        store.set(name, value)
        print(f"Stored {name!r} ({store.backend})")
        return 0
    if action in ("get", "show"):
        value = store.get(name)
        if value is None:
            print(f"Secret {name!r} not found", file=sys.stderr)
            return 1
        print(value)
        return 0
    if action == "delete":
        ok = store.delete(name)
        print("Deleted" if ok else f"Secret {name!r} not found")
        return 0 if ok else 1
    print(f"unknown secret action {action!r}", file=sys.stderr)
    return 2


def cmd_api_key(args: list[str]) -> int:
    """openhush api-key generate|set|clear — manage the REST API key
    (stores only the SHA-256 hash in config, parity: api.rs auth)."""
    from openhush_tpu.api.server import hash_api_key
    from openhush_tpu.utils.config import Config

    cfg = Config.load_or_default()
    action = args[0] if args else "generate"
    if action == "generate":
        import secrets as pysecrets
        key = pysecrets.token_urlsafe(32)
        cfg.api.api_key_hash = hash_api_key(key)
        cfg.save()
        print(f"API key (save this; only its hash is stored):\n{key}")
        return 0
    if action == "set" and len(args) >= 2:
        cfg.api.api_key_hash = hash_api_key(args[1])
        cfg.save()
        print("API key hash updated")
        return 0
    if action == "clear":
        cfg.api.api_key_hash = ""
        cfg.save()
        print("API key cleared (API now open)")
        return 0
    print("usage: openhush api-key generate|set KEY|clear",
          file=sys.stderr)
    return 2


def cmd_service(args: list[str]) -> int:
    """openhush service install|uninstall|status (parity: src/service/)."""
    from openhush_tpu.utils import service

    action = args[0] if args else "status"
    if action == "install":
        path = service.install()
        print(f"Installed service: {path}")
        return 0
    if action == "uninstall":
        ok = service.uninstall()
        print("Uninstalled" if ok else "Not installed")
        return 0
    if action == "status":
        st = service.status()
        print(f"Installed: {st['installed']}")
        if "enabled" in st:
            print(f"Enabled: {st['enabled']}")
        print(f"Path: {st['path']}")
        return 0
    print(f"unknown service action {action!r}", file=sys.stderr)
    return 2


def _serve_ui(page: str, open_browser: bool = True) -> int:
    """Run the web preferences/wizard UI until interrupted."""
    from openhush_tpu.ui.web import PrefsServer

    ui = PrefsServer()
    ui.start()
    url = ui.url(page)
    print(f"OpenHush UI: {url}")
    if open_browser:
        import webbrowser
        try:
            webbrowser.open(url)
        except Exception:  # noqa: BLE001 — headless session
            pass
    try:
        while True:
            time.sleep(0.5)
    except KeyboardInterrupt:
        pass
    finally:
        ui.stop()
    return 0


def cmd_setup(args: list[str]) -> int:
    """openhush setup — first-run wizard: pick a model by hardware, set the
    hotkey, test the mic, write config (CLI equivalent of the reference's
    egui wizard, src/gui/wizard.rs: model pick / hotkey / mic test /
    daemon start). --web serves the browser wizard instead."""
    if "--web" in args:
        return _serve_ui("/wizard", open_browser="--no-browser" not in args)
    from openhush_tpu.models.whisper.config import CONFIGS
    from openhush_tpu.runtime.engine import default_model_dir
    from openhush_tpu.utils.config import Config, config_path

    cfg = Config.load_or_default()
    non_interactive = "--defaults" in args
    print("OpenHush setup\n==============")

    # 1. Model choice (by what's converted locally + TPU presence).
    import jax
    on_tpu = any(d.platform == "tpu" for d in jax.devices())
    have = [n for n in CONFIGS if n != "test" and os.path.exists(
        os.path.join(default_model_dir(), f"{n}.npz"))]
    default_model = ("large-v3" if on_tpu else "base") \
        if not have else have[-1]
    def ask(prompt: str, default: str = "") -> str:
        if non_interactive:
            return default
        try:
            return input(prompt).strip() or default
        except EOFError:
            return default

    available = ", ".join(n for n in CONFIGS if n != "test")
    model = ask(f"Model [{default_model}] (available: {available}): ",
                default_model)
    if model not in CONFIGS or model == "test":
        print(f"unknown model {model!r}", file=sys.stderr)
        return 1
    cfg.transcription.model = model
    cfg.transcription.preset = "custom"

    # 2. Hotkey.
    key = ask(f"Push-to-talk hotkey [{cfg.hotkey.key}]: ")
    if key:
        from openhush_tpu.runtime.hotkey import parse_key
        try:
            parse_key(key)
            cfg.hotkey.key = key
        except ValueError as e:
            print(f"warning: {e}; keeping {cfg.hotkey.key}")

    # 3. Mic test (levels for 2 s when capture is available).
    try:
        from openhush_tpu.audio.capture import SoundDeviceSource
        import numpy as np
        import time as _t
        levels = []
        src = SoundDeviceSource()
        src.start(lambda s: levels.append(float(np.sqrt(np.mean(s ** 2)))))
        _t.sleep(2.0)
        src.stop()
        if levels:
            print(f"Mic OK (peak RMS {max(levels):.4f})")
    except Exception as e:  # noqa: BLE001
        print(f"Mic test skipped ({e})")

    cfg.save()
    print(f"Config written to {config_path()}")
    if os.path.exists(os.path.join(default_model_dir(), f"{model}.npz")):
        print("Run: openhush start")
    else:
        print(f"Next: convert the model —\n  python -m openhush_tpu.cli "
              f"model convert {model} --hf-path /path/to/hf_checkpoint")
    return 0


def cmd_preferences(args: list[str]) -> int:
    """openhush preferences — web preferences UI with --open/--web
    (counterpart of the egui preferences window, src/gui/mod.rs), or
    config.toml in $EDITOR otherwise."""
    import subprocess

    from openhush_tpu.utils.config import Config, config_path

    if "--open" in args or "--web" in args:
        return _serve_ui("/", open_browser="--no-browser" not in args)
    path = config_path()
    if not os.path.exists(path):
        Config().save(path)
    editor = os.environ.get("EDITOR", os.environ.get("VISUAL", ""))
    if not editor:
        print(path)
        print("Set $EDITOR to edit preferences interactively",
              file=sys.stderr)
        return 0
    subprocess.run([editor, path])
    errors = Config.load_or_default(path).validate()
    if errors:
        for e in errors:
            print(f"warning: {e}", file=sys.stderr)
        return 1
    print("Configuration valid")
    return 0


def cmd_device(args: list[str]) -> int:
    """openhush device [list [--format json] | set NAME | channels SEL]
    (parity: DeviceAction::List/Set/Channels, src/main.rs:324-343)."""
    from openhush_tpu.audio.capture import SoundDeviceSource
    from openhush_tpu.utils.config import Config

    action = args[0] if args and not args[0].startswith("-") else "list"
    rest = args[1:] if args and args[0] == action else args

    if action == "set":
        if not rest:
            print("usage: openhush device set NAME", file=sys.stderr)
            return 2
        cfg = Config.load_or_default()
        cfg.audio.device = rest[0]
        cfg.save()
        print(f"Input device set to {rest[0]!r}")
        return 0
    if action == "channels":
        if not rest:
            print("usage: openhush device channels all|0,1,...",
                  file=sys.stderr)
            return 2
        cfg = Config.load_or_default()
        sel = rest[0]
        try:
            cfg.audio.channels = ([] if sel == "all" else
                                  [int(c) for c in sel.split(",") if c])
        except ValueError:
            print(f"bad channel selection {sel!r} (use \"all\" or "
                  f"comma-separated indices)", file=sys.stderr)
            return 2
        cfg.save()
        print(f"Channel selection: {sel}")
        return 0

    devices = SoundDeviceSource.list_devices()
    as_json = "--format" in rest and "json" in rest or "-f" in rest \
        and "json" in rest
    if as_json:
        rows = [{"id": i, "name": d.get("name", "?"),
                 "channels": d.get("max_input_channels", 0),
                 "sample_rate": d.get("default_samplerate", 0)}
                for i, d in enumerate(devices)
                if d.get("max_input_channels", 0) > 0]
        print(json.dumps(rows))
        return 0
    if not devices:
        print("No audio devices found (sounddevice not installed or no "
              "hardware)")
        return 0
    for i, d in enumerate(devices):
        kind = "in" if d.get("max_input_channels", 0) > 0 else "out"
        print(f"  [{i}] {d.get('name', '?')} ({kind}, "
              f"{d.get('default_samplerate', 0):.0f} Hz)")
    return 0
