"""Hotkey parsing/chord logic + mixed audio source + setup CLI."""

import os
import struct
import subprocess
import sys
import threading
import time

import numpy as np
import pytest

from openhush_tpu.audio.system_audio import MixedSource, list_monitor_sources
from openhush_tpu.runtime import hotkey as hk


# ---------- hotkey parsing ----------

def test_parse_simple_keys():
    assert hk.parse_key("F9").key_code == 67
    assert hk.parse_key("f1").key_code == 59
    assert hk.parse_key("f12").key_code == 88
    assert hk.parse_key("space").key_code == 57
    assert hk.parse_key("a").key_code == 30


def test_parse_chords():
    spec = hk.parse_key("ctrl+alt+space")
    assert spec.key_code == 57
    assert len(spec.modifiers) == 2
    assert (29, 97) in spec.modifiers      # either ctrl
    assert (56, 100) in spec.modifiers     # either alt


def test_parse_rejects_garbage():
    with pytest.raises(ValueError, match="unknown key"):
        hk.parse_key("notakey")
    with pytest.raises(ValueError, match="unknown modifier"):
        hk.parse_key("hyper+a")
    with pytest.raises(ValueError):
        hk.parse_key("")


def test_chord_state_machine(tmp_path):
    """Feed synthetic input_event bytes through a FIFO-backed listener."""
    events = []
    listener = hk.HotkeyListener("ctrl+f9",
                                 on_press=lambda: events.append("press"),
                                 on_release=lambda: events.append("release"),
                                 device_glob=str(tmp_path / "none*"))
    # Drive the key handler directly (the device layer is OS-specific).
    listener._on_key(29, 1)           # ctrl down
    listener._on_key(67, 1)           # F9 down → press
    listener._on_key(67, 2)           # autorepeat ignored
    listener._on_key(67, 0)           # F9 up → release
    listener._on_key(29, 0)
    assert events == ["press", "release"]
    # Without modifier: no trigger.
    listener._on_key(67, 1)
    listener._on_key(67, 0)
    assert events == ["press", "release"]


def test_listener_degrades_without_devices(tmp_path):
    listener = hk.HotkeyListener("f9", lambda: None, lambda: None,
                                 device_glob=str(tmp_path / "nope*"))
    assert listener.start() is False
    listener.stop()


# ---------- system audio ----------

def test_list_monitor_sources_no_crash():
    assert isinstance(list_monitor_sources(), list)


class _StubSource:
    def __init__(self, blocks):
        self.blocks = blocks
        self._cb = None

    def start(self, cb):
        self._cb = cb
        for b in self.blocks:
            cb(b)

    def stop(self):
        pass


def test_mixed_source_sums_aligned():
    a = _StubSource([np.ones(100, np.float32),
                     np.ones(50, np.float32) * 3])
    b = _StubSource([np.ones(150, np.float32) * 2])
    out = []
    mixed = MixedSource(a, b)
    mixed.start(out.append)
    mixed.stop()
    got = np.concatenate(out)
    assert len(got) == 150
    np.testing.assert_allclose(got[:100], 1.5)   # (1+2)/2
    np.testing.assert_allclose(got[100:], 2.5)   # (3+2)/2


# ---------- setup wizard ----------

def test_setup_defaults(tmp_path):
    env = dict(os.environ)
    REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)   # the axon sitecustomize
    # force-registers the TPU tunnel when this is set, overriding
    # JAX_PLATFORMS=cpu — subprocess tests must really run on CPU
    env["HOME"] = str(tmp_path)
    env["XDG_CONFIG_HOME"] = str(tmp_path / ".config")
    env["XDG_DATA_HOME"] = str(tmp_path / ".local")
    env["OPENHUSH_CONFIG"] = str(tmp_path / "config.toml")
    r = subprocess.run(
        [sys.executable, "-m", "openhush_tpu.cli", "setup"],
        capture_output=True, text=True, timeout=120, env=env,
        input="")
    # Non-interactive-ish: EOF on prompts; still must not crash with
    # --defaults.
    r = subprocess.run(
        [sys.executable, "-m", "openhush_tpu.cli", "setup", "--defaults"],
        capture_output=True, text=True, timeout=120, env=env)
    assert r.returncode == 0, r.stderr
    assert os.path.exists(env["OPENHUSH_CONFIG"])
    assert "Config written" in r.stdout


def test_capture_watchdog_reinit():
    from openhush_tpu.audio.capture import CaptureWatchdog
    calls = []
    wd = CaptureWatchdog(lambda: calls.append(1), timeout_secs=0.15,
                         poll_secs=0.05)
    wd.start()
    try:
        # Heartbeats keep it quiet.
        for _ in range(6):
            wd.heartbeat()
            time.sleep(0.05)
        assert calls == []
        # Silence triggers reinit (possibly repeatedly).
        time.sleep(0.5)
        assert wd.reinit_count >= 1
    finally:
        wd.stop()


def test_capture_watchdog_survives_reinit_failure():
    from openhush_tpu.audio.capture import CaptureWatchdog

    def boom():
        raise RuntimeError("no device")

    wd = CaptureWatchdog(boom, timeout_secs=0.1, poll_secs=0.05)
    wd.start()
    try:
        time.sleep(0.4)
        assert wd.reinit_count >= 1   # kept trying, didn't die
    finally:
        wd.stop()
