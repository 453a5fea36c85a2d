"""Cross-OS host backends: command plans, chord engine, loopback capture.

These exercise the protocol-testable halves of the Windows/macOS
surfaces (parity scope: src/platform/{macos,windows}.rs,
src/input/hotkey.rs, src/input/system_audio_{windows,macos}.rs) on a
Linux host — argv construction, escaping, keycode tables, edge logic,
device ranking, streaming resampling — with the OS boundary mocked.
"""

import ctypes

import numpy as np
import pytest

from openhush_tpu.audio import system_audio_hosts as sah
from openhush_tpu.runtime import hotkey_hosts as hh
from openhush_tpu.runtime.hotkey import KEY_CODES
from openhush_tpu.utils import platform_hosts as ph


# ---------------------------------------------------------------------------
# platform_hosts: quoting + command plans
# ---------------------------------------------------------------------------

def test_osa_quote_escapes():
    assert ph.osa_quote('say "hi" \\ done') == '"say \\"hi\\" \\\\ done"'


def test_ps_quote_escapes():
    assert ph.ps_quote("it's") == "'it''s'"


def test_macos_notify_argv():
    argv = ph.macos_notify_argv("Recording", 'line "two"')
    assert argv[0] == "osascript" and argv[1] == "-e"
    assert 'display notification "line \\"two\\""' in argv[2]
    assert '"OpenHush"' in argv[2]


def test_macos_sounds_match_reference():
    # macos.rs:222-240: Tink on start, Pop on stop.
    assert ph.macos_sound_argv("start")[1].endswith("Tink.aiff")
    assert ph.macos_sound_argv("stop")[1].endswith("Pop.aiff")
    assert ph.macos_sound_argv("nope") is None


def test_windows_sounds_match_reference():
    # windows.rs:115-140: Asterisk on start, Beep on stop.
    assert "Asterisk" in ph.windows_sound_argv("start")[-1]
    assert "Beep" in ph.windows_sound_argv("stop")[-1]
    assert ph.windows_sound_argv("nope") is None


def test_windows_notify_argv_quoting():
    argv = ph.windows_notify_argv("Title", "it's done")
    assert argv[:2] == ["powershell", "-NoProfile"]
    assert "'it''s done'" in argv[-1]
    assert "ShowBalloonTip" in argv[-1]


def test_ctrl_v_sequence_order():
    seq = ph.ctrl_v_key_sequence()
    assert seq[0] == (ph.VK_CONTROL, 0)
    assert seq[1] == (ph.VK_V, 0)
    assert seq[2] == (ph.VK_V, ph.KEYEVENTF_KEYUP)
    assert seq[3] == (ph.VK_CONTROL, ph.KEYEVENTF_KEYUP)


def test_win32_input_struct_layout():
    # KEYBDINPUT: 2+2+4+4+ptr — ctypes lays Win32 structs out the same
    # on any OS, so layout is checkable here.
    assert ctypes.sizeof(ph.KEYBDINPUT) == (12 + ctypes.sizeof(
        ctypes.c_size_t) + 3) // 4 * 4 + (
        0 if ctypes.sizeof(ctypes.c_size_t) == 4 else 4)
    inp = ph.INPUT()
    inp.type = ph.INPUT_KEYBOARD
    inp.u.ki = ph.KEYBDINPUT(0x56, 0, 2, 0, 0)
    assert inp.u.ki.wVk == 0x56 and inp.u.ki.dwFlags == 2


def test_get_host_platform_dispatch():
    assert isinstance(ph.get_host_platform("linux"), ph.LinuxPlatform)
    assert isinstance(ph.get_host_platform("darwin"), ph.MacOSPlatform)
    assert isinstance(ph.get_host_platform("macos"), ph.MacOSPlatform)
    assert isinstance(ph.get_host_platform("win32"), ph.WindowsPlatform)


def test_macos_platform_runs_plans(monkeypatch):
    calls = []
    monkeypatch.setattr(ph, "_run",
                        lambda argv, **kw: calls.append(argv) or True)
    monkeypatch.setattr(ph.shutil, "which", lambda name: f"/usr/bin/{name}")
    mac = ph.MacOSPlatform()
    assert mac.notify("Hi", "body")
    assert calls[-1][0] == "osascript"
    assert mac.copy_to_clipboard("text")
    assert calls[-1] == ["pbcopy"]
    assert mac.paste_text("text", method="ctrl_v")
    assert "keystroke" in calls[-1][2] and "command down" in calls[-1][2]
    assert mac.display_server() == "macos" and not mac.is_tty()


def test_macos_accessibility_unknown_off_mac():
    assert ph.macos_accessibility_status() == "unknown"
    assert "Accessibility" in ph.ACCESSIBILITY_INSTRUCTIONS


def test_windows_platform_falls_back_to_powershell(monkeypatch):
    # Off-Windows, ctypes.WinDLL is missing -> the ctypes clipboard half
    # returns False and the PowerShell plan runs.
    calls = []
    monkeypatch.setattr(ph, "_run",
                        lambda argv, **kw: calls.append(argv) or True)
    win = ph.WindowsPlatform()
    assert win.copy_to_clipboard("hello")
    assert "Set-Clipboard" in calls[-1][-1]
    assert win.notify("T", "B")
    assert "ShowBalloonTip" in calls[-1][-1]
    assert win.display_server() == "windows"


def test_windows_send_inputs_degrades_off_windows():
    assert ph._win_send_inputs(ph.ctrl_v_key_sequence()) is False


def test_linux_platform_delegates(monkeypatch):
    from openhush_tpu.output import handlers
    monkeypatch.setattr(handlers, "copy_to_clipboard", lambda t: True)
    assert ph.LinuxPlatform().copy_to_clipboard("x")


# ---------------------------------------------------------------------------
# hotkey_hosts: keycode tables + chord engine
# ---------------------------------------------------------------------------

def test_win_vk_covers_every_shared_key_name():
    missing = [k for k in KEY_CODES if k not in hh.WIN_VK]
    assert missing == []


def test_mac_vk_covers_shared_names_minus_absent_keys():
    # Mac keyboards have no ScrollLock/Pause/Insert (kVK has no codes).
    absent = {"scrolllock", "pause", "insert"}
    missing = [k for k in KEY_CODES
               if k not in hh.MAC_VK and k not in absent]
    assert missing == []


def test_native_chord_windows():
    key, groups = hh.native_chord("ctrl+alt+f9", hh.WIN_VK,
                                  hh.WIN_MODIFIER_VKS)
    assert key == 0x78                       # VK_F9
    assert groups == ((0xA2, 0xA3), (0xA4, 0xA5))


def test_native_chord_macos():
    key, groups = hh.native_chord("meta+space", hh.MAC_VK,
                                  hh.MAC_MODIFIER_VKS)
    assert key == 0x31                       # kVK_Space
    assert groups == ((0x37, 0x36),)


def test_native_chord_rejects_unmapped():
    with pytest.raises(ValueError):
        hh.native_chord("insert", hh.MAC_VK, hh.MAC_MODIFIER_VKS)
    with pytest.raises(ValueError):
        hh.native_chord("ctrl+", hh.WIN_VK, hh.WIN_MODIFIER_VKS)


def test_chord_poller_edges():
    down: set = set()
    events = []
    poller = hh.ChordPoller(0x78, ((0xA2, 0xA3),), lambda c: c in down,
                            lambda: events.append("press"),
                            lambda: events.append("release"))
    poller.tick()                            # nothing held
    down.add(0x78)
    poller.tick()                            # key without modifier
    assert events == []
    down.add(0xA3)                           # right-ctrl counts
    poller.tick()
    poller.tick()                            # held: no repeat event
    assert events == ["press"]
    down.discard(0xA3)
    poller.tick()                            # mods released, key held: PTT stays
    assert events == ["press"]
    down.discard(0x78)
    poller.tick()
    assert events == ["press", "release"]
    down.add(0x78)                           # re-press without modifier
    poller.tick()
    assert events == ["press", "release"]


def test_polling_listener_start_probes(monkeypatch):
    def bad_probe(code):
        raise OSError("no native hook")
    listener = hh.PollingHotkeyListener(
        hh.ChordPoller(1, (), bad_probe, lambda: None, lambda: None))
    assert listener.start() is False


def test_polling_listener_fires_through_thread():
    down: set = set()
    fired = []
    import threading
    evt = threading.Event()
    listener = hh.PollingHotkeyListener(
        hh.ChordPoller(7, (), lambda c: c in down,
                       lambda: (fired.append(1), evt.set()),
                       lambda: None), hz=500)
    assert listener.start()
    down.add(7)
    assert evt.wait(2.0)
    listener.stop()
    assert fired == [1]


def test_create_listener_dispatch():
    lin = hh.create_hotkey_listener("f9", lambda: None, lambda: None,
                                    platform="linux")
    from openhush_tpu.runtime.hotkey import HotkeyListener
    assert isinstance(lin, HotkeyListener)
    # Off-OS, the win/mac constructors must fail gracefully at start()
    # (probe construction raises inside start, not at create time) — but
    # construction itself needs the native lib, so expect OSError or a
    # working listener, never a crash of another type.
    for plat in ("win32", "darwin"):
        try:
            listener = hh.create_hotkey_listener(
                "f9", lambda: None, lambda: None, platform=plat)
        except (OSError, AttributeError):
            continue
        assert listener.start() in (True, False)
        listener.stop()


# ---------------------------------------------------------------------------
# system_audio_hosts: ranking, resampler, guidance
# ---------------------------------------------------------------------------

def _dev(name, inputs=2, rate=48_000.0):
    return {"name": name, "max_input_channels": inputs,
            "default_samplerate": rate}


def test_rank_loopback_prefers_marker_order():
    devices = [_dev("Microphone (USB)"),
               _dev("Stereo Mix (Realtek)"),
               _dev("Speakers [Loopback]"),
               _dev("Render target", inputs=0)]
    ranked = sah.rank_loopback_devices(devices,
                                       sah.WINDOWS_LOOPBACK_MARKERS)
    assert ranked == [2, 1]                  # [loopback] outranks stereo mix


def test_rank_loopback_explicit_name():
    devices = [_dev("BlackHole 2ch"), _dev("MacBook Pro Microphone")]
    assert sah.rank_loopback_devices(devices, sah.MACOS_LOOPBACK_MARKERS,
                                     name="blackhole") == [0]
    assert sah.rank_loopback_devices(devices, sah.MACOS_LOOPBACK_MARKERS,
                                     name="missing") == []


def test_rank_loopback_skips_output_only():
    devices = [_dev("Stereo Mix", inputs=0)]
    assert sah.rank_loopback_devices(devices,
                                     sah.WINDOWS_LOOPBACK_MARKERS) == []


def test_downmix_mono():
    stereo = np.stack([np.ones(8), np.zeros(8)], axis=1)
    out = sah.downmix_mono(stereo)
    assert out.shape == (8,) and np.allclose(out, 0.5)
    assert sah.downmix_mono(np.ones(4)).shape == (4,)


def test_stream_resampler_matches_oneshot():
    rng = np.random.default_rng(0)
    x = rng.standard_normal(48_000).astype(np.float32)
    one = sah.StreamResampler(48_000, 16_000)
    whole = one.process(x)
    # Stream the same signal in ragged blocks: output must be identical
    # (phase-continuous across block boundaries).
    streamed = sah.StreamResampler(48_000, 16_000)
    chunks, pos = [], 0
    for size in (7, 480, 1111, 4800, 9600):
        while pos + size <= len(x):
            chunks.append(streamed.process(x[pos:pos + size]))
            pos += size
    chunks.append(streamed.process(x[pos:]))
    got = np.concatenate(chunks)
    n = min(len(whole), len(got))
    assert n > 15_000
    np.testing.assert_allclose(got[:n], whole[:n], atol=1e-6)


def test_stream_resampler_rate():
    sr = sah.StreamResampler(48_000, 16_000)
    out = sr.process(np.zeros(48_000, np.float32))
    assert abs(len(out) - 16_000) <= 2


def test_stream_resampler_preserves_tone():
    # 440 Hz sine through 48k->16k keeps its frequency.
    t = np.arange(48_000) / 48_000
    x = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    out = sah.StreamResampler(48_000, 16_000).process(x)
    spec = np.abs(np.fft.rfft(out * np.hanning(len(out))))
    peak_hz = np.argmax(spec) * 16_000 / len(out)
    assert abs(peak_hz - 440) < 5


class _FakeSD:
    """Stands in for sounddevice in _DeviceLoopbackSource tests."""

    def __init__(self, devices):
        self._devices = devices

    def query_devices(self, idx=None):
        return self._devices if idx is None else self._devices[idx]


def test_loopback_source_guidance_when_no_device(monkeypatch):
    src = sah.WasapiLoopbackSource()
    monkeypatch.setattr(src, "_sounddevice",
                        lambda: _FakeSD([_dev("Normal Mic")]))
    with pytest.raises(sah.SystemAudioUnavailable) as ei:
        src.start(lambda s: None)
    assert "Stereo Mix" in str(ei.value)


def test_mac_source_guidance_mentions_blackhole(monkeypatch):
    src = sah.MacSystemAudioSource()
    monkeypatch.setattr(src, "_sounddevice",
                        lambda: _FakeSD([_dev("MacBook Microphone")]))
    with pytest.raises(sah.SystemAudioUnavailable) as ei:
        src.start(lambda s: None)
    assert "blackhole" in str(ei.value).lower()


def test_open_system_source_dispatch():
    assert isinstance(sah.open_system_source(platform="win32"),
                      sah.WasapiLoopbackSource)
    assert isinstance(sah.open_system_source(platform="darwin"),
                      sah.MacSystemAudioSource)
    from openhush_tpu.audio.system_audio import MonitorSource
    assert isinstance(sah.open_system_source(platform="linux"),
                      MonitorSource)
