"""One-command smoke of every host-OS backend on the machine it targets.

The cross-OS backends (platform command plans, chord-polling hotkeys,
loopback capture, Win32/FIFO named pipes, Shell_NotifyIcon / AppKit /
SNI trays, autostart units) are protocol-tested on Linux CI, but their
final OS calls can only execute on a real macOS / Windows host — the
reference exercises these through its platform matrix
(/root/reference/src/platform/, src/input/system_audio_windows.rs,
src/input/system_audio_macos.rs, src/ipc/named_pipe.rs, src/tray/).
Run THIS on such a host to close that gap:

    python tools/host_smoke.py            # passive: construct + probe
    python tools/host_smoke.py --active   # also notify, play a sound,
                                          # copy to clipboard, show the
                                          # tray icon, capture 0.5 s

Each stage reports ok / skip / FAIL with detail; exit code is the number
of FAILs. --json appends one machine-readable line for filing reports.
"""

from __future__ import annotations

import json
import os
import platform
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

ACTIVE = "--active" in sys.argv
RESULTS: list[dict] = []


def stage(name: str):
    def deco(fn):
        def run():
            t0 = time.monotonic()
            try:
                out = fn()
                status, detail = (out if isinstance(out, tuple)
                                  else ("ok", str(out)))
            except Exception as e:  # noqa: BLE001 — report, don't die
                status, detail = "FAIL", f"{type(e).__name__}: {e}"
            RESULTS.append({"stage": name, "status": status,
                            "detail": str(detail)[:200],
                            "secs": round(time.monotonic() - t0, 2)})
        return run
    return deco


@stage("platform")
def s_platform():
    from openhush_tpu.utils.platform_hosts import get_host_platform
    p = get_host_platform()
    return "ok", (f"{type(p).__name__} display={p.display_server()} "
                  f"tty={p.is_tty()} access={p.accessibility_status()}")


@stage("clipboard")
def s_clipboard():
    from openhush_tpu.utils.platform_hosts import get_host_platform
    if not ACTIVE:
        return "skip", "pass --active to write the clipboard"
    ok = get_host_platform().copy_to_clipboard("openhush host smoke")
    return ("ok" if ok else "FAIL"), f"copy_to_clipboard -> {ok}"


@stage("notify+sound")
def s_notify():
    from openhush_tpu.utils.platform_hosts import get_host_platform
    if not ACTIVE:
        return "skip", "pass --active to show a notification + sound"
    p = get_host_platform()
    n = p.notify("OpenHush", "host smoke notification")
    s = p.play_sound("bell")
    return ("ok" if (n or s) else "FAIL"), f"notify={n} sound={s}"


@stage("hotkey-poll")
def s_hotkey():
    from openhush_tpu.runtime.hotkey_hosts import create_hotkey_listener
    fired = threading.Event()
    lis = create_hotkey_listener("ctrl+alt+F12", fired.set, lambda: None)
    if lis is None:
        return "skip", ("no native poller for this OS (Linux uses the "
                        "evdev/X listener in runtime/hotkey.py)")
    lis.start()
    time.sleep(1.0)      # a real GetAsyncKeyState/CGEventSource poll loop
    lis.stop()
    return "ok", "polled the native key-state API for 1 s without error"


@stage("mic-capture")
def s_mic():
    from openhush_tpu.audio.capture import SoundDeviceSource
    devs = SoundDeviceSource.list_devices()
    ins = [d for d in devs if d.get("max_input_channels", 0) > 0]
    if not ins:
        return "skip", "no input devices visible"
    if not ACTIVE:
        return "ok", f"{len(ins)} input device(s): {ins[0]['name']!r}"
    src = SoundDeviceSource()
    got: list[int] = []
    try:
        src.start(lambda chunk: got.append(len(chunk)))
        time.sleep(0.5)
    finally:
        src.stop()
    return "ok", (f"captured {sum(got)} samples in {len(got)} "
                  f"callback(s) from {ins[0]['name']!r}")


@stage("system-audio")
def s_system_audio():
    from openhush_tpu.audio.system_audio_hosts import open_system_source
    from openhush_tpu.audio.system_audio import list_monitor_sources
    if sys.platform.startswith("linux"):
        mons = list_monitor_sources()
        if not mons:
            return "skip", "no Pulse/PipeWire monitor sources"
        return "ok", f"{len(mons)} monitor source(s): {mons[0]}"
    src = open_system_source()          # ranks WASAPI/BlackHole devices
    if not ACTIVE:
        return "ok", f"opened {type(src).__name__}"
    got: list[int] = []
    src.start(lambda chunk: got.append(len(chunk)))
    try:
        time.sleep(0.5)
    finally:
        src.stop()
    return "ok", f"read {sum(got)} samples in {len(got)} callback(s)"


@stage("named-pipe")
def s_pipe():
    from openhush_tpu.runtime.named_pipe import (NamedPipeClient,
                                                 NamedPipeServer)
    path = (None if sys.platform == "win32" else
            os.path.join(tempfile.mkdtemp(prefix="oh_smoke_"), "p.pipe"))
    srv = NamedPipeServer(lambda req: {"echo": req.get("cmd")},
                          path=path)
    srv.start()
    try:
        time.sleep(0.2)          # server thread opens the transport
        got = NamedPipeClient(path=path, timeout=5.0).send("smoke")
    finally:
        srv.stop()
    assert got.get("echo") == "smoke", got
    return "ok", "request/response round-trip over the real transport"


@stage("tray")
def s_tray():
    from openhush_tpu.ui.tray import TrayStatus
    from openhush_tpu.ui.tray_windows import create_tray
    if not ACTIVE:
        return "skip", "pass --active to show the real tray icon"
    from openhush_tpu.ui.tray import TrayError
    try:
        tray = create_tray()
    except TrayError as e:
        # Environment limitation (e.g. headless Linux without an SNI
        # StatusNotifier bus), not a code failure.
        return "skip", f"no tray backend for this environment: {e}"
    try:
        tray.set_status(TrayStatus.RECORDING)
        time.sleep(1.0)
        ev = tray.try_recv()
        return "ok", f"icon shown, status set, events drained ({ev})"
    finally:
        tray.stop()


@stage("service-status")
def s_service():
    from openhush_tpu.utils import service
    st = service.status()
    return "ok", f"installed={st.get('installed')} via {st.get('kind')}"


def main() -> int:
    print(f"openhush host smoke — {platform.platform()} "
          f"python {platform.python_version()} "
          f"({'ACTIVE' if ACTIVE else 'passive'})")
    for fn in (s_platform, s_clipboard, s_notify, s_hotkey, s_mic,
               s_system_audio, s_pipe, s_tray, s_service):
        fn()
    width = max(len(r["stage"]) for r in RESULTS)
    fails = 0
    for r in RESULTS:
        fails += r["status"] == "FAIL"
        print(f"  {r['stage']:<{width}}  {r['status']:<4}  "
              f"{r['detail']}  ({r['secs']}s)")
    if "--json" in sys.argv:
        print(json.dumps({"platform": platform.platform(),
                          "active": ACTIVE, "results": RESULTS}))
    print(f"{len(RESULTS) - fails}/{len(RESULTS)} stages ok")
    return fails


if __name__ == "__main__":
    raise SystemExit(main())
