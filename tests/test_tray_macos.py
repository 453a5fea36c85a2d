"""macOS tray: the helper protocol, the helper loop, and the parent
bridge — everything except the actual AppKit calls, tested on Linux
(parity scope: src/platform/macos.rs + src/tray/ events/status
surface)."""

import io
import subprocess
import sys
import textwrap
import threading
import time

import pytest

from openhush_tpu.ui import tray_macos as tm
from openhush_tpu.ui.tray import TrayError, TrayEvent, TrayStatus


# -- line codec ---------------------------------------------------------------

@pytest.mark.parametrize("status", list(TrayStatus))
def test_status_command_roundtrip(status):
    cmd = tm.decode_command(tm.encode_status_command(status))
    assert cmd == {"cmd": "status", "status": status}


def test_stop_command_roundtrip():
    assert tm.decode_command(tm.encode_stop_command()) == {"cmd": "stop"}


@pytest.mark.parametrize("line", [
    "", "   ", "not json", "[1,2]", '{"cmd": "nope"}',
    '{"cmd": "status", "status": "NO_SUCH"}', '{"status": "IDLE"}'])
def test_decode_command_rejects_garbage(line):
    assert tm.decode_command(line) is None


@pytest.mark.parametrize("ev", list(TrayEvent))
def test_event_roundtrip(ev):
    assert tm.decode_helper_line(tm.encode_event(ev)) == ("event", ev)


def test_helper_line_kinds():
    assert tm.decode_helper_line(tm.encode_ready()) == ("ready", True)
    assert tm.decode_helper_line(tm.encode_error("boom")) == ("error",
                                                              "boom")
    assert tm.decode_helper_line("stray print")[0] == "noise"
    assert tm.decode_helper_line('{"event": "bogus"}')[0] == "noise"


# -- menu model ----------------------------------------------------------------

def test_menu_rows_parity_with_sni_layout():
    """Same rows as the SNI dbusmenu (tray.py) / src/tray/linux.rs:37-71:
    disabled status label, separator, Preferences..., separator, Quit."""
    rows = tm.menu_rows(TrayStatus.RECORDING)
    assert [r[0] for r in rows] == [TrayStatus.RECORDING.label, "-",
                                    "Preferences...", "-", "Quit"]
    assert rows[0][2] is False          # status row disabled
    assert rows[2][2] and rows[4][2]    # actionable rows enabled
    assert tm.EVENT_FOR_SELECTOR[rows[2][1]] is TrayEvent.SHOW_PREFERENCES
    assert tm.EVENT_FOR_SELECTOR[rows[4][1]] is TrayEvent.QUIT


def test_status_titles_cover_every_status():
    assert set(tm.STATUS_TITLES) == set(TrayStatus)
    assert len({t for t in tm.STATUS_TITLES.values()}) == len(TrayStatus)


# -- helper loop (fake backend) -------------------------------------------------

class FakeBackend:
    def __init__(self, fail_start=False):
        self.fail_start = fail_start
        self.statuses = []
        self.terminated = threading.Event()
        self.emit = None

    def start(self, rows, title, emit):
        if self.fail_start:
            raise RuntimeError("no AppKit here")
        self.rows, self.title, self.emit = rows, title, emit

    def set_status(self, status):
        self.statuses.append(status)

    def terminate(self):
        self.terminated.set()

    def run(self):
        assert self.terminated.wait(timeout=10)


def test_run_helper_serves_commands_and_stops():
    backend = FakeBackend()
    stdin = io.StringIO(tm.encode_status_command(TrayStatus.RECORDING)
                        + "garbage line\n"
                        + tm.encode_status_command(TrayStatus.ERROR)
                        + tm.encode_stop_command())
    stdout = io.StringIO()
    assert tm.run_helper(backend, stdin=stdin, stdout=stdout) == 0
    assert backend.statuses == [TrayStatus.RECORDING, TrayStatus.ERROR]
    assert backend.terminated.is_set()
    assert backend.title == tm.STATUS_TITLES[TrayStatus.IDLE]
    kinds = [tm.decode_helper_line(l)[0]
             for l in stdout.getvalue().splitlines()]
    assert kinds == ["ready"]


def test_run_helper_terminates_on_eof():
    """Parent death (stdin EOF) must tear the helper down — no orphaned
    menu-bar icons."""
    backend = FakeBackend()
    assert tm.run_helper(backend, stdin=io.StringIO(""),
                         stdout=io.StringIO()) == 0
    assert backend.terminated.is_set()


def test_run_helper_emits_menu_events():
    backend = FakeBackend()
    stdout = io.StringIO()
    done = threading.Event()

    class Stdin:
        def __iter__(self):
            # A menu click happens while the loop is serving.
            backend.emit(TrayEvent.SHOW_PREFERENCES)
            yield tm.encode_stop_command()
            done.set()

    assert tm.run_helper(backend, stdin=Stdin(), stdout=stdout) == 0
    lines = stdout.getvalue().splitlines()
    parsed = [tm.decode_helper_line(l) for l in lines]
    assert ("event", TrayEvent.SHOW_PREFERENCES) in parsed


def test_run_helper_reports_start_failure():
    stdout = io.StringIO()
    rc = tm.run_helper(FakeBackend(fail_start=True),
                       stdin=io.StringIO(""), stdout=stdout)
    assert rc == 1
    kind, text = tm.decode_helper_line(stdout.getvalue())
    assert kind == "error" and "no AppKit" in text


# -- parent bridge over a real subprocess ---------------------------------------

FAKE_HELPER = textwrap.dedent("""
    import json, sys
    print(json.dumps({"ready": True}), flush=True)
    for line in sys.stdin:
        msg = json.loads(line)
        if msg.get("cmd") == "stop":
            break
        if msg.get("cmd") == "status":
            # A user clicks Preferences right after each status change.
            print(json.dumps({"event": "show_preferences"}), flush=True)
    sys.exit(0)
""")

FAILING_HELPER = ("import json, sys; "
                  "print(json.dumps({'error': 'AppKit unavailable'})"
                  ".replace(chr(39), chr(34)), flush=True); sys.exit(1)")


def test_mactray_end_to_end_with_fake_helper(tmp_path):
    script = tmp_path / "helper.py"
    script.write_text(FAKE_HELPER)
    tray = tm.MacTray(helper_argv=[sys.executable, str(script)])
    assert tray.status is TrayStatus.IDLE
    tray.set_status(TrayStatus.RECORDING)
    assert tray.status is TrayStatus.RECORDING
    deadline = time.monotonic() + 10
    ev = None
    while ev is None and time.monotonic() < deadline:
        ev = tray.try_recv()
        time.sleep(0.01)
    assert ev is TrayEvent.SHOW_PREFERENCES
    tray.set_status(TrayStatus.RECORDING)   # no-op: same status
    tray.stop()
    assert tray.proc.returncode == 0


def test_mactray_surfaces_helper_failure(tmp_path):
    with pytest.raises(TrayError, match="AppKit unavailable"):
        tm.MacTray(helper_argv=[sys.executable, "-c", FAILING_HELPER])


def test_mactray_bad_spawn_is_tray_error():
    with pytest.raises(TrayError, match="spawn failed"):
        tm.MacTray(helper_argv=["/no/such/binary/anywhere"])


def test_create_tray_routes_macos(monkeypatch):
    """create_tray() must pick the AppKit helper backend on darwin."""
    from openhush_tpu.ui import tray_windows as tw

    calls = []
    monkeypatch.setattr(tm, "MacTray",
                        lambda *a, **k: calls.append("mac") or "tray")
    monkeypatch.setattr(sys, "platform", "darwin")
    assert tw.create_tray() == "tray"
    assert calls == ["mac"]
