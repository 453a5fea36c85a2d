"""D-Bus wire-protocol tests against a real dbus-daemon, with interop
verified through the stock dbus-send tool."""

import json
import os
import shutil
import subprocess
import time

import pytest

from openhush_tpu.utils import dbus

needs_dbus = pytest.mark.skipif(shutil.which("dbus-daemon") is None,
                                reason="dbus-daemon not installed")


@pytest.fixture(scope="module")
def session_bus():
    proc = subprocess.Popen(
        ["dbus-daemon", "--session", "--print-address", "--nofork"],
        stdout=subprocess.PIPE, text=True)
    address = proc.stdout.readline().strip()
    yield address
    proc.terminate()
    proc.wait(timeout=5)


@pytest.fixture
def service(session_bus):
    state = {"recording": False, "calls": []}

    def handler(member):
        state["calls"].append(member)
        if member in ("StartRecording", "StopRecording", "ToggleRecording",
                      "LoadModel", "UnloadModel"):
            state["recording"] = member == "StartRecording"
            return ("b", True)
        if member == "GetStatus":
            return ("s", json.dumps({"recording": state["recording"]}))
        if member == "GetQueueDepth":
            return ("u", 7)
        if member == "GetVersion":
            return ("s", "0.1.0")
        raise ValueError(f"unknown method {member}")

    svc = dbus.DbusService(handler, address=session_bus)
    yield svc, state
    svc.stop()


# ---------- marshaling unit tests (no bus needed) ----------

def test_marshal_roundtrip():
    m = dbus.Marshaller()
    m.put("u", 42)
    m.put("s", "héllo")
    m.put("b", True)
    u = dbus.Unmarshaller(bytes(m.buf))
    assert u.get("u") == 42
    assert u.get("s") == "héllo"
    assert u.get("b") is True


def test_message_roundtrip():
    msg = dbus.build_message(
        dbus.METHOD_CALL, 5,
        [(dbus.H_PATH, "o", "/org/openhush/Daemon1"),
         (dbus.H_MEMBER, "s", "GetVersion"),
         (dbus.H_DESTINATION, "s", "org.openhush.Daemon1")],
        "su", ("hello", 9))
    parsed = dbus.parse_message(msg)
    assert parsed["type"] == dbus.METHOD_CALL
    assert parsed["serial"] == 5
    assert parsed["fields"][dbus.H_MEMBER] == "GetVersion"
    assert parsed["args"] == ["hello", 9]


# ---------- live bus tests ----------

@needs_dbus
def test_client_service_roundtrip(service, session_bus):
    svc, state = service
    client = dbus.DbusClient(address=session_bus)
    try:
        assert client.call("GetVersion") == "0.1.0"
        assert client.call("GetQueueDepth") == 7
        assert client.call("StartRecording") is True
        assert json.loads(client.call("GetStatus"))["recording"] is True
        assert client.call("StopRecording") is True
        with pytest.raises(RuntimeError, match="D-Bus error"):
            client.call("NoSuchMethod")
    finally:
        client.close()
    assert "StartRecording" in state["calls"]


@needs_dbus
def test_dbus_send_interop(service, session_bus):
    """The stock dbus-send CLI must be able to drive our service."""
    env = dict(os.environ, DBUS_SESSION_BUS_ADDRESS=session_bus)
    r = subprocess.run(
        ["dbus-send", "--session", "--print-reply",
         "--dest=org.openhush.Daemon1", "/org/openhush/Daemon1",
         "org.openhush.Daemon1.GetVersion"],
        capture_output=True, text=True, timeout=10, env=env)
    assert r.returncode == 0, r.stderr
    assert '"0.1.0"' in r.stdout
    r = subprocess.run(
        ["dbus-send", "--session", "--print-reply",
         "--dest=org.openhush.Daemon1", "/org/openhush/Daemon1",
         "org.openhush.Daemon1.ToggleRecording"],
        capture_output=True, text=True, timeout=10, env=env)
    assert r.returncode == 0, r.stderr
    assert "boolean true" in r.stdout
    # Introspection works (what busctl/d-feet would show).
    r = subprocess.run(
        ["dbus-send", "--session", "--print-reply",
         "--dest=org.openhush.Daemon1", "/org/openhush/Daemon1",
         "org.freedesktop.DBus.Introspectable.Introspect"],
        capture_output=True, text=True, timeout=10, env=env)
    assert "IsRecordingChanged" in r.stdout


@needs_dbus
def test_signal_emission(service, session_bus):
    svc, _ = service
    env = dict(os.environ, DBUS_SESSION_BUS_ADDRESS=session_bus)
    mon = subprocess.Popen(
        ["dbus-monitor", "--session",
         "type='signal',interface='org.openhush.Daemon1'"],
        stdout=subprocess.PIPE, text=True, env=env) \
        if shutil.which("dbus-monitor") else None
    time.sleep(0.3)
    svc.emit_recording_changed(True)
    if mon is not None:
        time.sleep(0.5)
        mon.terminate()
        out, _ = mon.communicate(timeout=5)
        assert "IsRecordingChanged" in out


@needs_dbus
def test_signal_subscription_client(service, session_bus):
    """Client-side match-rule subscription: wait_recording_changed blocks
    until the daemon flips state (signal at src/dbus/service.rs:47)."""
    import threading

    svc, _ = service
    client = dbus.DbusClient(address=session_bus)
    try:
        client.subscribe_recording_changed()
        got = []
        t = threading.Thread(
            target=lambda: got.append(client.wait_recording_changed(10)))
        t.start()
        time.sleep(0.3)
        svc.emit_recording_changed(True)
        t.join(timeout=10)
        assert got == [True]
    finally:
        client.close()
