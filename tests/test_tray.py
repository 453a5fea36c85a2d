"""StatusNotifierItem tray tests on a private dbus-daemon.

A minimal in-test StatusNotifierWatcher stands in for the desktop's SNI
host; a raw wire client then plays the "host" role — pulling properties
and the dbusmenu layout, clicking items — exactly the calls KDE/waybar
make. Parity scope: src/tray/ (mod.rs, linux.rs, icon.rs)."""

import shutil
import socket
import subprocess
import threading

import pytest

from openhush_tpu.utils import dbus as wire
from openhush_tpu.ui.tray import (SniTray, TrayError, TrayEvent, TrayStatus,
                                  MENU_IFACE, MENU_PATH, ITEM_IFACE,
                                  ITEM_PATH, PROPS_IFACE, ID_PREFS, ID_QUIT,
                                  ID_STATUS, is_tray_supported)

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


class FakeWatcher:
    """Owns org.kde.StatusNotifierWatcher and records registrations."""

    def __init__(self, address):
        self.conn = wire.DBusConnection(address)
        assert self.conn.request_name(
            "org.kde.StatusNotifierWatcher") in (1, 4)
        self.registered: list[str] = []
        self._running = True
        self._thread = threading.Thread(target=self._serve, daemon=True)
        self._thread.start()

    def _serve(self):
        self.conn.sock.settimeout(0.2)
        while self._running:
            try:
                msg = wire._read_message(self.conn.sock)
            except socket.timeout:
                continue
            except OSError:
                return
            if msg is None:
                return
            if msg["type"] != wire.METHOD_CALL:
                continue
            if msg["fields"].get(wire.H_MEMBER) == \
                    "RegisterStatusNotifierItem":
                self.registered.append(msg["args"][0])
            fields = [(wire.H_REPLY_SERIAL, "u", msg["serial"]),
                      (wire.H_DESTINATION, "s",
                       msg["fields"].get(wire.H_SENDER, ""))]
            self.conn.send(wire.build_message(
                wire.METHOD_RETURN, self.conn.next_serial(), fields))

    def stop(self):
        self._running = False
        self._thread.join(timeout=2)
        self.conn.close()


@pytest.fixture
def watcher(session_bus):
    w = FakeWatcher(session_bus)
    yield w
    w.stop()


@pytest.fixture
def tray(session_bus, watcher):
    t = SniTray(address=session_bus)
    yield t
    t.stop()


# ---------- container marshaling (pure, no bus) ----------

def test_split_signature():
    assert wire.split_signature("iias") == ["i", "i", "as"]
    assert wire.split_signature("u(ia{sv}av)") == ["u", "(ia{sv}av)"]
    assert wire.split_signature("a(ia{sv})") == ["a(ia{sv})"]


def test_container_roundtrip():
    m = wire.Marshaller()
    m.put("as", ["alpha", "beta"])
    m.put("a{sv}", {"k1": ("s", "v1"), "k2": ("u", 7)})
    m.put("(ia{sv}av)", (3, {"label": ("s", "Quit")},
                         [("(ia{sv}av)", (4, {}, []))]))
    u = wire.Unmarshaller(bytes(m.buf))
    assert u.get("as") == ["alpha", "beta"]
    assert u.get("a{sv}") == {"k1": "v1", "k2": 7}
    item = u.get("(ia{sv}av)")
    assert item[0] == 3 and item[1] == {"label": "Quit"}
    assert item[2][0][0] == 4


def test_is_tray_supported_returns_bool():
    assert isinstance(is_tray_supported(), bool)


def test_tray_status_labels_icons():
    # Parity: src/tray/mod.rs:64-82.
    assert TrayStatus.IDLE.icon_name == "audio-input-microphone"
    assert TrayStatus.RECORDING.icon_name == "media-record"
    assert TrayStatus.PROCESSING.icon_name == "view-refresh"
    assert TrayStatus.ERROR.icon_name == "dialog-error"
    assert TrayStatus.RECORDING.label == "Status: Recording..."


# ---------- live bus ----------

@needs_dbus
def test_tray_registers_with_watcher(tray, watcher):
    assert tray.bus_name in watcher.registered


@needs_dbus
def test_tray_requires_watcher(session_bus):
    with pytest.raises(TrayError):
        SniTray(address=session_bus)  # no watcher fixture → must fail


@needs_dbus
def test_host_pulls_sni_properties(tray, session_bus):
    host = wire.DBusConnection(session_bus)
    try:
        (props,) = host.call_blocking(
            tray.bus_name, ITEM_PATH, PROPS_IFACE, "GetAll", "s",
            (ITEM_IFACE,))
        assert props["Id"] == "openhush"
        assert props["IconName"] == "audio-input-microphone"
        assert props["Menu"] == MENU_PATH
        assert props["ToolTip"][0] == "audio-input-microphone"
        (icon,) = host.call_blocking(
            tray.bus_name, ITEM_PATH, PROPS_IFACE, "Get", "ss",
            (ITEM_IFACE, "IconName"))
        assert icon == "audio-input-microphone"
    finally:
        host.close()


@needs_dbus
def test_menu_layout_and_clicks(tray, session_bus):
    host = wire.DBusConnection(session_bus)
    try:
        rev, root = host.call_blocking(
            tray.bus_name, MENU_PATH, MENU_IFACE, "GetLayout", "iias",
            (0, -1, []))
        root_id, root_props, children = root
        assert root_id == 0
        assert root_props["children-display"] == "submenu"
        labels = {cid: props.get("label") for cid, props, _ in children}
        assert labels[ID_PREFS] == "Preferences..."
        assert labels[ID_QUIT] == "Quit"
        assert labels[ID_STATUS] == "Status: Idle"
        seps = [props for _, props, _ in children
                if props.get("type") == "separator"]
        assert len(seps) == 2

        # Click Preferences then Quit, as a dbusmenu host would.
        for item_id in (ID_PREFS, ID_QUIT):
            host.call_blocking(
                tray.bus_name, MENU_PATH, MENU_IFACE, "Event", "isvu",
                (item_id, "clicked", ("i", 0), 0))
        assert tray.try_recv() == TrayEvent.SHOW_PREFERENCES
        assert tray.try_recv() == TrayEvent.QUIT
        assert tray.try_recv() is None
    finally:
        host.close()


@needs_dbus
def test_status_change_updates_icon_and_menu(tray, session_bus):
    host = wire.DBusConnection(session_bus)
    try:
        rev0, _ = host.call_blocking(
            tray.bus_name, MENU_PATH, MENU_IFACE, "GetLayout", "iias",
            (0, -1, []))
        tray.set_status(TrayStatus.RECORDING)
        (icon,) = host.call_blocking(
            tray.bus_name, ITEM_PATH, PROPS_IFACE, "Get", "ss",
            (ITEM_IFACE, "IconName"))
        assert icon == "media-record"
        rev1, root = host.call_blocking(
            tray.bus_name, MENU_PATH, MENU_IFACE, "GetLayout", "iias",
            (0, -1, []))
        assert rev1 > rev0
        status_label = [p.get("label") for cid, p, _ in root[2]
                        if cid == ID_STATUS][0]
        assert status_label == "Status: Recording..."
        # Idempotent set does not bump the revision.
        tray.set_status(TrayStatus.RECORDING)
        rev2, _ = host.call_blocking(
            tray.bus_name, MENU_PATH, MENU_IFACE, "GetLayout", "iias",
            (0, -1, []))
        assert rev2 == rev1
    finally:
        host.close()


@needs_dbus
def test_activate_and_about_to_show(tray, session_bus):
    host = wire.DBusConnection(session_bus)
    try:
        host.call_blocking(tray.bus_name, ITEM_PATH, ITEM_IFACE,
                           "Activate", "ii", (10, 20))
        assert tray.try_recv() == TrayEvent.STATUS_CLICKED
        (shown,) = host.call_blocking(
            tray.bus_name, MENU_PATH, MENU_IFACE, "AboutToShow", "i", (0,))
        assert shown is False
    finally:
        host.close()
