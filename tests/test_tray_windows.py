"""Windows tray protocol halves, tested off-Windows (parity scope:
src/platform/windows.rs:152-182 + src/tray/ events/status surface)."""

import ctypes
import sys

import pytest

from openhush_tpu.ui import tray_windows as tw
from openhush_tpu.ui.tray import TrayError, TrayEvent, TrayStatus


def test_notifyicondata_layout():
    # Fixed-width prefix: cbSize(4) + pad + hWnd(ptr) + uID(4) + uFlags(4)
    # + uCallbackMessage(4) + pad + hIcon(ptr); then szTip 128 WCHARs.
    ptr = ctypes.sizeof(ctypes.c_void_p)
    assert tw.NOTIFYICONDATAW.szTip.size == 128 * ctypes.sizeof(
        ctypes.c_wchar)
    assert tw.NOTIFYICONDATAW.hWnd.offset == max(8, ptr)
    data = tw.NOTIFYICONDATAW()
    data.szTip = "OpenHush"
    assert data.szTip == "OpenHush"


def test_msg_and_point_layout():
    assert ctypes.sizeof(tw.POINT) == 8
    # MSG: hwnd(ptr) message(4) wParam(size_t) lParam(ssize_t) time(4) pt(8)
    assert ctypes.sizeof(tw.MSG) >= 28


def test_status_icon_table_covers_all_states():
    assert set(tw.STATUS_ICONS) == set(TrayStatus)


def test_tooltip_uses_reference_labels():
    tip = tw.tray_tooltip(TrayStatus.RECORDING)
    assert tip.startswith("OpenHush") and "Recording" in tip
    assert len(tip) <= 63                      # szTip budget


def test_menu_command_mapping():
    assert tw.menu_event_for_command(tw.CMD_PREFERENCES) is \
        TrayEvent.SHOW_PREFERENCES
    assert tw.menu_event_for_command(tw.CMD_QUIT) is TrayEvent.QUIT
    assert tw.menu_event_for_command(9999) is None
    labels = [label for _, label in tw.MENU_ITEMS]
    assert labels == ["Preferences", "Quit"]   # reference menu order


def test_mouse_message_mapping():
    assert tw.event_for_mouse_message(tw.WM_RBUTTONUP) == "menu"
    assert tw.event_for_mouse_message(tw.WM_LBUTTONUP) == "clicked"
    assert tw.event_for_mouse_message(0x0200) is None


@pytest.mark.skipif(sys.platform.startswith("win"),
                    reason="constructor would actually start a tray")
def test_windows_tray_degrades_off_windows():
    with pytest.raises(TrayError):
        tw.WindowsTray()


def test_create_tray_dispatch_off_windows(monkeypatch):
    # On Linux create_tray returns the SNI backend (or raises TrayError
    # without a session bus) — never the Win32 one.
    calls = []

    class FakeSni:
        def __init__(self):
            calls.append(1)
    import openhush_tpu.ui.tray as tray_mod
    monkeypatch.setattr(tray_mod, "SniTray", FakeSni)
    out = tw.create_tray()
    assert isinstance(out, FakeSni) and calls == [1]
