#!/usr/bin/env python3
"""Event-driven Waybar module: block on the daemon's IsRecordingChanged
D-Bus signal instead of polling (waybar config: "exec": this script,
no "interval" — each emitted line updates the bar instantly).

Falls back to one-shot polled status when there is no session bus or
signal stream; pairs with the polled waybar-openhush.sh."""

import sys


def emit(state: str, recording: bool, depth: int = 0) -> None:
    from openhush_tpu.utils.platform import status_bar_json
    print(status_bar_json(state, recording, depth), flush=True)


def poll_once() -> bool:
    from openhush_tpu.runtime.ipc import IpcClient
    try:
        st = IpcClient().send("status")
    except (ConnectionError, OSError):
        print('{"text": "—", "class": "stopped"}', flush=True)
        return False
    emit(st.get("state", "idle"), st.get("recording", False),
         st.get("queue_depth", 0))
    return True


def main() -> int:
    if not poll_once():
        return 1
    try:
        from openhush_tpu.utils.dbus import DbusClient
        client = DbusClient()
        client.subscribe_recording_changed()
    except Exception:  # noqa: BLE001 — no bus: stay with the snapshot
        return 0
    while True:
        rec = client.wait_recording_changed(timeout=3600)
        if rec is None:
            if not poll_once():       # heartbeat: daemon still alive?
                return 1
            continue
        emit("recording" if rec else "idle", rec)


if __name__ == "__main__":
    sys.exit(main())
