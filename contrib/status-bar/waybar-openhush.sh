#!/bin/sh
# Waybar custom module: poll the daemon and emit status JSON.
# Parity: contrib/status-bar + wayland_ipc.rs Waybar emitter.
exec python -c "
from openhush_tpu.runtime.ipc import IpcClient
from openhush_tpu.utils.platform import status_bar_json
try:
    st = IpcClient().send('status')
    state = st.get('state', 'idle')
    print(status_bar_json(state, st.get('recording', False),
                          st.get('queue_depth', 0)))
except Exception:
    print('{\"text\": \"\", \"class\": \"stopped\", \"tooltip\": \"OpenHush: not running\"}')
"
