#!/bin/sh
# Polybar module: plain-text status.
exec python -c "
from openhush_tpu.runtime.ipc import IpcClient
try:
    st = IpcClient().send('status')
    print('● REC' if st.get('recording') else '○ idle')
except Exception:
    print('—')
"
