#!/bin/bash
# Wait for the axon TPU tunnel to come back, then run the on-chip battery.
#
# The tunnel flakes for 10-30 min windows (FAILED_PRECONDITION / hangs on
# first contact); this probes with a hard timeout so a hung backend init
# costs one probe, not the watcher. Chain:
#
#   nohup bash tools/tpu_watch.sh /tmp/battery_out > /tmp/tpu_watch.log 2>&1 &
#
# Each probe is a fresh subprocess: a process that once saw the backend
# die cannot re-init it (PJRT caches the failure).
set -u
OUT=${1:-/tmp/battery_out}
MAX_PROBES=${2:-160}         # * 180 s sleep ~= 8 h of patience
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-/root/.cache/jax_comp}"

for i in $(seq 1 "$MAX_PROBES"); do
  if timeout 150 python -c "
import jax, jax.numpy as jnp
d = jax.devices()[0]
assert d.platform not in ('cpu',), d
x = jnp.ones((128, 128), jnp.bfloat16)
(x @ x).block_until_ready()
print('tunnel OK:', d)
"; then
    echo "=== tunnel up at $(date); starting battery ==="
    bash tools/onchip_battery.sh "$OUT"
    exit 0
  fi
  echo "probe $i/$MAX_PROBES failed at $(date); sleeping 180 s"
  sleep 180
done
echo "=== gave up after $MAX_PROBES probes ==="
exit 1
