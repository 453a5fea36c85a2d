#!/bin/bash
# On-chip measurement battery for a round's official numbers.
#
# Runs every TPU measurement the round reports, in order of importance,
# each step an independent subprocess with its own timeout so a mid-run
# tunnel flake costs one step, not the battery. Intended to be chained
# behind a tunnel watcher the moment the chip answers:
#
#   bash tools/onchip_battery.sh /tmp/battery_out
#
# Steps:
#   1. bench.py          — the driver-format headline (raw + int8 rung +
#                          serving + beam + spec + loaded latency)
#   2. --roofline        — achievable HBM bandwidth (the honest
#                          denominator for "decode is at X% of HBM")
#   3. phases bf16 B=32  — effective decode GB/s, bf16
#   4. phases rung B=32  — effective decode GB/s, full int8 rung
#   5. phases rung B=48  — bigger batch amortizes the fixed per-step
#                          floor; budgeter-verified to fit HBM
set -u
OUT=${1:-/tmp/battery_out}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-/root/.cache/jax_comp}"

run() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name: $* (timeout ${tmo}s) ==="
  ( timeout "$tmo" "$@" ) >"$OUT/$name.log" 2>&1
  local rc=$?
  echo "--- $name rc=$rc; tail:"
  tail -6 "$OUT/$name.log"
  return 0
}

run hbm_probe     300 python -c "
import jax
from openhush_tpu.runtime.server import device_hbm_limit
d = jax.devices()[0]
print('device:', d, d.platform)
try:
    print('memory_stats:', d.memory_stats())
except Exception as e:
    print('memory_stats unavailable:', e)
print('device_hbm_limit():', device_hbm_limit())
"
run bench        3600 python bench.py
run roofline      900 python tools/bench_phases.py --roofline
run phases_bf16  1800 python tools/bench_phases.py large-v3 32 128
run phases_rung32 1800 env OPENHUSH_BENCH_INT8_W=1 \
  OPENHUSH_BENCH_INT8_CACHE=1 python tools/bench_phases.py large-v3 32 128
# B=40, not 48: the B=48 rung run RESOURCE_EXHAUSTEDs this 16 GB chip
# (compute_cross_kv_quant's per-layer fp32 intermediates peak on top of
# the 6.3 GB quantized cross-KV); 40 fits with margin.
run phases_rung40 2400 env OPENHUSH_BENCH_INT8_W=1 \
  OPENHUSH_BENCH_INT8_CACHE=1 python tools/bench_phases.py large-v3 40 128
# 6. beam step ablation: records the ancestry-masked grouped-attention
#    beam decode step time (the bench beam section gives x-realtime; this
#    gives the per-step device time and where it goes)
run beam_components 1800 python tools/beam_step_components.py
echo "=== battery complete; logs in $OUT ==="
