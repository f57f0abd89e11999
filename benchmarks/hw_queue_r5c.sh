#!/bin/bash
# Round-5 queue C: chained behind queue A (waits for its DONE marker).
# 1. diag_group_plan — hardware word on per-leaf group culling (the sim
#    predicted net negative; this closes VERDICT r4 item 5 either way)
# 2. config2_narrow — re-sweep the narrowing cascade under the NEW
#    reduce-phase epilogue: the (8,32) optimum was measured against a 2x
#    slower battery, so the compaction-vs-battery tradeoff moved
# 3. diag_battery3 at config-3/4 shapes — confirm the vreduce win holds
#    across the brute configs' ray widths
cd /root/repo
LOG=/root/repo/benchmarks/r5c.log

for i in $(seq 1 400); do
  grep -q "QUEUE R5A DONE" benchmarks/r5b.log 2>/dev/null && break
  sleep 60
done
grep -q "QUEUE R5A DONE" benchmarks/r5b.log 2>/dev/null || {
  echo "=== QUEUE A NEVER FINISHED, abort $(date +%H:%M:%S)" >> "$LOG"; exit 1; }

probe() {
  timeout 60 python -c "import jax,numpy as np; np.asarray(jax.jit(lambda a:a*2)(np.ones(2,np.float32)))" >/dev/null 2>&1
}
wait_healthy() {
  for i in $(seq 1 160); do
    probe && return 0
    echo "--- tunnel down, retry $i $(date +%H:%M:%S)" >> "$LOG"
    sleep 90
  done
  return 1
}
run() {
  wait_healthy || { echo "=== TUNNEL NEVER HEALTHY (r5c), abort $(date +%H:%M:%S)" >> "$LOG"; exit 1; }
  echo "=== $* $(date +%H:%M:%S)" >> "$LOG"
  timeout "${T:-900}" "$@" 2>&1 | grep -v WARNING >> "$LOG"
  echo "=== exit=${PIPESTATUS[0]} $(date +%H:%M:%S)" >> "$LOG"
  sleep 5
}

T=1800 run python benchmarks/diag_group_plan.py
T=1800 run python benchmarks/config2_narrow.py
T=900  run python benchmarks/diag_battery3.py --rays 1048576 --prims 128
T=900  run python benchmarks/diag_battery3.py --rays 2097152 --prims 16
echo "=== QUEUE R5C DONE $(date +%H:%M:%S)" >> "$LOG"
