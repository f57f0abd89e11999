#!/bin/bash
# Round-4 queue G2: waits for queue G, then the er=32@100k anomaly probe
# (correctness first — a ~0 ms render smells like a wrong early exit) and
# the config-2 battery reduce-phase A/B. After these the at-spec 4K run is
# launched manually with the winning CONFIG5_* schedule.
cd /root/repo
LOG=/root/repo/benchmarks/r4g.log

for i in $(seq 1 400); do
  grep -q "QUEUE G DONE\|TUNNEL NEVER HEALTHY (g)" "$LOG" && break
  sleep 60
done

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
  wait_healthy || { echo "=== TUNNEL NEVER HEALTHY (g2), abort $(date +%H:%M:%S)" >> "$LOG"; exit 1; }
  echo "=== $* $(date +%H:%M:%S)" >> "$LOG"
  timeout "${T:-900}" "$@" 2>&1 | grep -v WARNING >> "$LOG"
  echo "=== exit=${PIPESTATUS[0]} $(date +%H:%M:%S)" >> "$LOG"
  sleep 5
}

T=900 run python benchmarks/probe_er32.py
T=900 run python benchmarks/diag_battery3.py
echo "=== QUEUE G2 DONE $(date +%H:%M:%S)" >> "$LOG"
