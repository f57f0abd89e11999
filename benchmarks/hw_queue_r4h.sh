#!/bin/bash
# Round-4 queue H: quality-measurement legs (2-D ReSTIR curves, many-lights
# alias scaling, adaptive 512x512 crossover). Waits for benchmarks/GO_H —
# created manually once the at-spec config-5 4K run (which must own the TPU
# alone for honest throughput) has been launched and finished.
cd /root/repo
LOG=/root/repo/benchmarks/r4h.log

for i in $(seq 1 400); do
  [ -f benchmarks/GO_H ] && break
  sleep 60
done
[ -f benchmarks/GO_H ] || { echo "=== GO_H never appeared" >> "$LOG"; exit 1; }

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
  wait_healthy || { echo "=== TUNNEL NEVER HEALTHY (h), abort $(date +%H:%M:%S)" >> "$LOG"; exit 1; }
  echo "=== $* $(date +%H:%M:%S)" >> "$LOG"
  timeout "${T:-900}" "$@" 2>&1 | grep -v WARNING >> "$LOG"
  echo "=== exit=${PIPESTATUS[0]} $(date +%H:%M:%S)" >> "$LOG"
  sleep 5
}

T=2400 run python benchmarks/convergence_restir_2d.py  # item 4: 2-D quality curves
T=900  run python benchmarks/many_lights.py            # item 9: alias scaling
T=2400 run python benchmarks/adaptive.py --size 512    # crossover table (cited in RESULTS.md)
echo "=== QUEUE H DONE $(date +%H:%M:%S)" >> "$LOG"
