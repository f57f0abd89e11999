#!/bin/bash
# Round-4 master hardware queue (VERDICT r3 items 1-4, 6, 9), restart-safe.
# Health-polls BEFORE EVERY leg: a leg that wedges the tunnel costs only
# the wait, not the rest of the queue. Probe = tiny jit roundtrip.
cd /root/repo
LOG=/tmp/hw_queue_r4.log

probe() {
  timeout 60 python -c "import jax,numpy as np; np.asarray(jax.jit(lambda a:a*2)(np.ones(2,np.float32)))" >/dev/null 2>&1
}

wait_healthy() {
  for i in $(seq 1 160); do   # up to ~4h
    probe && return 0
    echo "--- tunnel down, retry $i $(date +%H:%M:%S)" >> "$LOG"
    sleep 90
  done
  return 1
}

run() {
  wait_healthy || { echo "=== TUNNEL NEVER HEALTHY, abort $(date +%H:%M:%S)" >> "$LOG"; exit 1; }
  echo "=== $* $(date +%H:%M:%S)" >> "$LOG"
  timeout "${T:-900}" "$@" 2>&1 | grep -v WARNING >> "$LOG"
  echo "=== exit=$? $(date +%H:%M:%S)" >> "$LOG"
  sleep 5
}

T=2400 run python benchmarks/adaptive.py        # item 3: steady-state walls
T=900  run python benchmarks/diag_4k.py         # item 1b: 4K plan-vs-walk + super A/B
T=900  run python benchmarks/config2_ab.py      # item 2: fine-K pallas vs brute
T=600  run python benchmarks/diag_batched_battery.py  # item 6: NEE/closest fused ceiling
T=1800 run python benchmarks/convergence_restir_2d.py # item 4: 2-D ReSTIR quality
T=900  run python benchmarks/many_lights.py     # item 9: alias at 10k lights
echo "=== QUEUE DONE $(date +%H:%M:%S)" >> "$LOG"
