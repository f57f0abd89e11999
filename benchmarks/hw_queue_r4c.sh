#!/bin/bash
# Round-4 follow-on queue: waits for hw_queue_r4b's DONE marker, then runs
# the second measurement wave (walk-knob A/B, on-hardware goldens after the
# traverse_kernel change, 512x512 adaptive crossover).
cd /root/repo
LOG=/tmp/hw_queue_r4.log

for i in $(seq 1 400); do   # up to ~10h behind the first queue
  grep -q "QUEUE DONE\|TUNNEL NEVER HEALTHY" "$LOG" && break
  sleep 90
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
  wait_healthy || { echo "=== TUNNEL NEVER HEALTHY (c), abort $(date +%H:%M:%S)" >> "$LOG"; exit 1; }
  echo "=== $* $(date +%H:%M:%S)" >> "$LOG"
  timeout "${T:-900}" "$@" 2>&1 | grep -v WARNING >> "$LOG"
  echo "=== exit=$? $(date +%H:%M:%S)" >> "$LOG"
  sleep 5
}

T=600  run python benchmarks/tpu_goldens.py          # Mosaic gate for the walk-knob kernel change
T=1200 run python benchmarks/diag_walk_knobs.py      # item 1a: er x prefetch A/B
T=2400 run python benchmarks/adaptive.py --size 512  # adaptive wall crossover at compute-bound size
echo "=== QUEUE C DONE $(date +%H:%M:%S)" >> "$LOG"
