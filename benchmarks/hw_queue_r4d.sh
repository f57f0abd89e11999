#!/bin/bash
# Round-4 queue D: waits for queue C, then the 4K-width K A/B (is the
# 384x384 fine-K optimum still right at T=4096?) and a same-session
# headline-row refresh. The at-spec 4K run is launched manually after
# this data lands (it picks the winning schedule).
cd /root/repo
LOG=/tmp/hw_queue_r4.log

for i in $(seq 1 400); do
  grep -q "QUEUE C DONE\|TUNNEL NEVER HEALTHY (c)" "$LOG" && break
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
  wait_healthy || { echo "=== TUNNEL NEVER HEALTHY (d), abort $(date +%H:%M:%S)" >> "$LOG"; exit 1; }
  echo "=== $* $(date +%H:%M:%S)" >> "$LOG"
  timeout "${T:-900}" "$@" 2>&1 | grep -v WARNING >> "$LOG"
  echo "=== exit=$? $(date +%H:%M:%S)" >> "$LOG"
  sleep 5
}

T=900 run python benchmarks/diag_4k.py --k 512          # coarse-K at 4K widths
T=900 run python benchmarks/quick_ab.py --configs 5a,5b # mesh rows, same session
echo "=== QUEUE D DONE $(date +%H:%M:%S)" >> "$LOG"
