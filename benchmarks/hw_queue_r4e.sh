#!/bin/bash
# Round-4 queue E: waits for queue D, then the config-2 hybrid A/B
# (primary=pallas / bounces brute) cut off by queue B's timeout, with a
# same-session brute baseline.
cd /root/repo
LOG=/tmp/hw_queue_r4.log

for i in $(seq 1 400); do
  grep -q "QUEUE D DONE\|TUNNEL NEVER HEALTHY (d)" "$LOG" && break
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
  wait_healthy || { echo "=== TUNNEL NEVER HEALTHY (e), abort $(date +%H:%M:%S)" >> "$LOG"; exit 1; }
  echo "=== $* $(date +%H:%M:%S)" >> "$LOG"
  timeout "${T:-900}" "$@" 2>&1 | grep -v WARNING >> "$LOG"
  echo "=== exit=$? $(date +%H:%M:%S)" >> "$LOG"
  sleep 5
}

T=900 run python benchmarks/config2_ab.py --only brute,hybrid  # hybrid + same-session brute

echo "=== QUEUE E DONE $(date +%H:%M:%S)" >> "$LOG"
