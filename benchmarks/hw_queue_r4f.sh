#!/bin/bash
# Round-4 queue F (finale): waits for queue E, then the config-2 narrowing
# sweep and the FRESH at-spec config-5 4K run. The 4K run checkpoints every
# 16 spp and resumes bit-exactly, so it retries through tunnel outages
# until done; accum_wall_s sums only pass time (honest throughput across
# restarts).
cd /root/repo
LOG=/tmp/hw_queue_r4.log

for i in $(seq 1 400); do
  grep -q "QUEUE E DONE\|TUNNEL NEVER HEALTHY (e)" "$LOG" && break
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
  wait_healthy || { echo "=== TUNNEL NEVER HEALTHY (f), abort $(date +%H:%M:%S)" >> "$LOG"; exit 1; }
  echo "=== $* $(date +%H:%M:%S)" >> "$LOG"
  timeout "${T:-900}" "$@" 2>&1 | grep -v WARNING >> "$LOG"
  echo "=== exit=$? $(date +%H:%M:%S)" >> "$LOG"
  sleep 5
}

T=900 run python benchmarks/config2_narrow.py

# fresh at-spec run: archive the round-2 log, clear any stale checkpoint,
# then retry the resumable runner through outages until 'done' lands
rm -f benchmarks/config5_4k.npz
[ -f benchmarks/config5_4k.jsonl ] && \
  mv benchmarks/config5_4k.jsonl benchmarks/config5_4k_r2.jsonl
for attempt in $(seq 1 12); do
  T=2700 run python benchmarks/run_config5_4k.py
  tail -1 benchmarks/config5_4k.jsonl 2>/dev/null | grep -q '"event": "done"' && break
done
echo "=== QUEUE F DONE $(date +%H:%M:%S)" >> "$LOG"
