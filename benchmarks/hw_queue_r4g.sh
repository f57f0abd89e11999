#!/bin/bash
# Round-4 queue G: re-run of the queue C-F throughput legs whose stdout died
# with the /tmp wipe (machine restart). The log now lives in the repo so a
# restart cannot orphan the numbers again. Order: Mosaic/golden gate first
# (nothing downstream is trustworthy without it), then the config-5 schedule
# A/Bs (walk knobs, coarse-K at 4K, mesh-row refresh) and the config-2
# sweeps. The at-spec 4K run is launched manually after this data lands (it
# picks the winning schedule via CONFIG5_* env); queue H (quality legs)
# waits for benchmarks/GO_H.
cd /root/repo
LOG=/root/repo/benchmarks/r4g.log

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
  wait_healthy || { echo "=== TUNNEL NEVER HEALTHY (g), abort $(date +%H:%M:%S)" >> "$LOG"; exit 1; }
  echo "=== $* $(date +%H:%M:%S)" >> "$LOG"
  timeout "${T:-900}" "$@" 2>&1 | grep -v WARNING >> "$LOG"
  echo "=== exit=${PIPESTATUS[0]} $(date +%H:%M:%S)" >> "$LOG"
  sleep 5
}

T=600  run python benchmarks/tpu_goldens.py            # Mosaic gate (walk-knob kernel change)
T=1800 run python benchmarks/diag_walk_knobs.py        # item 1a: er x prefetch A/B
T=900  run python benchmarks/diag_4k.py --k 512        # coarse-K at 4K widths
T=900  run python benchmarks/quick_ab.py --configs 5a,5b  # mesh rows, same session
T=900  run python benchmarks/config2_ab.py --only brute,hybrid
T=900  run python benchmarks/config2_narrow.py
echo "=== QUEUE G DONE $(date +%H:%M:%S)" >> "$LOG"
