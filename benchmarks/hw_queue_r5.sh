#!/bin/bash
# Round-5 queue A: the measurement debts VERDICT r4 ranked, in order.
# 1. tpu_goldens — Mosaic/golden gate (reduce-phase epilogue change lands
#    only if images stay bit-correct on hardware)
# 2. run_config5_4k — the at-spec 4K run, THREE rounds overdue; today's
#    defaults + the new epilogue (resumable, checkpointed, outage-retried)
# 3. convergence_restir_2d — quality evidence for the restir_spatial_2d
#    default (or the data to revert it)
# 4. many_lights — alias-table scaling table at 10.8k emitters
# 5. adaptive --size 512 — the dispatch-floor crossover table
# Each leg logs its own exit via PIPESTATUS (the r4 scripts logged grep's).
cd /root/repo
LOG=/root/repo/benchmarks/r5b.log

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
  wait_healthy || { echo "=== TUNNEL NEVER HEALTHY (r5), abort $(date +%H:%M:%S)" >> "$LOG"; exit 1; }
  echo "=== $* $(date +%H:%M:%S)" >> "$LOG"
  timeout "${T:-900}" "$@" 2>&1 | grep -v WARNING >> "$LOG"
  echo "=== exit=${PIPESTATUS[0]} $(date +%H:%M:%S)" >> "$LOG"
  sleep 5
}

T=600  run python benchmarks/tpu_goldens.py
T=2400 run python benchmarks/run_config5_4k.py
T=2400 run python benchmarks/convergence_restir_2d.py
T=900  run python benchmarks/many_lights.py
T=900  run python benchmarks/adaptive.py --size 512
echo "=== QUEUE R5A DONE $(date +%H:%M:%S)" >> "$LOG"
