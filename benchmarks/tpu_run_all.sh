#!/bin/bash
# One-shot TPU measurement campaign: phases as separate processes (a device
# fault only loses one phase), settle delays between, crash-safe jsonl log.
cd /root/repo
probe() { timeout 60 python -c "import jax,numpy as np; np.asarray(jax.jit(lambda a:a*2)(np.ones(2,np.float32)))" >/dev/null 2>&1; }

wait_healthy() {
  for i in $(seq 1 90); do
    if probe; then echo "[runall] healthy ($i) $(date +%H:%M:%S)"; return 0; fi
    sleep 60
  done
  return 1
}

run_phase() {
  name=$1; shift
  echo "[runall] phase $name start $(date +%H:%M:%S)"
  timeout "$1" python -u benchmarks/tpu_diag.py "$name" 2>&1 | grep -v WARNING
  echo "[runall] phase $name done rc=$? $(date +%H:%M:%S)"
  sleep 20
}

wait_healthy || { echo "[runall] never healthy"; exit 1; }
run_phase pool 560
wait_healthy
run_phase shares 560
wait_healthy
run_phase renders 560
wait_healthy
echo "[runall] sweep start $(date +%H:%M:%S)"
timeout 1200 python -u benchmarks/sweep.py --out benchmarks/RESULTS.md 2>&1 | grep -v WARNING | tail -40
echo "[runall] all done $(date +%H:%M:%S)"
