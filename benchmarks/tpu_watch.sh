#!/bin/bash
# Wait for the axon TPU tunnel to become healthy, then run the diagnostics.
cd /root/repo
for i in $(seq 1 60); do
  if timeout 60 python -c "import jax,numpy as np; np.asarray(jax.jit(lambda a:a*2)(np.ones(2,np.float32)))" >/dev/null 2>&1; then
    echo "[watch] TPU healthy at attempt $i $(date +%H:%M:%S)"
    timeout 560 python benchmarks/tpu_diag.py renders 2>&1 | grep -v WARNING
    sleep 10
    timeout 560 python benchmarks/tpu_diag.py pool 2>&1 | grep -v WARNING
    sleep 10
    timeout 560 python benchmarks/tpu_diag.py traversal 2>&1 | grep -v WARNING
    exit 0
  fi
  echo "[watch] attempt $i: tunnel down $(date +%H:%M:%S)"
  sleep 120
done
echo "[watch] gave up"
