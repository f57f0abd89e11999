#!/bin/bash
# Wait for the axon TPU tunnel, then: on-hardware golden gate + stream A/B.
cd /root/repo
for i in $(seq 1 120); do
  if timeout 90 python -c "import jax,numpy as np; np.asarray(jax.jit(lambda a:a*2)(np.ones(2,np.float32)))" >/dev/null 2>&1; then
    echo "[watch] TPU healthy at attempt $i $(date +%H:%M:%S)"
    timeout 560 python benchmarks/tpu_goldens.py 2>&1 | grep -v WARNING
    sleep 5
    timeout 560 python benchmarks/bench_stream.py 2>&1 | grep -v WARNING
    sleep 5
    timeout 560 python benchmarks/bench_stream.py --big 2>&1 | grep -v WARNING
    exit 0
  fi
  echo "[watch] attempt $i: tunnel down $(date +%H:%M:%S)"
  sleep 75
done
echo "[watch] gave up"
