#!/bin/bash
# Poll for tunnel health, then run the headline bench once.
cd /root/repo
for i in $(seq 1 40); do
  if timeout 60 python -c "import jax,numpy as np; np.asarray(jax.jit(lambda a:a*2)(np.ones(2,np.float32)))" >/dev/null 2>&1; then
    timeout 560 python bench.py 2>&1 | grep -v WARNING
    exit 0
  fi
  sleep 90
done
echo '{"error": "tunnel never healthy"}'
