#!/bin/bash
# Round-4 hardware measurement queue, priority order (VERDICT r3 items
# 1-2, 4, 6, 9). Each leg bounded; short sleeps let the tunnel breathe.
cd /root/repo
run() { echo "=== $* $(date +%H:%M:%S)"; timeout "${T:-560}" "$@" 2>&1 | grep -v WARNING; sleep 5; }
T=900 run python benchmarks/diag_4k.py          # config-5: 4K plan-vs-walk + super A/B
T=900 run python benchmarks/config2_ab.py       # config-2: fine-K pallas vs brute
run python benchmarks/diag_batched_battery.py   # NEE/closest fused-battery ceiling
T=1800 run python benchmarks/convergence_restir_2d.py  # 2-D ReSTIR quality
T=900 run python benchmarks/many_lights.py      # alias at 10k lights
echo "=== queue done $(date +%H:%M:%S)"
