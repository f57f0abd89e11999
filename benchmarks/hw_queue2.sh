#!/bin/bash
# Follow-up hardware queue (after hw_queue.sh): re-gate the fixed fuse and
# stream kernels, measure quad-fuse at the production cluster sizes, and
# re-run the stream A/B with the host-read fence.
cd /root/repo
run() { echo "=== $* $(date +%H:%M:%S)"; timeout 560 "$@" 2>&1 | grep -v WARNING; sleep 5; }
run python benchmarks/tpu_goldens.py
run python benchmarks/bench_stream.py
run python benchmarks/bench_stream.py --big
# quad-fuse vs paired at the production K (20k: K=256/tile=128; 100k: K=512/tile=128)
run python benchmarks/mesh_ab.py --mesh 20k --grid sah^256:128 --passes 4 --fuse 2 --trav-block 8
run python benchmarks/mesh_ab.py --mesh 20k --grid sah^256:128 --passes 4 --fuse 4 --trav-block 8
run python benchmarks/mesh_ab.py --mesh 100k --grid sah^512:128 --passes 4 --fuse 2 --trav-block 8
run python benchmarks/mesh_ab.py --mesh 100k --grid sah^512:128 --passes 4 --fuse 4 --trav-block 8
# does quad-fuse shift the optimal K down?
run python benchmarks/mesh_ab.py --mesh 20k --grid sah^128:128 --passes 4 --fuse 4 --trav-block 8
run python benchmarks/mesh_ab.py --mesh 100k --grid sah^256:128 --passes 4 --fuse 4 --trav-block 8
# ...or the optimal ray-tile down (finer tiles plan fewer visits per ray;
# they lost on per-tile fixed cost, which fuse4+tb8 just cut)
run python benchmarks/mesh_ab.py --mesh 20k --grid sah^256:64 --passes 4 --fuse 4 --trav-block 8
run python benchmarks/mesh_ab.py --mesh 100k --grid sah^512:64 --passes 4 --fuse 4 --trav-block 8
echo "=== queue2 done $(date +%H:%M:%S)"
