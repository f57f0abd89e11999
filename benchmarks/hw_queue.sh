#!/bin/bash
# Everything waiting on the axon tunnel, in priority order. Each leg bounded;
# short sleeps let the tunnel breathe between device sessions.
cd /root/repo
run() { echo "=== $* $(date +%H:%M:%S)"; timeout 560 "$@" 2>&1 | grep -v WARNING; sleep 5; }
run python benchmarks/tpu_goldens.py
run python benchmarks/bench_stream.py
run python benchmarks/bench_stream.py --big
run python benchmarks/mesh_ab.py --mesh 20k --grid sah:128 --passes 4
run python benchmarks/mesh_ab.py --mesh 20k --grid sah:128 --passes 4 --fuse
run python benchmarks/mesh_ab.py --mesh 20k --grid sah:128 --passes 4 --trav-block 8
run python benchmarks/mesh_ab.py --mesh 20k --grid sah:128 --passes 4 --fuse --trav-block 8
run python benchmarks/mesh_ab.py --mesh 20k --grid sah:128 --passes 4 --unroll 4
run python benchmarks/mesh_ab.py --mesh 100k --grid sah:256 --passes 4
run python benchmarks/mesh_ab.py --mesh 100k --grid sah:256 --passes 4 --fuse --trav-block 8
# if fuse/tb8 cut per-visit fixed cost, finer clusters may win the K-sweep
run python benchmarks/mesh_ab.py --mesh 100k --grid sah^256:256 --passes 4 --fuse --trav-block 8
run python benchmarks/mesh_ab.py --mesh 20k --grid sah^128:128 --passes 4 --fuse --trav-block 8
run python benchmarks/bench_traverse_kernel.py --prims 1000
run python benchmarks/config2_hybrid.py
run python bench.py
echo "=== queue done $(date +%H:%M:%S)"
