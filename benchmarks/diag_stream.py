"""Diagnose the streaming-traversal pid mismatch vs the resident kernel
(bench_stream measured exact=False at P=100k on hardware; interpret mode is
bit-exact) and bisect the P=20k compile-helper crash.

    python benchmarks/diag_stream.py [--bisect]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from cpu_raytracing_experiments_tpu.core.vec import Vec3
from cpu_raytracing_experiments_tpu.ops import clustered
from cpu_raytracing_experiments_tpu.ops.pallas import traverse_kernel as tk
from bench_stream import make_tris, make_rays


def build(P, K, rng):
    mins, maxs, rows = make_tris(P, rng)
    return clustered.build_clusters(mins, maxs, rows,
                                    num_clusters=-(-P // K), kind="triangle")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bisect", action="store_true",
                    help="bisect the 20k compile crash over C")
    args = ap.parse_args()
    rng = np.random.default_rng(7)
    print(f"device={jax.devices()[0].device_kind}")

    if args.bisect:
        # 20k (C=79) crashes the compile helper; 100k (C=391) compiles.
        # Find the boundary: compile-only (AOT), no execution.
        for P in (20000, 24576, 32768, 40000, 65536, 100000):
            K = 256
            cp = build(P, K, rng)
            p, d = make_rays(4096, rng)
            try:
                f = jax.jit(lambda cp, p, d: tk.intersect_clustered_pallas(
                    cp, p, d, tile_r=256, stream=True))
                f.lower(cp, p, d).compile()
                print(f"  P={P} C={cp.num_clusters}: COMPILE OK")
            except Exception as e:  # noqa: BLE001
                print(f"  P={P} C={cp.num_clusters}: FAIL "
                      f"{type(e).__name__} {str(e)[:160]}")
        return

    P, K, R = 100000, 256, 262144
    cp = build(P, K, rng)
    p, d = make_rays(R, rng)
    t0, i0 = tk.intersect_clustered_pallas(cp, p, d, tile_r=256)
    t0, i0 = np.asarray(t0), np.asarray(i0)
    for sort in (True, False):
        t1, i1 = tk.intersect_clustered_pallas(cp, p, d, tile_r=256,
                                               stream=True, sort=sort)
        t1, i1 = np.asarray(t1), np.asarray(i1)
        bad = np.nonzero(i1 != i0)[0]
        print(f"sort={sort}: {bad.size} mismatched lanes / {R}")
        if bad.size:
            b = bad[:8]
            print("  lanes:", b.tolist())
            print("  tiles:", (b // 256).tolist(),
                  "in-tile:", (b % 256).tolist())
            print("  resident (t, id):",
                  [(float(t0[i]), int(i0[i])) for i in b[:4]])
            print("  stream   (t, id):",
                  [(float(t1[i]), int(i1[i])) for i in b[:4]])
            # are stream hits real? re-verify against a one-cluster check:
            # t must satisfy |t_stream| <= t_resident (resident is ground
            # truth closest); larger t = stream MISSED the true closest
            worse = np.sum(t1[bad] > t0[bad] * (1 + 1e-6))
            better = np.sum(t1[bad] < t0[bad] * (1 - 1e-6))
            print(f"  stream t larger (missed closer hit): {worse}, "
                  f"smaller: {better}, equal-t different-id: "
                  f"{bad.size - worse - better}")
            # tile histogram: all mismatches in a few tiles -> schedule bug;
            # scattered -> data race
            tiles, counts = np.unique(bad // 256, return_counts=True)
            print(f"  tiles affected: {tiles.size}, max per tile: "
                  f"{counts.max()}, first tiles: {tiles[:6].tolist()}")
        # repeatability: run twice, same result? (race -> flaky)
        t2, i2 = tk.intersect_clustered_pallas(cp, p, d, tile_r=256,
                                               stream=True, sort=sort)
        same = bool(np.array_equal(np.asarray(i2), i1))
        print(f"  stream repeatable: {same}")


if __name__ == "__main__":
    main()
