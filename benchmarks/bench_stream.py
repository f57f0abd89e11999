"""On-hardware A/B of the HBM-streaming traversal (stream=True: cluster
attribute tables live in HBM, each visit DMA'd into a double-buffered VMEM
scratch) vs the VMEM-resident default.

Two questions:
  1. Cost at VMEM-feasible sizes (100k tris): how much does streaming give
     up when residency is possible?  (Expected: little — per-visit DMA of
     F*K*4 B overlaps the battery.)
  2. Capability past the VMEM ceiling (~1.3M tris at 48 B/tri in a 64 MB
     grant): does a 2M-tri scene run with stream=True where the resident
     path cannot?

Run:  python benchmarks/bench_stream.py [--big]
Keeps every timed execution well under the ~60 s axon device guard.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from cpu_raytracing_experiments_tpu.core.vec import Vec3
from cpu_raytracing_experiments_tpu.ops import clustered
from cpu_raytracing_experiments_tpu.ops.pallas import traverse_kernel as tk


def _fence(out):
    """block_until_ready does not reliably block through the axon tunnel
    for small dispatches (ARCHITECTURE.md benchmarking trap); a host read
    is the only true fence."""
    leaf = jax.tree.leaves(out)[0]
    np.asarray(leaf[:1])


def timeit(fn, *args, reps=5, **kw):
    out = fn(*args, **kw)
    _fence(out)
    best = 1e30
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        _fence(out)
        best = min(best, time.perf_counter() - t0)
    return best * 1e3, out


def make_tris(P, rng):
    v0 = rng.uniform(-5, 5, (P, 3)).astype(np.float32)
    e1 = rng.normal(0, 0.15, (P, 3)).astype(np.float32)
    e2 = rng.normal(0, 0.15, (P, 3)).astype(np.float32)
    rows = np.concatenate([v0, e1, e2], axis=1)
    pts = np.stack([v0, v0 + e1, v0 + e2], axis=0)
    return pts.min(axis=0), pts.max(axis=0), rows


def make_rays(R, rng):
    side = int(np.sqrt(R))
    u, v = np.meshgrid(np.linspace(-0.4, 0.4, side),
                       np.linspace(-0.4, 0.4, side))
    d = np.stack([u.ravel(), v.ravel(), -np.ones(side * side)], axis=1)
    d = np.concatenate([d, d[: R - side * side]], axis=0)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    p = np.tile(np.array([[0.0, 0.0, 12.0]], np.float32), (R, 1))
    return (
        Vec3(*[jnp.asarray(p[:, i].astype(np.float32)) for i in range(3)]),
        Vec3(*[jnp.asarray(d[:, i].astype(np.float32)) for i in range(3)]),
    )


def run_size(P, R, K, rng, streams=(False, True)):
    mins, maxs, rows = make_tris(P, rng)
    cp = clustered.build_clusters(mins, maxs, rows, num_clusters=-(-P // K),
                                  kind="triangle")
    p, d = make_rays(R, rng)
    base = None
    for stream in streams:
        try:
            ms, (t, pid) = timeit(
                tk.intersect_clustered_pallas, cp, p, d, tile_r=256,
                stream=stream,
            )
        except Exception as e:  # noqa: BLE001
            print(f"  P={P} stream={int(stream)}: FAIL "
                  f"{type(e).__name__}: {str(e)[:3000]}")
            continue
        mrays = R / ms / 1e3
        if base is None:
            base = (t, pid)
            print(f"  P={P} K={K} stream={int(stream)}: {ms:8.2f} ms "
                  f"({mrays:6.1f} Mrays/s)  hits={float(jnp.mean(pid >= 0)):.3f}")
        else:
            ok = bool(jnp.all(pid == base[1]))
            print(f"  P={P} K={K} stream={int(stream)}: {ms:8.2f} ms "
                  f"({mrays:6.1f} Mrays/s)  exact={ok}")
        # shadow leg
        tfar = jnp.where(pid >= 0, t * 0.99, 20.0)
        ms_s, occ = timeit(tk.occluded_clustered_pallas, cp, p, d, tfar,
                           tile_r=256, stream=stream)
        print(f"      shadow stream={int(stream)}: {ms_s:8.2f} ms")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--big", action="store_true",
                    help="also run the 2M-tri past-VMEM-ceiling case")
    args = ap.parse_args()
    rng = np.random.default_rng(7)
    print(f"device={jax.devices()[0].device_kind}")
    for P in (20000, 100000):
        run_size(P, 262144, 256, rng)
    if args.big:
        # 2M tris: 12 attr planes * 4 B = 92 MB of tables — past the VMEM
        # grant. The resident path should fail to fit; stream must run.
        # K=1024 keeps the visit-list SMEM rows small (C=1954: ~61 KB per
        # 8-tile block; K=256's C=7813 would want ~500 KB of SMEM).
        run_size(2_000_000, 65536, 1024, rng, streams=(True,))
        run_size(2_000_000, 65536, 1024, rng, streams=(False,))


if __name__ == "__main__":
    main()
