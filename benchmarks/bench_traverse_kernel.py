"""Standalone A/B of the Pallas clustered-traversal kernel vs the brute
battery (and the XLA lax.cond clustered backend) on TPU.

Run:  python benchmarks/bench_traverse_kernel.py [--tris]
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
from cpu_raytracing_experiments_tpu.ops import clustered, intersect
from cpu_raytracing_experiments_tpu.ops.pallas import traverse_kernel as tk


def timeit(fn, *args, reps=5, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    best = 1e30
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best * 1e3, out


def make_spheres(P, rng):
    centers = rng.uniform(-5, 5, (P, 3)).astype(np.float32)
    radii = rng.uniform(0.1, 0.5, P).astype(np.float32)
    rows = np.concatenate([centers, (radii ** 2)[:, None]], axis=1)
    mins, maxs = centers - radii[:, None], centers + radii[:, None]
    geom = (
        Vec3(*[jnp.asarray(centers[:, i]) for i in range(3)]),
        jnp.asarray(radii ** 2),
    )
    return mins, maxs, rows, geom


def make_tris(P, rng):
    # random small triangles scattered in the box (mesh-like local extent)
    v0 = rng.uniform(-5, 5, (P, 3)).astype(np.float32)
    e1 = rng.normal(0, 0.15, (P, 3)).astype(np.float32)
    e2 = rng.normal(0, 0.15, (P, 3)).astype(np.float32)
    rows = np.concatenate([v0, e1, e2], axis=1)
    pts = np.stack([v0, v0 + e1, v0 + e2], axis=0)
    mins, maxs = pts.min(axis=0), pts.max(axis=0)
    geom = tuple(
        Vec3(*[jnp.asarray(a[:, i]) for i in range(3)]) for a in (v0, e1, e2)
    )
    return mins, maxs, rows, geom


def make_rays(R, rng, coherent):
    if coherent:
        # camera-like: common origin, directions over a frustum grid
        side = int(np.sqrt(R))
        u, v = np.meshgrid(
            np.linspace(-0.4, 0.4, side), np.linspace(-0.4, 0.4, side)
        )
        d = np.stack([u.ravel(), v.ravel(), -np.ones(side * side)], axis=1)
        d = np.concatenate([d, d[: R - side * side]], axis=0)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        p = np.tile(np.array([[0.0, 0.0, 12.0]], np.float32), (R, 1))
    else:
        p = rng.uniform(-6, 6, (R, 3))
        d = rng.normal(size=(R, 3))
        d /= np.linalg.norm(d, axis=1, keepdims=True)
    return (
        Vec3(*[jnp.asarray(p[:, i].astype(np.float32)) for i in range(3)]),
        Vec3(*[jnp.asarray(d[:, i].astype(np.float32)) for i in range(3)]),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tris", action="store_true")
    ap.add_argument("--prims", type=int, default=0)
    ap.add_argument("--rays", type=int, default=262144)
    ap.add_argument("--alive-frac", type=float, default=1.0)
    args = ap.parse_args()

    rng = np.random.default_rng(7)
    P = args.prims or (20000 if args.tris else 1000)
    R = args.rays
    kind = "triangle" if args.tris else "sphere"
    mins, maxs, rows, geom = (make_tris if args.tris else make_spheres)(P, rng)
    print(f"device={jax.devices()[0].device_kind}  kind={kind}  P={P}  R={R}")

    def brute(p, d):
        if args.tris:
            return intersect.intersect_triangles(p, d, *geom)
        return intersect.intersect_spheres(p, d, *geom)

    brute_j = jax.jit(brute)

    for coherent in (True, False):
        p, d = make_rays(R, rng, coherent)
        alive = None
        if args.alive_frac < 1.0:
            alive = jnp.asarray(rng.uniform(size=R) < args.alive_frac)
        label = "coherent" if coherent else "incoherent"
        ms_b, (t_ref, id_ref) = timeit(brute_j, p, d)
        gtests = R * P / ms_b / 1e6
        print(f"[{label}] brute: {ms_b:8.2f} ms  ({gtests:6.1f} Gtests/s)  hits={float(jnp.mean(id_ref >= 0)):.3f}")
        for K in (128, 256):
            C = -(-P // K)
            cp = clustered.build_clusters(mins, maxs, rows, num_clusters=C, kind=kind)
            for tile_r in (128, 256, 512):
                for sort in (True, False):
                    try:
                        ms, (t_pk, id_pk) = timeit(
                            tk.intersect_clustered_pallas, cp, p, d,
                            alive=alive, tile_r=tile_r, sort=sort,
                        )
                    except Exception as e:  # noqa: BLE001
                        print(f"  pallas K={cp.cluster_size} tile={tile_r} sort={int(sort)}: FAIL {type(e).__name__}: {e}")
                        continue
                    if alive is None:
                        okk = bool(jnp.all(id_pk == id_ref))
                    else:
                        okk = bool(jnp.all(jnp.where(alive, id_pk == id_ref, id_pk == -1)))
                    print(
                        f"  pallas K={cp.cluster_size} C={cp.num_clusters} tile={tile_r} "
                        f"sort={int(sort)}: {ms:8.2f} ms  ({ms_b/ms:5.2f}x)  exact={okk}"
                    )
        # XLA clustered baseline (64 clusters, its best config)
        cp64 = clustered.build_clusters(mins, maxs, rows, num_clusters=min(64, P), kind=kind)
        cl_j = jax.jit(lambda p_, d_: clustered.intersect_clustered(cp64, p_, d_))
        ms_c, (t_c, id_c) = timeit(cl_j, p, d)
        print(f"  xla-clustered C=64: {ms_c:8.2f} ms  ({ms_b/ms_c:5.2f}x)  exact={bool(jnp.all(id_c == id_ref))}")
        # shadow
        tfar = jnp.where(id_ref >= 0, t_ref * 0.99, 20.0)
        sh_b = jax.jit(
            (lambda p_, d_, tf: intersect.occluded_triangles(p_, d_, tf, *geom))
            if args.tris
            else (lambda p_, d_, tf: intersect.occluded_spheres(p_, d_, tf, *geom))
        )
        ms_sb, occ_ref = timeit(sh_b, p, d, tfar)
        cp128 = clustered.build_clusters(mins, maxs, rows, num_clusters=-(-P // 128), kind=kind)
        ms_sp, occ_pk = timeit(tk.occluded_clustered_pallas, cp128, p, d, tfar, tile_r=256)
        print(
            f"  shadow brute {ms_sb:8.2f} ms vs pallas {ms_sp:8.2f} ms "
            f"({ms_sb/ms_sp:5.2f}x)  exact={bool(jnp.all(occ_pk == occ_ref))}"
        )


if __name__ == "__main__":
    main()
