"""Diagnose config 2 (1k-sphere field, 512x512, 8 bounces): where does the
pass time go, and what can cluster culling buy?

Measures: standalone sphere battery Gtests/s at config-2 shapes, full
renderer ms/pass for brute vs pallas tile_r sweep, and planner visit
statistics (mean clusters visited per tile per bounce).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from cpu_raytracing_experiments_tpu.core.vec import Vec3
from cpu_raytracing_experiments_tpu.ops import intersect
from cpu_raytracing_experiments_tpu.render.api import Renderer
from cpu_raytracing_experiments_tpu.scene import accel, builders
from cpu_raytracing_experiments_tpu.utils.config import RendererPolicy

W = H = 512


def fence(x):
    # true host-read fence: index a scalar ON DEVICE, transfer 4 bytes
    # (np.asarray of a full leaf would time the tunnel bandwidth instead)
    leaf = jax.tree.leaves(x)[0]
    float(leaf.ravel()[0])


def timeit(fn, reps=3):
    fn()  # warm
    best = 1e30
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def main():
    print("device:", jax.devices()[0].device_kind, flush=True)
    scene = builders.random_spheres_scene(W, H, num_spheres=1000)
    R = W * H
    P = int(scene.spheres.count)

    # --- standalone battery throughput at config-2 shapes
    rng = np.random.default_rng(0)
    p = Vec3(*[jnp.asarray(rng.uniform(-6, 6, R).astype(np.float32)) for _ in range(3)])
    dn = rng.normal(size=(R, 3)).astype(np.float32)
    dn /= np.linalg.norm(dn, axis=1, keepdims=True)
    d = Vec3(*[jnp.asarray(dn[:, i]) for i in range(3)])
    sp = scene.spheres
    bat = jax.jit(lambda p, d: intersect.intersect_spheres(p, d, sp.center, sp.radius_sq))
    out = bat(p, d)
    fence(out)
    ms = timeit(lambda: fence(bat(p, d)))
    print(f"battery standalone: {ms:.2f} ms for {R}x{P} = {R*P/ms/1e6:.1f} Gtests/s", flush=True)

    # --- full renderer: brute
    pol = RendererPolicy(max_bounces=8)
    r = Renderer(scene, pol, W, H)
    r.accumulate(1); fence(r.state.buckets)
    ms_brute = timeit(lambda: (r.accumulate(1), fence(r.state.buckets)))
    print(f"renderer brute: {ms_brute:.1f} ms/pass", flush=True)

    # --- pallas sweep
    for k in (128,):
        sc = accel.with_pallas_clusters(scene, cluster_size=k)
        for tile_r in (128, 256, 512, 1024):
            pol = RendererPolicy(max_bounces=8, accel="pallas", pallas_tile_rays=tile_r)
            rp = Renderer(sc, pol, W, H)
            rp.accumulate(1); fence(rp.state.buckets)
            ms_p = timeit(lambda: (rp.accumulate(1), fence(rp.state.buckets)))
            print(f"pallas K={k} tile_r={tile_r}: {ms_p:.1f} ms/pass "
                  f"({ms_brute/ms_p:.2f}x vs brute)", flush=True)

    # --- planner visit statistics on primary rays (camera coherent)
    from cpu_raytracing_experiments_tpu.ops.pallas import traverse_kernel as tk
    sc = accel.with_pallas_clusters(scene, cluster_size=128)
    cp = sc.pallas_clusters
    from cpu_raytracing_experiments_tpu.render.renderer import generate_camera_rays
    from cpu_raytracing_experiments_tpu.core import rng as crng
    prim_p, prim_d = generate_camera_rays(
        sc.camera, W, H, jnp.uint32(0), RendererPolicy())[:2]
    for tile_r in (128, 256, 512):
        _, _, nvis, _ = tk._plan_visits(
            cp.lo, cp.hi, prim_p, prim_d,
            jnp.full((R,), 3.4e38), tile_r, True)
        nv = np.asarray(nvis).ravel()
        nv = nv[: R // tile_r]
        print(f"primary visits tile_r={tile_r}: mean {nv.mean():.2f} / "
              f"C={cp.num_clusters}  p50={np.percentile(nv,50):.0f} "
              f"p90={np.percentile(nv,90):.0f}", flush=True)


if __name__ == "__main__":
    main()
