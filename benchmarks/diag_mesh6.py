"""Floor-proof decomposition of the 20k-mesh pass (round 3).

Earlier per-call numbers (diag_mesh3/diag_plan, N=8..16 fused) carried a
~46-130 ms axon dispatch floor split across too few iterations — at N=16
that's ~3-8 ms/call of fake cost, the same order as the signal. Here every
quantity is fused x128 inside one jit and the empty-loop floor is measured
and subtracted explicitly.

    python benchmarks/diag_mesh6.py [--mesh 20k] [--size 384]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from cpu_raytracing_experiments_tpu.ops.pallas import traverse_kernel as tk
from cpu_raytracing_experiments_tpu.render.renderer import generate_camera_rays
from cpu_raytracing_experiments_tpu.scene import accel as accel_mod
from cpu_raytracing_experiments_tpu.scene import builders


def fence(x):
    jax.block_until_ready(x)
    np.asarray(jax.tree.leaves(x)[0].ravel()[:1])


def best_s(fn, reps=4):
    out = fn(); fence(out)
    best = 1e30
    for _ in range(reps):
        t0 = time.perf_counter(); out = fn(); fence(out)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mesh", default="20k", choices=["20k", "100k"])
    ap.add_argument("--size", type=int, default=384)
    ap.add_argument("--n", type=int, default=128)
    args = ap.parse_args()
    N = args.n

    print(f"device={jax.devices()[0].device_kind}", flush=True)
    w = h = args.size
    base = (builders.mesh_scene(w, h, subdivisions=5) if args.mesh == "20k"
            else builders.mesh_scene(w, h, uv_res=224))
    scene = accel_mod.with_pallas_clusters(base)
    cp = scene.tri_clusters
    print(f"C={cp.num_clusters} K={cp.cluster_size}", flush=True)
    R = w * h
    pix = jnp.arange(R, dtype=jnp.uint32)
    x = (pix % w).astype(jnp.float32)
    y = (pix // w).astype(jnp.float32)
    seeds = pix * jnp.uint32(33)
    p0, d0 = jax.jit(lambda: generate_camera_rays(
        scene.camera, x, y, jnp.uint32(0), seeds, False))()

    # empty-loop floor (same harness shape, no pallas)
    @jax.jit
    def floor_run():
        def step(i, acc):
            return acc + jnp.float32(i)
        return jax.lax.fori_loop(0, N, step, jnp.float32(0))

    floor = best_s(floor_run)
    print(f"harness floor: {floor*1e3:.1f} ms total", flush=True)

    def at_width(n_rays):
        # jitter positions a hair per fused step so XLA can't CSE the call
        px = p0.x[:n_rays]; py = p0.y[:n_rays]; pz = p0.z[:n_rays]
        dx = d0.x[:n_rays]; dy = d0.y[:n_rays]; dz = d0.z[:n_rays]
        return (px, py, pz, dx, dy, dz)

    from cpu_raytracing_experiments_tpu.core.vec import Vec3

    def bench(label, make_step, n_rays):
        px, py, pz, dx, dy, dz = at_width(n_rays)

        @jax.jit
        def run():
            def step(i, acc):
                eps = jnp.float32(i) * 1e-7
                p = Vec3(px + eps, py, pz)
                d = Vec3(dx, dy, dz)
                return acc + make_step(p, d)
            return jax.lax.fori_loop(0, N, step, jnp.float32(0))

        ms = (best_s(run) - floor) * 1e3 / N
        print(f"{label} @ {n_rays}: {ms:.3f} ms/call", flush=True)
        return ms

    t_tiles = lambda n: -(-(-(-n // 256)) // 8) * 8

    def plan_only(p, d):
        tt = t_tiles(p.x.shape[0])
        rp = tt * 256
        cols = tk._ray_cols(
            [(p.x, 1e30), (p.y, 1e30), (p.z, 1e30), (d.x, 1.0),
             (d.y, 1.0), (d.z, 1.0),
             (jnp.full_like(p.x, 3.4e38), 0.0),
             (jnp.ones_like(p.x), 0.0)], rp)
        _, entry, nv = tk._plan_visits(cp, cols, tt, 256, True, False,
                                       "ray", 8, "kernel")
        return entry[0, 0] + nv.astype(jnp.float32)[0, 0]

    def closest(p, d):
        tf, prim = tk.intersect_clustered_pallas(cp, p, d)
        return tf[0] + prim.astype(jnp.float32)[0]

    def shadow(p, d):
        occ = tk.occluded_clustered_pallas(
            cp, p, d, jnp.full_like(p.x, 10.0))
        return occ.astype(jnp.float32)[0]

    for n_rays in (147456, 36864, 4608):
        if n_rays > R:
            continue
        p_ = bench("plan-only", plan_only, n_rays)
        c_ = bench("closest (plan+walk)", closest, n_rays)
        s_ = bench("shadow  (plan+walk)", shadow, n_rays)
        print(f"  -> walk share: closest {c_-p_:.3f} ms, shadow {s_-p_:.3f} ms",
              flush=True)


if __name__ == "__main__":
    main()
