"""Isolate the traversal PLANNER's cost structure (round 3): diag_mesh3
measured plan+sort = 9.2 ms of the 15.7 ms isolated closest call at the
20k config — the broad phase now outweighs the walk it plans. Sweep the
schedule knobs and decompose battery vs in-kernel sort vs per-program
overhead.

    python benchmarks/diag_plan.py
"""
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

W = H = 384
N = 16


def fence(x):
    jax.block_until_ready(x)
    np.asarray(jax.tree.leaves(x)[0].ravel()[:1])


def best_ms(fn, reps=5):
    out = fn(); fence(out)
    best = 1e30
    for _ in range(reps):
        t0 = time.perf_counter(); out = fn(); fence(out)
        best = min(best, time.perf_counter() - t0)
    return best * 1e3 / N


def main():
    print(f"device={jax.devices()[0].device_kind}", flush=True)
    scene = accel_mod.with_pallas_clusters(
        builders.mesh_scene(W, H, subdivisions=5))
    cp = scene.tri_clusters
    print(f"C={cp.num_clusters} K={cp.cluster_size}", flush=True)
    R = W * H
    pix = jnp.arange(R, dtype=jnp.uint32)
    x = (pix % W).astype(jnp.float32)
    y = (pix // W).astype(jnp.float32)
    seeds = pix * jnp.uint32(33)
    p0, d0 = jax.jit(lambda: generate_camera_rays(
        scene.camera, x, y, jnp.uint32(0), seeds, False))()

    def plan_fn(tile_r, sort, sort_impl, ppb):
        t_tiles = -(-R // tile_r)
        t_tiles = -(-t_tiles // 8) * 8
        rp = t_tiles * tile_r
        cols = tk._ray_cols(
            [(p0.x, 1e30), (p0.y, 1e30), (p0.z, 1e30), (d0.x, 1.0),
             (d0.y, 1.0), (d0.z, 1.0),
             (jnp.full((R,), 3.4e38, jnp.float32), 0.0),
             (jnp.ones((R,), jnp.float32), 0.0)], rp)

        @jax.jit
        def run():
            def step(i, acc):
                _, entry, nv = tk._plan_visits(
                    cp, cols, t_tiles, tile_r, sort, False, "ray", ppb,
                    sort_impl)
                return acc + entry[0, 0] + nv[0, 0] + i * 0.0
            return jax.lax.fori_loop(0, N, step, jnp.float32(0))

        return run

    for label, tile_r, sort, sort_impl, ppb in (
        ("tile=256 sort=kernel ppb=8 (prod)", 256, True, "kernel", 8),
        ("tile=256 sort=kernel ppb=16", 256, True, "kernel", 16),
        ("tile=256 sort=kernel ppb=32", 256, True, "kernel", 32),
        ("tile=256 sort=kernel ppb=64", 256, True, "kernel", 64),
        ("tile=256 nosort(cummin) ppb=8", 256, False, "kernel", 8),
        ("tile=256 sort=xla ppb=8", 256, True, "xla", 8),
        ("tile=128 sort=kernel ppb=8", 128, True, "kernel", 8),
        ("tile=512 sort=kernel ppb=8", 512, True, "kernel", 8),
    ):
        try:
            ms = best_ms(plan_fn(tile_r, sort, sort_impl, ppb))
            print(f"{label}: {ms:.2f} ms", flush=True)
        except Exception as e:
            print(f"{label}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
