"""Where does the 20k-mesh pass spend its time? Decompose the production
pallas config (auto K/tile/fuse) into: closest traversal, shadow traversal
(ablated via emission=0 -> NEE+shadow skipped), per-bounce scaling, and the
isolated kernel cost at camera-ray conditions. All timings are fused
multi-iteration inside one jit (the axon tunnel has a ~27 ms dispatch
floor that otherwise dominates).

    python benchmarks/diag_mesh3.py
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from cpu_raytracing_experiments_tpu.ops.pallas import traverse_kernel as tk
from cpu_raytracing_experiments_tpu.render import estimator
from cpu_raytracing_experiments_tpu.scene import accel as accel_mod
from cpu_raytracing_experiments_tpu.scene import builders
from cpu_raytracing_experiments_tpu.utils.config import RendererPolicy
from cpu_raytracing_experiments_tpu.core.vec import Vec3

W = H = 384
PASSES = 8


def fence(x):
    # block WITHOUT fetching: a full np.asarray drags the whole leaf
    # through the ~65 MB/s axon tunnel (8.8 MB buckets = ~135 ms of fake
    # cost per call); block + 4-byte probe is artifact-free
    jax.block_until_ready(x)
    np.asarray(jax.tree.leaves(x)[0].ravel()[:1])


def time_pass(scene, pol, reps=3):
    state = estimator.RenderState.create(W, H, pol)
    run = jax.jit(lambda s: estimator.accumulate_n(scene, pol, s, W, H, PASSES))
    out = run(state); fence(out)
    best = 1e30
    for _ in range(reps):
        t0 = time.perf_counter()
        out = run(state); fence(out)
        best = min(best, time.perf_counter() - t0)
    return best * 1e3 / PASSES


def main():
    print(f"device={jax.devices()[0].device_kind}", flush=True)
    scene = accel_mod.with_pallas_clusters(builders.mesh_scene(W, H, subdivisions=5))
    pol = RendererPolicy(max_bounces=8, rays_per_chunk=W * H, accel="pallas")
    base = time_pass(scene, pol)
    print(f"production pass: {base:.2f} ms", flush=True)

    # emission=0: light list empty -> NEE + shadow traversal skipped
    mat = scene.materials
    dark = dataclasses.replace(
        scene,
        materials=dataclasses.replace(
            mat, emission=Vec3(mat.emission.x * 0, mat.emission.y * 0,
                               mat.emission.z * 0)),
        lights=jnp.zeros((0,), jnp.int32),
    )
    noshadow = time_pass(dark, pol)
    print(f"no-light pass (no NEE/shadow): {noshadow:.2f} ms "
          f"(shadow+NEE = {base - noshadow:.2f})", flush=True)

    for b in (1, 2, 4):
        ms = time_pass(scene, dataclasses.replace(pol, max_bounces=b))
        print(f"max_bounces={b}: {ms:.2f} ms/pass", flush=True)

    # isolated kernels at camera-ray conditions, fused xN inside one jit
    cp = scene.tri_clusters
    print(f"clusters: C={cp.num_clusters} K={cp.cluster_size}", flush=True)
    from cpu_raytracing_experiments_tpu.render.renderer import generate_camera_rays
    R = W * H
    pix = jnp.arange(R, dtype=jnp.uint32)
    x = (pix % W).astype(jnp.float32)
    y = (pix // W).astype(jnp.float32)
    seeds = pix * jnp.uint32(33)
    p0, d0 = jax.jit(lambda: generate_camera_rays(
        scene.camera, x, y, jnp.uint32(0), seeds, False))()
    N = 8

    @jax.jit
    def closest_n():
        def step(i, carry):
            t, _ = tk.intersect_clustered_pallas(
                cp, p0, d0, tfar0=carry, tile_r=256, fuse=4, trav_block=8)
            return jnp.where(t < 1e30, t * 1.0000001 + i * 0.0, 1e30 + carry * 0)
        return jax.lax.fori_loop(
            0, N, step, jnp.full((R,), 3.4e38, jnp.float32))

    @jax.jit
    def shadow_n():
        def step(i, carry):
            occ = tk.occluded_clustered_pallas(
                cp, p0, d0, carry, tile_r=256, fuse=4, trav_block=8)
            return jnp.where(occ, carry * 0.999999, carry)
        return jax.lax.fori_loop(
            0, N, step, jnp.full((R,), 8.0, jnp.float32))

    @jax.jit
    def plan_n():
        cols = tk._ray_cols(
            [(p0.x, 1e30), (p0.y, 1e30), (p0.z, 1e30), (d0.x, 1.0),
             (d0.y, 1.0), (d0.z, 1.0),
             (jnp.full((R,), 3.4e38, jnp.float32), 0.0),
             (jnp.ones((R,), jnp.float32), 0.0)], R)

        def step(i, acc):
            _, entry, nv = tk._plan_visits(cp, cols, R // 256, 256, True,
                                           False, "ray", 8)
            return acc + entry[0, 0] + nv[0, 0]
        return jax.lax.fori_loop(0, N, step, jnp.float32(0))

    for name, fn in (("closest(camera)", closest_n),
                     ("shadow(camera)", shadow_n),
                     ("plan+sort only", plan_n)):
        out = fn(); fence(out)
        best = 1e30
        for _ in range(5):
            t0 = time.perf_counter(); out = fn(); fence(out)
            best = min(best, time.perf_counter() - t0)
        print(f"isolated {name}: {best*1e3/N:.2f} ms", flush=True)

    # visit statistics at camera rays
    cols = tk._ray_cols(
        [(p0.x, 1e30), (p0.y, 1e30), (p0.z, 1e30), (d0.x, 1.0),
         (d0.y, 1.0), (d0.z, 1.0),
         (jnp.full((R,), 3.4e38, jnp.float32), 0.0),
         (jnp.ones((R,), jnp.float32), 0.0)], R)
    _, entry, nvis = jax.jit(lambda: tk._plan_visits(
        cp, cols, R // 256, 256, True, False, "ray", 8))()
    nv = np.asarray(nvis).ravel()
    print(f"visits/tile: mean {nv.mean():.1f} p50 {np.percentile(nv,50):.0f} "
          f"p90 {np.percentile(nv,90):.0f} max {nv.max()} of C={cp.num_clusters}, "
          f"T={nv.size} tiles", flush=True)


if __name__ == "__main__":
    main()
