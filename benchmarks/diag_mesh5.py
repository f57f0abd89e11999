"""Bisect the per-pass fixed cost: time raygen / intersect / one bounce /
full trace on a near-empty scene, each fused x8 inside one jit (amortizes
the ~27 ms axon dispatch floor).

    python benchmarks/diag_mesh5.py
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from cpu_raytracing_experiments_tpu.ops import intersect
from cpu_raytracing_experiments_tpu.render import estimator
from cpu_raytracing_experiments_tpu.render import renderer as rd
from cpu_raytracing_experiments_tpu.scene import builders
from cpu_raytracing_experiments_tpu.utils.config import RendererPolicy

W = H = 384
N = 8
R = W * H


def fence(x):
    # block WITHOUT fetching: a full np.asarray drags the whole leaf
    # through the ~65 MB/s axon tunnel (8.8 MB buckets = ~135 ms of fake
    # cost per call); block + 4-byte probe is artifact-free
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
    scene = builders.mesh_scene(W, H, subdivisions=0)
    pol = dataclasses.replace(
        RendererPolicy(max_bounces=1, rays_per_chunk=R, accel="brute"),
        mis=False)

    pix = jnp.arange(R, dtype=jnp.uint32)
    x = (pix % W).astype(jnp.int32)
    y = (pix // W).astype(jnp.int32)
    seeds = rd.pixel_seeds_from_index(pix, W, pol, 0)

    @jax.jit
    def raygen_n():
        def step(i, acc):
            p0, d0 = rd.generate_camera_rays(
                scene.camera, x, y, jnp.uint32(i), seeds, pol.enable_dof, pol)
            return acc + p0.x[0] + d0.x[0]
        return jax.lax.fori_loop(0, N, step, jnp.float32(0))

    @jax.jit
    def raygen_intersect_n():
        def step(i, acc):
            p0, d0 = rd.generate_camera_rays(
                scene.camera, x, y, jnp.uint32(i), seeds, pol.enable_dof, pol)
            t, pid, _ = intersect.intersect_scene(
                scene, p0, d0, accel="brute", policy=pol)
            return acc + t[0] + pid.astype(jnp.float32)[0]
        return jax.lax.fori_loop(0, N, step, jnp.float32(0))

    @jax.jit
    def one_bounce_n():
        def step(i, acc):
            ai = jnp.uint32(i)
            p0, d0 = rd.generate_camera_rays(
                scene.camera, x, y, ai, seeds, pol.enable_dof, pol)
            rad, cnt = rd.trace_rays(scene, pol, ai, seeds, p0, d0, ())
            return acc + rad.x[0] + cnt.astype(jnp.float32)
        return jax.lax.fori_loop(0, N, step, jnp.float32(0))

    @jax.jit
    def render_pass_n():
        def step(i, acc):
            rad, cnt = rd.render_pass(scene, pol, jnp.uint32(i), W, H)
            return acc + rad.x[0] + cnt.astype(jnp.float32)
        return jax.lax.fori_loop(0, N, step, jnp.float32(0))

    @jax.jit
    def accumulate_n_fn():
        s = estimator.RenderState.create(W, H, pol)
        return estimator.accumulate_n(scene, pol, s, W, H, N)

    for name, fn in (("raygen", raygen_n),
                     ("raygen+intersect", raygen_intersect_n),
                     ("one bounce (trace_rays)", one_bounce_n),
                     ("render_pass", render_pass_n),
                     ("accumulate_n", accumulate_n_fn)):
        print(f"{name}: {best_ms(fn):.2f} ms/pass", flush=True)


if __name__ == "__main__":
    main()
