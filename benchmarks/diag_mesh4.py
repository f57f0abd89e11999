"""Ablate the bounce-1 mesh pass: where do 54 ms go when the isolated
traversal kernels only account for ~24?

    python benchmarks/diag_mesh4.py
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from cpu_raytracing_experiments_tpu.render import estimator
from cpu_raytracing_experiments_tpu.scene import accel as accel_mod
from cpu_raytracing_experiments_tpu.scene import builders
from cpu_raytracing_experiments_tpu.utils.config import RendererPolicy

W = H = 384
PASSES = 8


def fence(x):
    # block WITHOUT fetching: a full np.asarray drags the whole leaf
    # through the ~65 MB/s axon tunnel (8.8 MB buckets = ~135 ms of fake
    # cost per call); block + 4-byte probe is artifact-free
    jax.block_until_ready(x)
    np.asarray(jax.tree.leaves(x)[0].ravel()[:1])


def time_pass(scene, pol, reps=4):
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
    base_pol = RendererPolicy(max_bounces=8, rays_per_chunk=W * H, accel="pallas")

    for label, pol in (
        ("b=8 production", base_pol),
        ("b=1", dataclasses.replace(base_pol, max_bounces=1)),
        ("b=1 mis=False", dataclasses.replace(base_pol, max_bounces=1, mis=False)),
        ("b=1 mis=False raster", dataclasses.replace(
            base_pol, max_bounces=1, mis=False, ray_order="raster")),
        ("b=1 raster", dataclasses.replace(
            base_pol, max_bounces=1, ray_order="raster")),
        ("b=8 raster", dataclasses.replace(base_pol, ray_order="raster")),
        ("b=1 tile_r=256 fuse=4 tb=8", dataclasses.replace(
            base_pol, max_bounces=1, pallas_tile_rays=256, pallas_fuse=4,
            pallas_trav_block=8)),
        ("b=8 tile_r=256 fuse=4 tb=8", dataclasses.replace(
            base_pol, pallas_tile_rays=256, pallas_fuse=4,
            pallas_trav_block=8)),
    ):
        ms = time_pass(scene, pol)
        print(f"{label}: {ms:.2f} ms/pass", flush=True)

    # frame fixed cost: same policy, near-empty geometry (brute battery)
    tiny = builders.mesh_scene(W, H, subdivisions=0)
    pol_tiny = dataclasses.replace(base_pol, accel="brute", max_bounces=1,
                                   mis=False)
    print(f"tiny-scene b=1 mis=False brute: {time_pass(tiny, pol_tiny):.2f} "
          f"ms/pass", flush=True)


if __name__ == "__main__":
    main()
