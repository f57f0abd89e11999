"""dp-scaling shape on the virtual-device CPU mesh: ms/pass vs dp for the
sharded renderer with the narrowing cascade ENGAGED (shard-local since
round 3 — renderer.py no longer gates it off under shard_map).

The box has one physical core, so virtual devices timeshare it: ideal
scaling here is FLAT ms/pass (each shard does 1/dp of the work, dp shards
serialize onto the core). What this records is the scaling SHAPE — that
per-pass cost does not grow with dp (no accidental replication of work, no
cross-shard synchronization in the bounce loop) — plus bit-identity. Real
speedup needs real chips (ROADMAP pod-slice item).

    python benchmarks/dp_scaling.py
"""
import dataclasses
import os
import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from cpu_raytracing_experiments_tpu.parallel import sharded
from cpu_raytracing_experiments_tpu.render.api import Renderer
from cpu_raytracing_experiments_tpu.scene import builders
from cpu_raytracing_experiments_tpu.utils.config import RendererPolicy

W = H = 128
PASSES = 10


def main():
    scene = builders.bvh_test_scene(W, H)
    pol = dataclasses.replace(
        RendererPolicy(max_bounces=8, rays_per_chunk=W * H),
        narrow_wavefront=True,
    )

    r = Renderer(scene, pol, W, H)
    r.accumulate(PASSES)  # warm
    ref = np.asarray(r.state.buckets)
    t0 = time.perf_counter()
    r.accumulate(PASSES)
    jax.block_until_ready(r.state.buckets)
    base_ms = (time.perf_counter() - t0) * 1e3 / PASSES
    print(f"single-device: {base_ms:.1f} ms/pass")

    print("| dp | ms/pass | vs single | bit-identical |")
    print("|---|---|---|---|")
    for dp in (1, 2, 4, 8):
        mesh = sharded.make_mesh(dp=dp, sp=1, devices=jax.devices()[:dp])
        sr = sharded.ShardedRenderer(scene, pol, W, H, mesh)
        sr.accumulate(PASSES)  # warm + correctness
        got = np.asarray(sr.state.buckets).sum(axis=0)
        bit = bool(np.array_equal(got, ref))
        t0 = time.perf_counter()
        sr.accumulate(PASSES)
        jax.block_until_ready(sr.state.buckets)
        ms = (time.perf_counter() - t0) * 1e3 / PASSES
        print(f"| {dp} | {ms:.1f} | {ms / base_ms:.2f}x | {bit} |", flush=True)


if __name__ == "__main__":
    main()
