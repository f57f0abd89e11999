"""Decompose the new two-phase pallas traversal: plan kernel vs argsort vs
traversal kernel, on camera-like rays; then real render passes A/B."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from cpu_raytracing_experiments_tpu.core.vec import Vec3
from cpu_raytracing_experiments_tpu.ops.pallas import traverse_kernel as tk
from cpu_raytracing_experiments_tpu.scene import accel, builders


def timeit(f, reps=5):
    out = f()
    jax.block_until_ready(out)
    best = 1e30
    for _ in range(reps):
        t0 = time.perf_counter()
        out = f()
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def main():
    W = H = 384
    scene = accel.with_pallas_clusters(builders.mesh_scene(W, H, subdivisions=5))
    cp = scene.tri_clusters
    R = W * H
    rng = np.random.default_rng(0)
    c = scene.camera.pos
    campos = np.array([float(c.x), float(c.y), float(c.z)], np.float32)
    p = Vec3(*[jnp.full((R,), campos[i]) for i in range(3)])
    d = rng.normal(size=(R, 3)).astype(np.float32)
    lo = np.stack([np.asarray(cp.lo.x), np.asarray(cp.lo.y), np.asarray(cp.lo.z)], 1)
    hi = np.stack([np.asarray(cp.hi.x), np.asarray(cp.hi.y), np.asarray(cp.hi.z)], 1)
    centroid = (lo.min(0) + hi.max(0)) / 2
    dc = centroid[None, :] - campos[None, :] + 0.3 * d
    dc /= np.linalg.norm(dc, axis=1, keepdims=True)
    d = Vec3(*[jnp.asarray(dc[:, i]) for i in range(3)])

    tile_r = 256
    t_tiles = -(-(-(-R // tile_r)) // 8) * 8
    rp = t_tiles * tile_r
    tfar0 = jnp.full((R,), tk.FLT_MAX)
    valid = jnp.ones((R,), jnp.float32)
    ray_in = tk._ray_cols(
        [(p.x, 1e30), (p.y, 1e30), (p.z, 1e30), (d.x, 1.0), (d.y, 1.0),
         (d.z, 1.0), (tfar0, 0.0), (valid, 0.0)], rp)

    plan = jax.jit(lambda: tk._plan_visits(cp, ray_in, t_tiles, tile_r, True, False))
    t_plan = timeit(plan)
    plan_nosort = jax.jit(
        lambda: tk._plan_visits(cp, ray_in, t_tiles, tile_r, False, False))
    t_plan_ns = timeit(plan_nosort)
    t_closest = timeit(lambda: tk.intersect_clustered_pallas(cp, p, d))
    alive = jnp.ones((R,), bool)
    coh = jax.jit(lambda: tk.coherence_order(alive, d))
    t_coh = timeit(coh)
    print(f"plan(sorted)={t_plan:.2f}ms plan(nosort)={t_plan_ns:.2f}ms "
          f"closest_total={t_closest:.2f}ms coherence_order={t_coh:.2f}ms")

    # real render passes
    from cpu_raytracing_experiments_tpu.render.api import Renderer
    from cpu_raytracing_experiments_tpu.utils.config import RendererPolicy
    for compact in (False, True):
        pol = RendererPolicy(accel="pallas", pallas_compact=compact)
        r = Renderer(scene, pol)
        r.accumulate(1)
        jax.block_until_ready(r.state.buckets)
        best = 1e30
        for _ in range(3):
            t0 = time.perf_counter()
            r.accumulate(1)
            jax.block_until_ready(r.state.buckets)
            best = min(best, time.perf_counter() - t0)
        print(f"real pass (compact={compact}): {best*1e3:.2f} ms")


if __name__ == "__main__":
    main()
