"""Where does the mesh (config 5) pass spend its time?

Times, on the 20k-tri mesh scene at 384x384:
  - plan:    _plan_visits broad phase alone (closest-hit shapes)
  - closest: full intersect_clustered_pallas (plan + kernel)
  - shadow:  occluded_clustered_pallas at full ray count
  - pass:    one full render pass via the public API
Also prints visit-list statistics (how many clusters each tile actually
walks) for camera rays vs diffuse bounce rays.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from cpu_raytracing_experiments_tpu.core.vec import Vec3
from cpu_raytracing_experiments_tpu.ops.pallas import traverse_kernel as tk
from cpu_raytracing_experiments_tpu.render.api import Renderer
from cpu_raytracing_experiments_tpu.scene import builders
from cpu_raytracing_experiments_tpu.utils.config import RendererPolicy


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
    tris = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    W = H = 384
    import math
    subdiv = round(math.log(tris / 20, 4))
    from cpu_raytracing_experiments_tpu.scene import accel
    scene = accel.with_pallas_clusters(builders.mesh_scene(W, H, subdivisions=subdiv))
    cp = scene.tri_clusters
    print(f"tris={20*4**subdiv} clusters={cp.num_clusters} K={cp.cluster_size}")

    R = W * H
    rng = np.random.default_rng(0)
    # camera-like rays: from the camera position toward the mesh
    c = scene.camera.pos
    campos = np.array([float(c.x), float(c.y), float(c.z)], dtype=np.float32)
    p_cam = Vec3(*[jnp.full((R,), campos[i]) for i in range(3)])
    d = rng.normal(size=(R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    # aim roughly at the mesh centroid
    lo = np.stack([np.asarray(cp.lo.x), np.asarray(cp.lo.y), np.asarray(cp.lo.z)], 1)
    hi = np.stack([np.asarray(cp.hi.x), np.asarray(cp.hi.y), np.asarray(cp.hi.z)], 1)
    centroid = (lo.min(0) + hi.max(0)) / 2
    aim = centroid[None, :] - campos[None, :]
    d_cam = aim + 0.3 * d
    d_cam /= np.linalg.norm(d_cam, axis=1, keepdims=True)
    d_cam = Vec3(*[jnp.asarray(d_cam[:, i]) for i in range(3)])
    # bounce-like rays: origins on the mesh surface-ish, random dirs
    po = rng.uniform(lo.min(0), hi.max(0), (R, 3)).astype(np.float32)
    p_bnc = Vec3(*[jnp.asarray(po[:, i]) for i in range(3)])
    d_bnc = Vec3(*[jnp.asarray(d[:, i]) for i in range(3)])

    alive = jnp.ones((R,), bool)
    for name, p, dd in (("camera", p_cam, d_cam), ("bounce", p_bnc, d_bnc)):
        t_full = timeit(lambda: tk.intersect_clustered_pallas(cp, p, dd))
        t_sorted = timeit(
            lambda: tk.intersect_clustered_pallas_compact(cp, p, dd, alive)
        )
        t_shadow = timeit(
            lambda: tk.occluded_clustered_pallas(cp, p, dd, jnp.full((R,), 100.0))
        )
        t_shadow_s = timeit(
            lambda: tk.occluded_clustered_pallas_compact(
                cp, p, dd, jnp.full((R,), 100.0)
            )
        )
        print(
            f"{name}: closest={t_full:.2f}ms closest+sort={t_sorted:.2f}ms "
            f"shadow={t_shadow:.2f}ms shadow+sort={t_shadow_s:.2f}ms"
        )

    pol = RendererPolicy(accel="pallas", max_bounces=8)
    r = Renderer(scene, pol)
    r.accumulate(1)
    t_pass = timeit(lambda: r.accumulate(1), reps=3)
    print(f"full pass: {t_pass:.2f} ms")


if __name__ == "__main__":
    main()
