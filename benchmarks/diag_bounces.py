"""Per-bounce instrumentation of the REAL mesh render: drive bounce_step
eagerly, and at each bounce report alive counts, per-tile planned-visit
stats (nvis) for the closest-hit traversal in tile vs raster ray order,
and the wall time of each bounce's intersect."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from cpu_raytracing_experiments_tpu.core.vec import Vec3
from cpu_raytracing_experiments_tpu.ops.pallas import traverse_kernel as tk
from cpu_raytracing_experiments_tpu.render import renderer as RR
from cpu_raytracing_experiments_tpu.scene import accel, builders
from cpu_raytracing_experiments_tpu.utils.config import RendererPolicy


def main():
    W = H = 384
    scene = accel.with_pallas_clusters(builders.mesh_scene(W, H, subdivisions=5))
    cp = scene.tri_clusters
    npix = W * H

    for order in ("raster", "tile"):
        pol = RendererPolicy(accel="pallas", ray_order=order, max_bounces=8)
        ray = jnp.arange(npix, dtype=jnp.uint32)
        perm_np = RR._tile_pixel_order_np(W, npix) if order == "tile" else None
        i = ray if perm_np is None else jnp.asarray(perm_np)[ray]
        x = (i % jnp.uint32(W)).astype(jnp.int32)
        y = (i // jnp.uint32(W)).astype(jnp.int32)
        seeds = RR.pixel_seeds_from_index(i, W, pol)
        acc = jnp.uint32(0)
        p0, d0 = RR.generate_camera_rays(scene.camera, x, y, acc, seeds, False, pol)
        zero = p0.x * 0.0
        state = RR.PathState(
            p=p0, d=d0,
            radiance=Vec3(zero, zero, zero),
            throughput=Vec3(zero + 1.0, zero + 1.0, zero + 1.0),
            prev_pdf=zero, prev_delta=zero > 1.0,
            alive=zero < 1.0, bounce=jnp.uint32(0),
            ray_count=jnp.uint32(0),
        )
        step = jax.jit(lambda s: RR.bounce_step(scene, pol, acc, seeds, s))
        print(f"== order={order}")
        tile_r = 256
        for b in range(8):
            alive = state.alive
            n_alive = int(jnp.sum(alive))
            if n_alive == 0:
                break
            # planned visits for this bounce's closest-hit
            t_tiles = -(-(-(-npix // tile_r)) // 8) * 8
            rp = t_tiles * tile_r
            valid = alive.astype(jnp.float32)
            tfar0 = jnp.full((npix,), tk.FLT_MAX)
            plan_tf = jnp.where(alive, tfar0, 0.0)
            ray_in = tk._ray_cols(
                [(state.p.x, 1e30), (state.p.y, 1e30), (state.p.z, 1e30),
                 (state.d.x, 1.0), (state.d.y, 1.0), (state.d.z, 1.0),
                 (plan_tf, 0.0), (valid, 0.0)], rp)
            _, _, nvis = jax.jit(
                lambda ri: tk._plan_visits(cp, ri, t_tiles, tile_r, True, False)
            )(ray_in)
            nv = np.asarray(nvis[:, 0])
            t0 = time.perf_counter()
            new_state = step(state)
            jax.block_until_ready(new_state.p.x)
            dt = (time.perf_counter() - t0) * 1e3
            print(f" b{b}: alive={n_alive:6d} nvis mean={nv.mean():6.1f} "
                  f"p95={np.percentile(nv,95):5.0f} sum={nv.sum():7d} "
                  f"bounce_ms={dt:7.2f}")
            state = new_state


if __name__ == "__main__":
    main()
