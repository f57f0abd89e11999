"""Round-3 mesh decomposition at the clean-sweep best config (K=64,
tile=128, fuse=4, trav_block=8): per-bounce isolated traversal cost with
floor-proof fused timing (x64 inside one jit, harness floor subtracted),
plus planned-visit stats, on the REAL bounce states.

Context: the round-2 diag numbers (diag_mesh3/diag_plan, 8-16 fused
iterations) split a ~46-130 ms axon dispatch floor across too few calls;
diag_mesh6 re-measured with x128 fusing and found the WALK dominates
(closest 12.9 ms vs plan 1.4 ms at 147k rays, K=256 serial schedule) —
the opposite of the floor-polluted conclusion.

    python benchmarks/diag_mesh7.py [--mesh 20k] [--k 64] [--tile 128]
"""
import argparse
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
    ap.add_argument("--k", type=int, default=64)
    ap.add_argument("--tile", type=int, default=128)
    ap.add_argument("--fuse", type=int, default=4)
    ap.add_argument("--tb", type=int, default=8)
    ap.add_argument("--n", type=int, default=64)
    args = ap.parse_args()
    N = args.n

    print(f"device={jax.devices()[0].device_kind}", flush=True)
    W = H = 384
    base = (builders.mesh_scene(W, H, subdivisions=5) if args.mesh == "20k"
            else builders.mesh_scene(W, H, uv_res=224))
    scene = accel.with_pallas_clusters(base, cluster_size=args.k)
    cp = scene.tri_clusters
    print(f"C={cp.num_clusters} K={cp.cluster_size} fill="
          f"{float((np.asarray(cp.order) >= 0).mean()):.2f}", flush=True)
    npix = W * H

    pol = RendererPolicy(accel="pallas", ray_order="tile", max_bounces=8,
                         pallas_tile_rays=args.tile, pallas_fuse=args.fuse,
                         pallas_trav_block=args.tb, cluster_size=args.k
                         ) if hasattr(RendererPolicy, "cluster_size") else \
          RendererPolicy(accel="pallas", ray_order="tile", max_bounces=8,
                         pallas_tile_rays=args.tile, pallas_fuse=args.fuse,
                         pallas_trav_block=args.tb)

    ray = jnp.arange(npix, dtype=jnp.uint32)
    perm_np = RR._tile_pixel_order_np(W, npix)
    i = jnp.asarray(perm_np)[ray]
    x = (i % jnp.uint32(W)).astype(jnp.int32)
    y = (i // jnp.uint32(W)).astype(jnp.int32)
    seeds = RR.pixel_seeds_from_index(i, W, pol)
    acc = jnp.uint32(0)
    p0, d0 = RR.generate_camera_rays(scene.camera, x, y, acc, seeds, False, pol)
    zero = p0.x * 0.0
    state = RR.PathState(
        p=p0, d=d0, radiance=Vec3(zero, zero, zero),
        throughput=Vec3(zero + 1.0, zero + 1.0, zero + 1.0),
        prev_pdf=zero, prev_delta=zero > 1.0,
        alive=zero < 1.0, bounce=jnp.uint32(0), ray_count=jnp.uint32(0),
    )
    step = jax.jit(lambda s: RR.bounce_step(scene, pol, acc, seeds, s))

    @jax.jit
    def floor_run():
        return jax.lax.fori_loop(0, N, lambda i, a: a + jnp.float32(i),
                                 jnp.float32(0))

    floor = best_s(floor_run)
    print(f"harness floor: {floor*1e3:.1f} ms total over N={N}", flush=True)

    kw = dict(tile_r=args.tile, fuse=args.fuse, trav_block=args.tb)

    def bench_state(tag, st):
        alive = st.alive
        n_alive = int(jnp.sum(alive))
        p, d = st.p, st.d

        # planned-visit stats for this bounce (tile-level culling health)
        tile_r = args.tile
        t_tiles = -(-(-(-npix // tile_r)) // 8) * 8
        rp = t_tiles * tile_r
        valid = alive.astype(jnp.float32)
        plan_tf = jnp.where(alive, jnp.full((npix,), tk.FLT_MAX), 0.0)
        ray_in = tk._ray_cols(
            [(p.x, 1e30), (p.y, 1e30), (p.z, 1e30),
             (d.x, 1.0), (d.y, 1.0), (d.z, 1.0),
             (plan_tf, 0.0), (valid, 0.0)], rp)
        _, _, nvis = jax.jit(
            lambda ri: tk._plan_visits(cp, ri, t_tiles, tile_r, True, False)
        )(ray_in)
        nv = np.asarray(nvis[:, 0])

        @jax.jit
        def run_closest():
            def stp(i2, a):
                eps = jnp.float32(i2) * 1e-7
                tf, prim = tk.intersect_clustered_pallas(
                    cp, Vec3(p.x + eps, p.y, p.z), d, alive=alive, **kw)
                return a + tf[0] + prim.astype(jnp.float32)[0]
            return jax.lax.fori_loop(0, N, stp, jnp.float32(0))

        @jax.jit
        def run_shadow():
            tf_sh = jnp.where(alive, 10.0, 0.0)
            def stp(i2, a):
                eps = jnp.float32(i2) * 1e-7
                occ = tk.occluded_clustered_pallas(
                    cp, Vec3(p.x + eps, p.y, p.z), d, tf_sh, **kw)
                return a + occ.astype(jnp.float32)[0]
            return jax.lax.fori_loop(0, N, stp, jnp.float32(0))

        c_ms = (best_s(run_closest) - floor) * 1e3 / N
        s_ms = (best_s(run_shadow) - floor) * 1e3 / N
        print(f"{tag}: alive={n_alive:6d} nvis mean={nv.mean():6.1f} "
              f"p95={np.percentile(nv, 95):5.0f} sum={nv.sum():7d} | "
              f"closest {c_ms:7.3f} ms  shadow {s_ms:7.3f} ms", flush=True)

    for b in range(3):
        bench_state(f"b{b}", state)
        state = step(state)
        jax.block_until_ready(state.p.x)


if __name__ == "__main__":
    main()
