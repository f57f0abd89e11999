"""Round-4 config-5 diagnosis AT 4K CHUNK WIDTHS (VERDICT r3 item 1b).

The round-3 supercluster A/B measured 'super' slower at 384x384 widths
(T=1152 tiles/call), but the kernel docstring records a 15.7 ms FLAT plan
call at the 4K chunk width (T=4096) — the regime where config 5-SPEC
actually runs (rays_per_chunk=2^19). This script decomposes plan vs walk
at T=4096 on the real 100k mesh with the round-3 auto defaults
(K=128, tile=128, fuse=4, trav_block=8) and A/Bs plan='ray' vs 'super'
per bounce state, with floor-proof x`N`-fused timing.

    python benchmarks/diag_4k.py [--n 48]
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

CHUNK = 1 << 19  # the production rays_per_chunk at 4K


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
    ap.add_argument("--n", type=int, default=48)
    ap.add_argument("--k", type=int, default=0, help="0 = auto")
    ap.add_argument("--tile", type=int, default=128)
    ap.add_argument("--fuse", type=int, default=4)
    ap.add_argument("--tb", type=int, default=8)
    args = ap.parse_args()
    N = args.n

    print(f"device={jax.devices()[0].device_kind}", flush=True)
    W, H = 3840, 2160
    base = builders.mesh_scene(W, H, uv_res=224)  # 100,352 tris
    kw_c = {} if args.k == 0 else {"cluster_size": args.k}
    scene = accel.with_pallas_clusters(base, **kw_c)
    cp = scene.tri_clusters
    print(f"C={cp.num_clusters} K={cp.cluster_size}", flush=True)
    pol = RendererPolicy(accel="pallas", ray_order="tile", max_bounces=8,
                         pallas_tile_rays=args.tile, pallas_fuse=args.fuse,
                         pallas_trav_block=args.tb)

    npix = W * H
    # the FIRST production chunk: tile-ordered pixels [0, CHUNK)
    ray = jnp.arange(CHUNK, dtype=jnp.uint32)
    perm_np = RR._tile_pixel_order_np(W, npix)
    i = jnp.asarray(perm_np[:CHUNK])[ray]
    x = (i % jnp.uint32(W)).astype(jnp.int32)
    y = (i // jnp.uint32(W)).astype(jnp.int32)
    seeds = RR.pixel_seeds_from_index(i, W, pol)
    acc = jnp.uint32(0)
    p0, d0 = RR.generate_camera_rays(scene.camera, x, y, acc, seeds, False,
                                     pol)
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

    tile_r = args.tile
    t_tiles = -(-(-(-CHUNK // tile_r)) // 8) * 8
    rp = t_tiles * tile_r
    print(f"T={t_tiles} tiles/call", flush=True)

    def bench_state(tag, st):
        alive = st.alive
        n_alive = int(jnp.sum(alive))
        p, d = st.p, st.d
        valid = alive.astype(jnp.float32)
        plan_tf = jnp.where(alive, jnp.full((CHUNK,), tk.FLT_MAX), 0.0)
        ray_in = tk._ray_cols(
            [(p.x, 1e30), (p.y, 1e30), (p.z, 1e30),
             (d.x, 1.0), (d.y, 1.0), (d.z, 1.0),
             (plan_tf, 0.0), (valid, 0.0)], rp)

        out = {}
        for plan in ("ray", "super"):
            @jax.jit
            def run_plan(ri=tuple(ray_in), plan=plan):
                def stp(i2, a):
                    ri2 = (ri[0] + jnp.float32(i2) * 1e-7,) + ri[1:]
                    _, e, nv = tk._plan_visits(cp, list(ri2), t_tiles,
                                               tile_r, True, False, plan)
                    return a + e[0, 0] + nv[0, 0].astype(jnp.float32)
                return jax.lax.fori_loop(0, N, stp, jnp.float32(0))

            @jax.jit
            def run_closest(plan=plan):
                def stp(i2, a):
                    eps = jnp.float32(i2) * 1e-7
                    tf, prim = tk.intersect_clustered_pallas(
                        cp, Vec3(p.x + eps, p.y, p.z), d, alive=alive,
                        tile_r=tile_r, fuse=args.fuse, trav_block=args.tb,
                        plan=plan)
                    return a + tf[0] + prim.astype(jnp.float32)[0]
                return jax.lax.fori_loop(0, N, stp, jnp.float32(0))

            @jax.jit
            def run_shadow(plan=plan):
                tf_sh = jnp.where(alive, 10.0, 0.0)
                def stp(i2, a):
                    eps = jnp.float32(i2) * 1e-7
                    occ = tk.occluded_clustered_pallas(
                        cp, Vec3(p.x + eps, p.y, p.z), d, tf_sh,
                        tile_r=tile_r, fuse=args.fuse, trav_block=args.tb,
                        plan=plan)
                    return a + occ.astype(jnp.float32)[0]
                return jax.lax.fori_loop(0, N, stp, jnp.float32(0))

            out[plan] = (
                (best_s(run_plan) - floor) * 1e3 / N,
                (best_s(run_closest) - floor) * 1e3 / N,
                (best_s(run_shadow) - floor) * 1e3 / N,
            )

        # visit stats (plan-independent: identical lists by construction)
        _, _, nvis = jax.jit(
            lambda ri: tk._plan_visits(cp, ri, t_tiles, tile_r, True, False)
        )(ray_in)
        nv = np.asarray(nvis[:, 0])
        pr, cr, sr = out["ray"]
        ps, cs, ss = out["super"]
        print(
            f"{tag}: alive={n_alive:7d} nvis mean={nv.mean():6.1f} "
            f"p95={np.percentile(nv, 95):5.0f}\n"
            f"   plan='ray'  : plan {pr:7.2f}  closest {cr:7.2f}  "
            f"shadow {sr:7.2f} ms\n"
            f"   plan='super': plan {ps:7.2f}  closest {cs:7.2f}  "
            f"shadow {ss:7.2f} ms",
            flush=True,
        )

    for b in range(3):
        bench_state(f"b{b}", state)
        state = step(state)
        jax.block_until_ready(state.p.x)


if __name__ == "__main__":
    main()
