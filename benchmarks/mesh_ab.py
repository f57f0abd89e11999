"""Mesh-config A/B: clustering method (sah vs morton) x kernel tile size,
one JAX process, incremental JSON-line prints.

    python benchmarks/mesh_ab.py --mesh 20k --grid sah:256,sah:128,morton:256
"""
import argparse
import json
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mesh", default="20k",
                    choices=["20k", "100k", "328k", "1k-spheres"])
    ap.add_argument("--grid", default="morton:256,sah:256,sah:128",
                    help="comma list of method[^K]:tile entries, e.g. "
                         "sah^64:128 for cluster_size=64, tile_r=128")
    ap.add_argument("--passes", type=int, default=64)
    ap.add_argument("--mxu", action="store_true")
    ap.add_argument("--plan", default="ray",
                    choices=["ray", "tilebox", "hybrid", "super", "auto"])
    ap.add_argument("--size", type=int, default=384)
    ap.add_argument("--bounces", type=int, default=8)
    ap.add_argument("--plan-block", type=int, default=8,
                    help="ray-tiles per planner program (multiple of 8)")
    ap.add_argument("--unroll", type=int, default=1, choices=[1, 2, 4, 8],
                    help="cluster visits per traversal-loop trip")
    ap.add_argument("--fuse", nargs="?", const=2, default=0, type=int,
                    help="fused visits per trip (2|4) + loop-carried hit "
                         "state; bare --fuse = 2")
    ap.add_argument("--trav-block", type=int, default=1, choices=[1, 8],
                    help="ray-tiles per traversal program")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from cpu_raytracing_experiments_tpu.render import estimator, renderer
    from cpu_raytracing_experiments_tpu.scene import accel, builders
    from cpu_raytracing_experiments_tpu.utils.config import RendererPolicy

    w = h = args.size
    if args.mesh == "20k":
        base = builders.mesh_scene(w, h, subdivisions=5)
    elif args.mesh == "100k":
        base = builders.mesh_scene(w, h, uv_res=224)
    elif args.mesh == "1k-spheres":
        base = builders.random_spheres_scene(w, h, num_spheres=1000)
    else:
        base = builders.mesh_scene(w, h, subdivisions=7)

    scenes = {}
    for spec in args.grid.split(","):
        method, tile = spec.split(":")
        ksize = 128
        if "^" in method:
            method, ks = method.split("^")
            ksize = int(ks)
        key = (method, ksize)
        if key not in scenes:
            t0 = time.time()
            scenes[key] = accel.with_pallas_clusters(
                base, cluster_size=ksize, method=method)
            cp = scenes[key].tri_clusters or scenes[key].sphere_clusters
            import numpy as np

            order = np.asarray(cp.order)
            print(json.dumps({
                "cluster_build": method, "K": ksize, "mesh": args.mesh,
                "C": cp.num_clusters,
                "fill": round(float((order >= 0).sum() / order.size), 3),
                "build_s": round(time.time() - t0, 1),
            }), flush=True)
        scene = scenes[key]
        policy = RendererPolicy(max_bounces=args.bounces, accel="pallas",
                                pallas_tile_rays=int(tile),
                                pallas_mxu=args.mxu, pallas_plan=args.plan,
                                pallas_plan_block=args.plan_block,
                                pallas_unroll=args.unroll,
                                pallas_fuse=args.fuse,
                                pallas_trav_block=args.trav_block)

        @jax.jit
        def counted(scene, policy=policy):
            return renderer.render_pass(scene, policy, jnp.uint32(1), w, h)

        rad, count = counted(scene)
        jax.block_until_ready(rad)
        rays_per_pass = int(count)

        @partial(jax.jit, donate_argnames=("state",), static_argnames=("policy",))
        def run(scene, state, policy=policy):
            return estimator.accumulate_n(scene, policy, state, w, h,
                                          args.passes)

        state = estimator.RenderState.create(w, h, policy)
        state = run(scene, state)
        jax.block_until_ready(state)
        dt = 1e30
        for _ in range(3):
            s2 = estimator.RenderState.create(w, h, policy)
            jax.block_until_ready(s2)
            t0 = time.perf_counter()
            s2 = run(scene, s2)
            jax.block_until_ready(s2)
            dt = min(dt, time.perf_counter() - t0)
        per_pass = dt / args.passes
        print(json.dumps({
            "mesh": args.mesh, "method": method, "K": ksize,
            "tile": int(tile), "mxu": args.mxu, "plan": args.plan,
            "plan_block": args.plan_block, "unroll": args.unroll,
            "fuse": args.fuse, "trav_block": args.trav_block,
            "ms_per_pass": round(per_pass * 1e3, 2),
            "Mrays_per_s": round(rays_per_pass / per_pass / 1e6, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
