"""Quick per-config A/B driver: measures ms/pass + Mrays/s for a chosen
subset of the BASELINE configs with incremental printing (sweep.py only
reports at the end — useless under a watchdog timeout). Usage:

    python benchmarks/quick_ab.py --configs 1,2,3,4 [--passes 10]
"""
import argparse
import dataclasses
import json
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def measure(name, scene, policy, width, height, passes=10):
    import jax
    import jax.numpy as jnp

    from cpu_raytracing_experiments_tpu.render import estimator, renderer

    @jax.jit
    def counted(scene):
        return renderer.render_pass(scene, policy, jnp.uint32(1), width, height)

    rad, count = counted(scene)
    jax.block_until_ready(rad)
    rays_per_pass = int(count)

    @partial(jax.jit, donate_argnames=("state",))
    def run(scene, state):
        return estimator.accumulate_n(scene, policy, state, width, height, passes)

    state = estimator.RenderState.create(width, height, policy)
    state = run(scene, state)
    jax.block_until_ready(state)
    dt = 1e30
    for _ in range(3):
        state2 = estimator.RenderState.create(width, height, policy)
        jax.block_until_ready(state2)
        t0 = time.perf_counter()
        state2 = run(scene, state2)
        jax.block_until_ready(state2)
        dt = min(dt, time.perf_counter() - t0)
    per_pass = dt / passes
    out = {
        "config": name,
        "ms_per_pass": round(per_pass * 1e3, 2),
        "Mrays_per_s": round(rays_per_pass / per_pass / 1e6, 1),
        "Msamples_per_s": round(width * height / per_pass / 1e6, 2),
    }
    print(json.dumps(out), flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default="1,2,3,4")
    ap.add_argument("--passes", type=int, default=10)
    ap.add_argument("--mesh-method", default="sah")
    ap.add_argument("--tile", default="auto",
                    help="rays per kernel tile (int or 'auto')")
    args = ap.parse_args()
    which = set(args.configs.split(","))
    tile = args.tile if args.tile == "auto" else int(args.tile)

    from cpu_raytracing_experiments_tpu.scene import accel, builders
    from cpu_raytracing_experiments_tpu.utils.config import RendererPolicy

    if "1" in which:
        measure("1. hero 256x256 4b", builders.default_scene(256, 256),
                RendererPolicy(max_bounces=4), 256, 256, args.passes)
    if "2" in which:
        measure("2. 1k spheres (brute)",
                builders.random_spheres_scene(512, 512, num_spheres=1000),
                RendererPolicy(max_bounces=8, narrow_factors=(8, 32)), 512, 512,
                args.passes)
    if "3" in which:
        measure("3. cornell box", builders.cornell_box_scene(512, 512),
                RendererPolicy(max_bounces=8), 512, 512, args.passes)
    if "4" in which:
        import jax.numpy as jnp

        scene = builders.default_scene(1920, 1088)
        scene = dataclasses.replace(
            scene,
            camera=dataclasses.replace(
                scene.camera,
                focus_distance=jnp.float32(1.3),
                aperture_radius=jnp.float32(0.01),
            ),
        )
        measure("4. DoF 1080p", scene,
                RendererPolicy(max_bounces=8, enable_dof=True), 1920, 1088,
                args.passes)
    if "5a" in which:
        scene = accel.with_pallas_clusters(
            builders.mesh_scene(384, 384, subdivisions=5),
            method=args.mesh_method)
        measure(f"5a. mesh 20k ({args.mesh_method}, tile={args.tile})", scene,
                RendererPolicy(max_bounces=8, accel="pallas",
                               pallas_tile_rays=tile), 384, 384, 5)
    if "5b" in which:
        scene = accel.with_pallas_clusters(
            builders.mesh_scene(384, 384, uv_res=224), method=args.mesh_method)
        measure(f"5b. mesh 100k ({args.mesh_method}, tile={args.tile})", scene,
                RendererPolicy(max_bounces=8, accel="pallas",
                               pallas_tile_rays=tile), 384, 384, 5)


if __name__ == "__main__":
    main()
