"""Benchmark sweep over the five BASELINE.json configs.

Usage: python benchmarks/sweep.py [--quick] [--out benchmarks/RESULTS.md]
Measures throughput (Mrays/s from the in-kernel counter, Msamples/s) and
extrapolated wall-clock-to-target-spp for each config on the current
default JAX device.
"""
import argparse
import json
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def measure(name, scene, policy, width, height, spp_target, passes=64):
    import jax
    import jax.numpy as jnp

    from cpu_raytracing_experiments_tpu.render import estimator, renderer

    @jax.jit
    def counted(scene):
        return renderer.render_pass(scene, policy, jnp.uint32(1), width, height)

    t_compile0 = time.perf_counter()
    rad, count = counted(scene)
    jax.block_until_ready(rad)
    compile_s = time.perf_counter() - t_compile0
    rays_per_pass = int(count)

    @partial(jax.jit, donate_argnames=("state",))
    def run(scene, state):
        return estimator.accumulate_n(scene, policy, state, width, height, passes)

    state = estimator.RenderState.create(width, height, policy)
    state = run(scene, state)
    jax.block_until_ready(state)
    dt = 1e30  # best of 3 (the axon tunnel adds noisy multi-ms latency)
    for _ in range(3):
        state2 = estimator.RenderState.create(width, height, policy)
        jax.block_until_ready(state2)
        t0 = time.perf_counter()
        state2 = run(scene, state2)
        jax.block_until_ready(state2)
        dt = min(dt, time.perf_counter() - t0)
    per_pass = dt / passes
    return {
        "config": name,
        "size": f"{width}x{height}",
        "spp_target": spp_target,
        "Mrays_per_s": round(rays_per_pass / per_pass / 1e6, 1),
        "Msamples_per_s": round(width * height / per_pass / 1e6, 2),
        "ms_per_pass": round(per_pass * 1e3, 2),
        "wall_to_target_s": round(per_pass * spp_target, 2),
        "rays_per_pass": rays_per_pass,
        "compile_s": round(compile_s, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="smaller sizes (CI/CPU)")
    ap.add_argument("--out", default=None)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    device = str(jax.devices()[0])

    from cpu_raytracing_experiments_tpu.scene import accel, builders
    from cpu_raytracing_experiments_tpu.utils.config import RendererPolicy

    q = args.quick
    scale = 4 if q else 1
    results = []

    # 1. hero sphere scene, 256x256, 4 bounces, 16 spp
    pol = RendererPolicy(max_bounces=4)
    results.append(
        measure("1. hero 256x256 4b", builders.default_scene(256, 256), pol, 256, 256, 16)
    )

    # 2. 1k-sphere random scene, 512x512, MIS, 8 bounces, 64 spp.
    # Production path is the brute battery (measured 40x faster than BVH
    # traversal on TPU at this primitive count — ARCHITECTURE.md).
    w = 512 // scale
    pol_bf = RendererPolicy(max_bounces=8, narrow_factors=(8, 32))
    results.append(
        measure("2. 1k spheres (brute battery)",
                builders.random_spheres_scene(w, w, num_spheres=1000), pol_bf, w, w, 64)
    )

    # 3. Cornell box 512x512, 256 spp, median-of-means
    w = 512 // scale
    pol = RendererPolicy(max_bounces=8)
    results.append(measure("3. cornell box", builders.cornell_box_scene(w, w), pol, w, w, 256))

    # 4. DoF camera, 1920x1088, 128 spp progressive
    w, h = (480, 272) if q else (1920, 1088)
    import dataclasses
    import jax.numpy as jnp

    scene = builders.default_scene(w, h)
    scene = dataclasses.replace(
        scene,
        camera=dataclasses.replace(
            scene.camera,
            focus_distance=jnp.float32(1.3),
            aperture_radius=jnp.float32(0.01),
        ),
    )
    pol = RendererPolicy(max_bounces=8, enable_dof=True)
    results.append(measure("4. DoF 1080p", scene, pol, w, h, 128))

    # 5. mesh configs on the Pallas clustered-traversal kernel (accel=
    # 'pallas', ops/pallas/traverse_kernel.py — 3.9-19x over brute on
    # meshes, ARCHITECTURE.md round-2 section). 5a is the 20k proxy kept
    # comparable with round 1's brute row; 5b is the true 100k-triangle
    # spec geometry (the full 4K/256spp run lives in
    # benchmarks/run_config5_4k.py -> config5_4k.jsonl).
    subdiv = 3 if q else 5  # 5 -> 20,480 tris
    w = 128 if q else 384
    scene = accel.with_pallas_clusters(builders.mesh_scene(w, w, subdivisions=subdiv))
    pol = RendererPolicy(max_bounces=8, accel="pallas")
    if q:
        pol = RendererPolicy(
            max_bounces=8, accel="pallas", pallas_tile_rays=64,
            pallas_interpret=True, rays_per_chunk=16384,
        )
    results.append(
        measure(f"5a. mesh {20 * 4**subdiv // 1000}k tris (pallas traversal)",
                scene, pol, w, w, 256, passes=48)
    )
    if not q:
        scene = accel.with_pallas_clusters(builders.mesh_scene(w, w, uv_res=224))
        results.append(
            measure("5b. mesh 100k tris (pallas traversal)", scene, pol, w, w, 256, passes=48)
        )

    print(json.dumps({"device": device, "results": results}, indent=2))
    if args.out:
        lines = [
            "# Benchmark sweep — BASELINE.json configs",
            "",
            f"Device: `{device}`",
            "",
            "Mrays/s numerator = the in-kernel useful-ray counter "
            "(render/renderer.py PathState.ray_count): closest-hit rays per "
            "live bounce + valid NEE shadow rays. Cross-check: rays/pass / "
            "(W*H) = useful rays per camera sample ~= avg path length x "
            "(1 + shadow fraction); the `rays/sample` column makes the "
            "numerator auditable.",
            "",
            "| config | size | Mrays/s | rays/sample | Msamples/s | ms/pass | wall to target spp |",
            "|---|---|---|---|---|---|---|",
        ]
        for r in results:
            w, h = (int(t) for t in r["size"].split("x"))
            rps = round(r["rays_per_pass"] / (w * h), 2)
            lines.append(
                f"| {r['config']} | {r['size']} | {r['Mrays_per_s']} | {rps} | "
                f"{r['Msamples_per_s']} | {r['ms_per_pass']} | "
                f"{r['wall_to_target_s']} s @ {r['spp_target']}spp |"
            )
        out = Path(args.out)
        extra = ""
        if out.exists():
            # preserve hand-appended sections (config-5-at-spec record,
            # adaptive-allocation curves, ...) below the sweep table
            prev = out.read_text()
            cut = prev.find("\n| 5-SPEC.")
            if cut == -1:
                cut = prev.find("\n\n## ")
            if cut != -1:
                extra = prev[cut:]
        out.write_text("\n".join(lines) + extra + "\n")


if __name__ == "__main__":
    main()
