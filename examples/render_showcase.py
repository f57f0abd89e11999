"""Regenerate the README gallery images on the current device.

Accumulation is dispatched in small batches (<= 5 passes per execution) so
no single XLA execution exceeds the axon tunnel's budget on large scenes
(see .claude/skills/verify/SKILL.md gotchas).

Usage: python examples/render_showcase.py [--only NAME]
"""
import argparse
import dataclasses
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from cpu_raytracing_experiments_tpu.render import denoise
    from cpu_raytracing_experiments_tpu.render.api import Renderer
    from cpu_raytracing_experiments_tpu.scene import builders
    from cpu_raytracing_experiments_tpu.scene.scene import Camera
    from cpu_raytracing_experiments_tpu.utils import image
    from cpu_raytracing_experiments_tpu.utils.config import RendererPolicy

    out_dir = Path(__file__).parent

    def mesh_scene_framed(w, h):
        scene = builders.mesh_scene(w, h, subdivisions=6)
        cam = Camera.create(
            eye=(0.6, 1.0, 5.0), forward=(-0.1, -0.18, -1),
            width=w, height=h, focal_length=40.0,
        )
        return dataclasses.replace(scene, camera=cam)

    jobs = {
        "hero": (lambda: builders.default_scene(512, 512),
                 RendererPolicy(max_bounces=8), 512, 500, False),
        "hero_principled": (lambda: builders.default_scene(512, 512),
                            RendererPolicy(max_bounces=8, brdf="principled"),
                            512, 500, False),
        "cornell": (lambda: builders.cornell_box_scene(512, 512),
                    RendererPolicy(max_bounces=8), 512, 500, False),
        "brdf_test_ggx": (lambda: builders.brdf_test_scene(640, 320),
                          RendererPolicy(max_bounces=6, brdf="ggx"), None, 300, False),
        "spheres_1k": (lambda: builders.random_spheres_scene(512, 512, num_spheres=1000),
                       RendererPolicy(max_bounces=6), 512, 200, False),
        "mesh_82k": (lambda: mesh_scene_framed(320, 320),
                     RendererPolicy(max_bounces=5, rays_per_chunk=65536), 320, 60, False),
        "glass_roughness_sweep": (
            lambda: builders.brdf_test_scene(640, 320, prop="roughness_glass"),
            RendererPolicy(max_bounces=12, brdf="principled"), None, 400, False),
    }

    for name, (mk, pol, _, spp, use_denoise) in jobs.items():
        if args.only and name != args.only:
            continue
        scene = mk()
        w = int(float(scene.camera.half_width) * 2)
        h = int(float(scene.camera.half_height) * 2)
        r = Renderer(scene, pol, w, h)
        t0 = time.time()
        remaining = -(-spp // pol.accumulation_buckets) * pol.accumulation_buckets
        while remaining > 0:
            step = min(5, remaining)
            r.accumulate(step)
            import jax

            jax.block_until_ready(r.state.buckets)
            remaining -= step
        img = denoise.denoise_render(r) if use_denoise else r.render(tonemap=True)
        image.write_png(out_dir / f"{name}.png", img)
        print(f"{name}: {spp} spp in {time.time() - t0:.1f}s", flush=True)

    if not args.only or args.only == "denoise_10spp":
        import numpy as np

        scene = builders.default_scene(512, 512)
        r = Renderer(scene, RendererPolicy(max_bounces=8), 512, 512)
        r.accumulate(10)
        side = np.concatenate(
            [r.render(tonemap=True), denoise.denoise_render(r)], axis=1
        )
        image.write_png(out_dir / "denoise_10spp.png", side)
        print("denoise_10spp: saved", flush=True)


if __name__ == "__main__":
    main()
