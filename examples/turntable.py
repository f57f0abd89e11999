"""Turntable animation: orbit the camera around a scene and write frames.

The offline analog of the reference's SPACE fly-cam (Application.cpp:309-333):
each frame is a camera edit + accumulator reset + short progressive render.
Because camera parameters are traced scalars in the scene pytree, every frame
reuses the SAME compiled executable — only frame 0 pays the compile.

    python examples/turntable.py --frames 24 --spp 25 --size 256 --out /tmp/turn
"""
import argparse
import dataclasses
import math
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="default")
    ap.add_argument("--frames", type=int, default=24)
    ap.add_argument("--spp", type=int, default=25)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--radius", type=float, default=None,
                    help="orbit radius (default: initial camera distance)")
    ap.add_argument("--target", type=float, nargs=3, default=(0.0, 0.0, 0.0))
    ap.add_argument("--out", default="/tmp/turntable")
    ap.add_argument("--gif", help="also assemble the frames into a looping GIF")
    ap.add_argument("--denoise", action="store_true",
                    help="a-trous denoise each frame (clean animation at low spp)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from cpu_raytracing_experiments_tpu.render.api import Renderer
    from cpu_raytracing_experiments_tpu.scene import builders
    from cpu_raytracing_experiments_tpu.scene.scene import Camera
    from cpu_raytracing_experiments_tpu.utils import image as image_io
    from cpu_raytracing_experiments_tpu.utils.config import RendererPolicy

    w = h = args.size
    scene = builders.SCENES[args.scene](w, h)
    cam0 = scene.camera
    eye0 = np.array([float(cam0.pos.x), float(cam0.pos.y), float(cam0.pos.z)])
    tgt = np.asarray(args.target, np.float64)
    radius = args.radius or float(np.linalg.norm((eye0 - tgt)[[0, 2]]))
    height_y = eye0[1]
    base_angle = math.atan2(eye0[0] - tgt[0], eye0[2] - tgt[2])

    pol = RendererPolicy(max_bounces=8)
    r = Renderer(scene, pol, w, h)
    os.makedirs(args.out, exist_ok=True)

    for i in range(args.frames):
        a = base_angle + 2 * math.pi * i / args.frames
        eye = tgt + np.array([radius * math.sin(a), height_y - tgt[1],
                              radius * math.cos(a)])
        cam = Camera.create(
            eye, tgt - eye, w, h,
            exposure=float(cam0.exposure),
            focus_distance=float(np.linalg.norm(tgt - eye)),
        )
        r.update_scene(dataclasses.replace(r.scene, camera=cam))
        t0 = time.perf_counter()
        if args.denoise:
            from cpu_raytracing_experiments_tpu.render.denoise import denoise_render

            b = pol.accumulation_buckets
            r.accumulate(-(-args.spp // b) * b)
            img = denoise_render(r)
        else:
            img = r.render_spp(args.spp)
        path = os.path.join(args.out, f"frame_{i:04d}.png")
        image_io.write_png(path, img)
        print(f"{path}  {time.perf_counter() - t0:.2f}s", flush=True)

    if args.gif:
        from PIL import Image

        frames = [
            Image.open(os.path.join(args.out, f"frame_{i:04d}.png"))
            for i in range(args.frames)
        ]
        frames[0].save(
            args.gif, save_all=True, append_images=frames[1:],
            duration=1000 // 12, loop=0,
        )
        print(args.gif, flush=True)


if __name__ == "__main__":
    main()
