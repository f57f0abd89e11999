"""End-to-end renderer A/B: accel='pallas' vs 'brute'/'clustered' on the
BASELINE configs (config 2 random spheres, config 5 mesh).

python benchmarks/bench_pallas_e2e.py --config 2|5 [--spp N]
"""
import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

from cpu_raytracing_experiments_tpu.render.api import Renderer
from cpu_raytracing_experiments_tpu.scene import accel, builders
from cpu_raytracing_experiments_tpu.utils.config import RendererPolicy


def run(scene, policy, w, h, passes, label, warm=2):
    del warm
    r = Renderer(scene, policy, w, h)
    # warm with the SAME pass count: accumulate(n) specializes on n, so a
    # different warm count would leave compilation inside the timed region
    r.accumulate(passes)
    float(r.state.buckets[0, 0, 0])  # host read: the only reliable fence
    r.reset_accumulator()
    t0 = time.perf_counter()
    r.accumulate(passes)
    float(r.state.buckets[0, 0, 0])
    dt = time.perf_counter() - t0
    ms = dt / passes * 1e3
    msam = w * h * passes / dt / 1e6
    print(f"{label:34s} {ms:9.2f} ms/pass  {msam:8.2f} Msamples/s")
    return r.render(tonemap=True), ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=int, default=2)
    ap.add_argument("--spp", type=int, default=10)
    ap.add_argument("--skip", default="", help="comma list of labels to skip")
    ap.add_argument("--tile", type=int, default=256)
    args = ap.parse_args()
    skip = set(args.skip.split(",")) if args.skip else set()

    if args.config == 2:
        w = h = 512
        scene = builders.random_spheres_scene(w, h, num_spheres=1000)
        base = RendererPolicy(max_bounces=8)
    elif args.config == 5:
        w = h = 384
        scene = builders.mesh_scene(w, h, subdivisions=4)  # 5120 tris? no: 20*4^4
        base = RendererPolicy(max_bounces=8)
    elif args.config == 55:
        w = h = 384
        scene = builders.mesh_scene(w, h, subdivisions=5)  # 20480 tris
        base = RendererPolicy(max_bounces=8)
    else:
        sys.exit("config must be 2, 5 or 55")
    ntri = scene.triangles.count if scene.triangles is not None else 0
    print(f"config {args.config}: {w}x{h}, spheres={scene.spheres.count}, tris={ntri}")

    imgs = {}
    if "brute" not in skip:
        imgs["brute"], _ = run(scene, base, w, h, args.spp, "brute")
    if "clustered" not in skip:
        sc = accel.with_clusters(scene, num_clusters=64)
        pol = dataclasses.replace(base, accel="clustered")
        imgs["clustered"], _ = run(sc, pol, w, h, args.spp, "clustered C=64")
    sc = accel.with_pallas_clusters(scene)
    for compact in (True, False):
        for sort in (True,):
            lbl = f"pallas tile={args.tile} sort={int(sort)} compact={int(compact)}"
            if lbl in skip:
                continue
            pol = dataclasses.replace(
                base, accel="pallas", pallas_tile_rays=args.tile,
                pallas_sort_visits=sort, pallas_compact=compact,
            )
            imgs[lbl], _ = run(sc, pol, w, h, args.spp, lbl)

    keys = list(imgs)
    ref = imgs[keys[0]]
    for k in keys[1:]:
        diff = float(np.abs(imgs[k] - ref).max())
        print(f"  image max|diff| vs {keys[0]}: {k}: {diff:.2e}")


if __name__ == "__main__":
    main()
