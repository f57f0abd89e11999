"""On-hardware golden check: render the golden scenes on the real TPU
(Mosaic-compiled kernels, not interpret mode) and compare against the
checked-in CPU goldens (tests/goldens/). The CPU suite validates the Pallas
kernels only in interpret mode; this closes the loop on the compiled path.

    python benchmarks/tpu_goldens.py        # prints one JSON line per scene
"""
import dataclasses
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

GOLDEN_DIR = Path(__file__).resolve().parents[1] / "tests" / "goldens"
SIZE, SPP = 64, 10


def main():
    from cpu_raytracing_experiments_tpu.render.api import Renderer
    from cpu_raytracing_experiments_tpu.scene import accel as accel_mod
    from cpu_raytracing_experiments_tpu.scene import builders
    from cpu_raytracing_experiments_tpu.utils.config import RendererPolicy

    pol = RendererPolicy(max_bounces=6, rays_per_chunk=4096)
    cases = {
        "hero": (builders.default_scene(SIZE, SIZE), pol),
        "cornell": (builders.cornell_box_scene(SIZE, SIZE), pol),
        "white_furnace": (builders.white_furnace_scene(SIZE, SIZE), pol),
        "bvh_test": (  # compiled Pallas traversal on hardware (spheres)
            accel_mod.with_pallas_clusters(
                builders.bvh_test_scene(SIZE, SIZE), cluster_size=64
            ),
            dataclasses.replace(pol, accel="pallas", pallas_tile_rays=64),
        ),
        "mesh": (  # compiled Pallas traversal on hardware (triangles)
            accel_mod.with_pallas_clusters(
                builders.mesh_scene(96, 96, subdivisions=3), cluster_size=64
            ),
            dataclasses.replace(pol, accel="pallas", pallas_tile_rays=64),
        ),
    }
    failures = 0
    hw_imgs = {}
    for name, (scene, p) in cases.items():
        size = 96 if name == "mesh" else SIZE
        r = Renderer(scene, p, size, size)
        r.accumulate(SPP)
        img = np.asarray(r.render(tonemap=False))
        if p.accel == "pallas":
            hw_imgs[name] = (scene, p, size, img)
        want = np.load(GOLDEN_DIR / f"{name}_{size}x{size}_{SPP}spp.npy")
        close = float(np.isclose(img, want, rtol=1e-3, atol=1e-4).mean())
        # cross-PLATFORM tolerance (TPU vs the CPU-rendered goldens) is
        # looser than the same-platform suite's 0.995: different fusion/
        # rounding moves ~1% of the 10-spp hero's high-variance pixels
        # past isclose while the mean relative error stays ~5e-4
        ok = close > 0.98
        failures += not ok
        print(json.dumps({
            "scene": name,
            "accel": p.accel,
            "pixels_close": round(close, 5),
            "mean_rel_err": round(
                float(np.abs(img - want).mean() / max(want.mean(), 1e-6)), 6
            ),
            "ok": ok,
        }), flush=True)
    # bit-exact traversal-schedule knobs must stay bit-exact when
    # Mosaic-COMPILED too (interpret mode accepts lowerings hardware
    # rejects — and a miscompiled variant could silently render wrong)
    for name, (scene, p, size, base_img) in hw_imgs.items():
        pv = dataclasses.replace(p, pallas_fuse=True, pallas_trav_block=8)
        r = Renderer(scene, pv, size, size)
        r.accumulate(SPP)
        img = np.asarray(r.render(tonemap=False))
        ok = bool(np.array_equal(img, base_img))
        failures += not ok
        print(json.dumps({
            "scene": name, "accel": "pallas(fuse,tb8)",
            "bit_exact_vs_default": ok, "ok": ok,
        }), flush=True)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
