"""Round-4 ReSTIR quality study: 2-D spatial reuse vs 1-D vs RIS.

The round-3 2-D screen-space spatial neighborhood (with geometry
rejection) landed without quality measurements (VERDICT r3 weak item 5).
This script produces the missing curves on the many-light scene:

  * ris M=4 (no reuse)
  * restir 1-D lane-offset neighbors (the round-2 variant,
    restir_spatial_2d=False)
  * restir 2-D box neighbors, defaults (radius=8, reject on)
  * radius ablation (2, 16) and reject-off ablation for the 2-D variant

MSE vs a 3000-spp power-sampled truth at equal spp. Prints rows and a
markdown table; the table is merged into benchmarks/CONVERGENCE.md by
hand (so stale sections can be replaced, not appended to). Run on TPU.
"""
import dataclasses
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    from cpu_raytracing_experiments_tpu.render.api import Renderer
    from cpu_raytracing_experiments_tpu.scene import builders
    from cpu_raytracing_experiments_tpu.utils.config import RendererPolicy

    W = H = 192
    scene = builders.random_spheres_scene(
        W, H, num_spheres=1000, emissive_fraction=0.3, seed=77
    )
    n_lights = int(scene.lights.shape[0])
    base = RendererPolicy(max_bounces=6)

    def render_hdr(pol, spp):
        r = Renderer(scene, pol, W, H)
        remaining = -(-spp // 5) * 5
        while remaining:
            step = min(500, remaining)
            r.accumulate(step)
            remaining -= step
        return r.render(tonemap=False)

    t0 = time.time()
    truth = render_hdr(dataclasses.replace(base, light_sampling="power"), 3000)
    print(f"truth 3000 spp in {time.time()-t0:.0f}s, lights={n_lights}",
          flush=True)

    rs = dataclasses.replace(base, light_sampling="restir")
    configs = {
        "ris M=4": dataclasses.replace(base, light_sampling="ris"),
        "restir 1-D lane offsets (round-2 variant)": dataclasses.replace(
            rs, restir_spatial_2d=False
        ),
        "restir 2-D r=8 reject on (default)": rs,
        "restir 2-D r=2 reject on": dataclasses.replace(rs, restir_radius=2),
        "restir 2-D r=16 reject on": dataclasses.replace(rs, restir_radius=16),
        "restir 2-D r=8 reject OFF": dataclasses.replace(
            rs, restir_reject=False
        ),
    }

    def mse(img):
        d = np.clip(img, 0, 50) - np.clip(truth, 0, 50)
        return float(np.mean(d * d))

    lines = ["| config | spp | MSE |", "|---|---|---|"]
    for spp in (10, 50, 250):
        for name, pol in configs.items():
            m = mse(render_hdr(pol, spp))
            lines.append(f"| {name} | {spp} | {m:.3e} |")
            print(f"{name} @ {spp}spp: MSE {m:.4e}", flush=True)
    print("\n".join(lines))


if __name__ == "__main__":
    main()
