"""Estimator convergence study: MSE vs spp on the hero scene.

Compares sampling configurations against a high-spp ground truth:
  * uniform light selection + random camera jitter (reference semantics)
  * power-proportional light selection
  * + stratified camera sampling
  * + a-trous denoiser applied to the low-spp render
Writes benchmarks/CONVERGENCE.md. Run on TPU (a few minutes).
"""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import dataclasses

import numpy as np


def main():
    from cpu_raytracing_experiments_tpu.render import denoise
    from cpu_raytracing_experiments_tpu.render.api import Renderer
    from cpu_raytracing_experiments_tpu.scene import builders
    from cpu_raytracing_experiments_tpu.utils.config import RendererPolicy

    W = H = 192
    scene = builders.default_scene(W, H)
    base = RendererPolicy(max_bounces=8)

    def render_hdr(pol, spp):
        r = Renderer(scene, pol, W, H)
        remaining = -(-spp // 5) * 5
        while remaining:
            step = min(500, remaining)
            r.accumulate(step)
            remaining -= step
        return r, r.render(tonemap=False)

    t0 = time.time()
    _, truth = render_hdr(
        dataclasses.replace(base, light_sampling="power", stratify_camera=True),
        10000,
    )
    print(f"ground truth 10000 spp in {time.time() - t0:.0f}s", flush=True)

    configs = {
        "uniform+random (reference semantics)": base,
        "power lights": dataclasses.replace(base, light_sampling="power"),
        "power+stratified": dataclasses.replace(
            base, light_sampling="power", stratify_camera=True
        ),
    }
    rows = []
    for spp in (10, 50, 250):
        for name, pol in configs.items():
            r, img = render_hdr(pol, spp)
            mse = float(np.mean((img - truth) ** 2))
            rows.append({"config": name, "spp": spp, "mse": mse})
            if name == "power+stratified":
                den = denoise.denoise_render(r)
                # compare in tonemapped space against tonemapped truth
                from cpu_raytracing_experiments_tpu.core import color
                import jax.numpy as jnp

                tt = np.asarray(
                    jnp.stack(
                        color.tonemap_aces(
                            jnp.asarray(truth[..., 0]),
                            jnp.asarray(truth[..., 1]),
                            jnp.asarray(truth[..., 2]),
                        ),
                        -1,
                    )
                )
                mse_d = float(np.mean((den - tt) ** 2))
                rows.append({"config": "power+stratified+denoise (tonemapped)",
                             "spp": spp, "mse": mse_d})
            print(json.dumps(rows[-1]), flush=True)

    lines = [
        "# Convergence study — hero scene 192x192, MSE vs 10k-spp truth",
        "",
        "| config | spp | MSE |",
        "|---|---|---|",
    ]
    for r in rows:
        lines.append(f"| {r['config']} | {r['spp']} | {r['mse']:.3e} |")
    Path(__file__).with_name("CONVERGENCE.md").write_text("\n".join(lines) + "\n")
    print("wrote benchmarks/CONVERGENCE.md")


if __name__ == "__main__":
    main()
