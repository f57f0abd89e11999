"""Adaptive vs uniform sample allocation: equal-quality-for-fewer-rays.

For the hero scene and its DoF variant, renders a high-spp truth, then:
  * uniform N-spp renders for a ladder of N
  * render_adaptive at tolerance ladder
and reports MSE vs samples traced. The claim to verify (VERDICT item 9):
adaptive reaches the same MSE with measurably fewer total samples.
Appends results to benchmarks/RESULTS.md. Run on TPU.
"""
import dataclasses
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    import jax.numpy as jnp

    from cpu_raytracing_experiments_tpu.render.api import Renderer
    from cpu_raytracing_experiments_tpu.scene import builders
    from cpu_raytracing_experiments_tpu.utils.config import RendererPolicy

    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=256)
    args = ap.parse_args()
    W = H = args.size
    scenes = {"hero": (builders.default_scene(W, H), RendererPolicy(max_bounces=6))}
    dof = builders.default_scene(W, H)
    dof = dataclasses.replace(
        dof,
        camera=dataclasses.replace(
            dof.camera,
            focus_distance=jnp.float32(1.3),
            aperture_radius=jnp.float32(0.01),
        ),
    )
    scenes["dof"] = (dof, RendererPolicy(max_bounces=6, enable_dof=True))

    lines = ["", "", "## Adaptive sample allocation (render_adaptive) — "
             f"MSE vs samples traced, {W}x{H}", ""]
    for name, (scene, pol) in scenes.items():
        r = Renderer(scene, pol, W, H)
        r.accumulate(4000)
        truth = r.render(tonemap=False)
        tclip = np.clip(truth, 0, 20)

        def mse(img):
            return float(np.mean((np.clip(img, 0, 20) - tclip) ** 2))

        # steady-state walls: compile both paths once before the timed
        # ladder (the adaptive loop's first trace costs minutes; without
        # this the first table row absorbs it and the wall column is
        # meaningless — the round-3 VERDICT's complaint)
        rw = Renderer(scene, pol, W, H)
        rw.accumulate(5)
        rw.render(tonemap=False)
        rw2 = Renderer(scene, pol, W, H)
        rw2.render_adaptive(tol=0.08, max_spp=50, warmup=25, tonemap=False)

        # each (mode, param) is run twice and the best wall kept: the first
        # run of a new spp value / tier size compiles its fused loop
        # (static n / static tier), which is one-time cost, not throughput
        rows = []
        for spp in (50, 100, 200, 400):
            best = (None, 1e30)
            for _ in range(2):
                ru = Renderer(scene, pol, W, H)
                t0 = time.perf_counter()
                ru.accumulate(spp)
                img = ru.render(tonemap=False)
                dt = time.perf_counter() - t0
                if dt < best[1]:
                    best = (img, dt)
            rows.append(("uniform", spp * W * H, mse(best[0]), best[1]))
        for tol in (0.08, 0.04, 0.02, 0.01):
            best = (None, None, 1e30)
            for _ in range(2):
                ra = Renderer(scene, pol, W, H)
                t0 = time.perf_counter()
                img, stats = ra.render_adaptive(tol=tol, max_spp=400,
                                                warmup=25, tonemap=False)
                dt = time.perf_counter() - t0
                if dt < best[2]:
                    best = (img, stats, dt)
            rows.append((f"adaptive tol={tol}", best[1]["samples_traced"],
                         mse(best[0]), best[2]))
        lines.append(f"### {name}")
        lines.append("")
        lines.append("| schedule | samples traced | MSE | wall s |")
        lines.append("|---|---|---|---|")
        for sched, n, m, w in rows:
            lines.append(f"| {sched} | {n/1e6:.2f} M | {m:.4e} | {w:.1f} |")
            print(name, sched, f"{n/1e6:.2f}M", f"{m:.4e}", flush=True)
        lines.append("")

    out = Path(__file__).parent / "RESULTS.md"
    with out.open("a") as fh:
        fh.write("\n".join(lines))
    print("appended to", out)


if __name__ == "__main__":
    main()
