"""Many-lights scaling: light_sampling='alias' O(1) selection vs the
O(R*L) modes at 10k+ emitters (VERDICT r3 item 9).

'power'/'ris'/'restir' materialize a per-ray [R, L] weight matrix each
bounce — at L ~ 10k that matrix is the wall (memory AND compute);
'alias' replaces it with one alias-row gather per ray (static power
weights, emission x size). 'uniform' is O(1) too but ignores emitter
power. This measures ms/pass for each mode on a ~10.8k-emitter sphere
field and renders the alias-mode showcase image.

Run on TPU: python benchmarks/many_lights.py
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    import jax

    from cpu_raytracing_experiments_tpu.render.api import Renderer
    from cpu_raytracing_experiments_tpu.scene import builders
    from cpu_raytracing_experiments_tpu.utils.config import RendererPolicy

    print(f"device: {jax.devices()[0]}", flush=True)
    W = H = 256
    scene = builders.random_spheres_scene(
        W, H, num_spheres=12000, emissive_fraction=0.9, seed=99
    )
    n_lights = int(scene.lights.shape[0])
    print(f"lights: {n_lights} / 12000 spheres", flush=True)

    rows = []
    for mode in ("uniform", "alias", "power", "ris"):
        pol = RendererPolicy(max_bounces=6, light_sampling=mode)
        try:
            r = Renderer(scene, pol, W, H)
            r.accumulate(5)  # compile + warm
            jax.block_until_ready(r.state.buckets)
            t0 = time.perf_counter()
            r.accumulate(20)
            jax.block_until_ready(r.state.buckets)
            ms = (time.perf_counter() - t0) * 1e3 / 20
            rows.append((mode, ms))
            print(f"{mode}: {ms:.2f} ms/pass", flush=True)
        except Exception as e:  # OOM etc. — that IS the measurement
            rows.append((mode, f"FAILS ({type(e).__name__})"))
            print(f"{mode}: FAILS ({type(e).__name__}: {e})", flush=True)

    # showcase image, alias mode
    pol = RendererPolicy(max_bounces=6, light_sampling="alias")
    r = Renderer(scene, pol, W, H)
    r.accumulate(200)
    img = np.asarray(r.render())
    from PIL import Image

    out = Path(__file__).parents[1] / "examples" / "many_lights_10k.png"
    Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8)).save(out)
    print(f"wrote {out}", flush=True)

    print(f"\n| mode | ms/pass ({n_lights} lights, {W}x{H}, 6 bounces) |")
    print("|---|---|")
    for mode, ms in rows:
        v = f"{ms:.2f}" if isinstance(ms, float) else ms
        print(f"| {mode} | {v} |")


if __name__ == "__main__":
    main()
