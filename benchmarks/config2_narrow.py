"""Config-2 narrowing-cascade sweep: the brute path's remaining tunable.

The fine-K A/B (RESULTS.md round-4 section) settled that no traversal
backend beats the dense battery at 1k spheres; what's left on the brute
path is WHERE the wavefront narrows. Each cascade stage compacts the
live set to width/factor once the live count fits — earlier/finer stages
run every battery at a narrower width sooner, at one extra gather per
engaged stage per bounce.

Run on TPU: python benchmarks/config2_narrow.py
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from sweep import measure  # noqa: E402


def main():
    import jax

    from cpu_raytracing_experiments_tpu.scene import builders
    from cpu_raytracing_experiments_tpu.utils.config import RendererPolicy

    print(f"device: {jax.devices()[0]}", flush=True)
    W = 512
    scene = builders.random_spheres_scene(W, W, num_spheres=1000)

    rows = []
    for nf in ((4, 32), (8, 32), (2, 8, 32), (4, 16, 64), (8, 64), (4,),
               (16, 64)):
        pol = RendererPolicy(max_bounces=8, narrow_factors=nf)
        r = measure(f"narrow={nf}", scene, pol, W, W, 64, passes=64)
        rows.append(r)
        print(f"narrow={nf}: {r['ms_per_pass']} ms/pass = "
              f"{r['Mrays_per_s']} Mrays/s", flush=True)

    print("\n| narrow_factors | ms/pass | Mrays/s |")
    print("|---|---|---|")
    for r in rows:
        print(f"| {r['config']} | {r['ms_per_pass']} | {r['Mrays_per_s']} |")


if __name__ == "__main__":
    main()
