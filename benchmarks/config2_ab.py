"""Config-2 (1k-sphere field, 512x512, 8 bounces) A/B: brute battery vs
the Pallas clustered traversal at ROUND-3 FINE cluster sizes.

The sphere-field crossover table that rejected pallas at 1k spheres
(RESULTS.md) was measured at the old C=8 granularity floor (K=128
minimum). Round 3's lane-packed sub-128 clusters allow K=16/32/64 —
8-16x finer culling granularity — and the fine-K sweep inverted the
mesh optimum the same way. This script measures whether fine clusters
flip the sphere-field verdict too (VERDICT round-4 item 2; the promised
sublane-block-skip battery's culling granularity IS the lane-packed
cluster — a [TILE_R, 128] battery over 128/K packed clusters with
per-tile visit lists skips whole cluster-blocks, in-register, planned
once per tile).

Run on TPU: python benchmarks/config2_ab.py
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from sweep import measure  # noqa: E402  (same dir)


def main():
    import argparse

    import jax

    from cpu_raytracing_experiments_tpu.scene import accel, builders
    from cpu_raytracing_experiments_tpu.utils.config import RendererPolicy

    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default="",
                    help="substring filter over config names (e.g. 'hybrid')")
    args = ap.parse_args()

    print(f"device: {jax.devices()[0]}", flush=True)
    W = 512
    base = builders.random_spheres_scene(W, W, num_spheres=1000)

    rows = []

    def run(name, scene, pol, passes=64):
        if args.only and not any(s in name for s in args.only.split(",")):
            return
        r = measure(name, scene, pol, W, W, 64, passes=passes)
        rows.append(r)
        print(
            f"{name}: {r['ms_per_pass']} ms/pass = {r['Mrays_per_s']} "
            f"Mrays/s (compile {r['compile_s']}s)",
            flush=True,
        )

    # production baseline: brute battery + (8,32) narrowing
    run("brute (8,32)", base,
        RendererPolicy(max_bounces=8, narrow_factors=(8, 32)))

    for k in (16, 32, 64):
        scene = accel.with_pallas_clusters(base, cluster_size=k)
        for tile in (64, 128):
            run(
                f"pallas K={k} tile={tile}", scene,
                RendererPolicy(max_bounces=8, accel="pallas",
                               narrow_factors=(8, 32),
                               pallas_tile_rays=tile),
            )

    # hybrid: coherent camera rays through the traversal, bounces brute
    scene = accel.with_pallas_clusters(base, cluster_size=32)
    run(
        "hybrid primary=pallas K=32 tile=128 / bounces brute", scene,
        RendererPolicy(max_bounces=8, narrow_factors=(8, 32),
                       primary_accel="pallas", pallas_tile_rays=128),
    )

    print("\n| config | ms/pass | Mrays/s |")
    print("|---|---|---|")
    for r in rows:
        print(f"| {r['config']} | {r['ms_per_pass']} | {r['Mrays_per_s']} |")


if __name__ == "__main__":
    main()
