"""Hardware A/B: per-leaf group culling (plan='group', group_boxes
clustering) vs the default ray plan on the mesh configs.

The schedule sim (benchmarks/sim_group_plan.py) put the ceiling low
before this ran: the SAH pair rate at K=128 is only ~6% (C 1130 -> 1060
at w=8) and executed visits drop ~3.5% (172 -> 166) while the dual-slab
plan battery costs ~2x the single — predicted net NEGATIVE. This script
is the hardware word (RESULTS.md methodology: x48-fused end-to-end
passes, A/B within one session).

Run on TPU: python benchmarks/diag_group_plan.py
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from sweep import measure  # noqa: E402


def main():
    import jax

    from cpu_raytracing_experiments_tpu.scene import accel, builders
    from cpu_raytracing_experiments_tpu.utils.config import RendererPolicy

    print(f"device: {jax.devices()[0]}", flush=True)
    W = 384
    for name, kw, K in (("20k", dict(subdivisions=5), 64),
                        ("100k", dict(uv_res=224), 128)):
        scene = builders.mesh_scene(W, W, **kw)
        pol = RendererPolicy(max_bounces=8, accel="pallas")
        pol_g = RendererPolicy(max_bounces=8, accel="pallas",
                               pallas_plan="group")
        legs = [
            ("ray w=1 (default)",
             accel.with_pallas_clusters(scene, cluster_size=K), pol),
            ("group w=8",
             accel.with_pallas_clusters(scene, cluster_size=K,
                                        fill_window=8, group_boxes=True),
             pol_g),
            ("group w=32",
             accel.with_pallas_clusters(scene, cluster_size=K,
                                        fill_window=32, group_boxes=True),
             pol_g),
        ]
        for leg, sc, p in legs:
            r = measure(f"{name} {leg}", sc, p, W, W, 256, passes=48)
            print(f"{name} {leg}: C={sc.tri_clusters.num_clusters} "
                  f"{r['ms_per_pass']} ms/pass = {r['Mrays_per_s']} Mrays/s",
                  flush=True)


if __name__ == "__main__":
    main()
