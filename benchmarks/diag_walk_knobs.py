"""Round-4 walk scalar-sync A/B (VERDICT r3 item 1a): exit_refresh x
prefetch on the mesh configs, end-to-end, x48-fused passes (timing
methodology at the top of RESULTS.md).

The traversal walk dominates config 5 (RESULTS.md decomposition). Its two
scalar-unit serialization points: the cond's mx[0,0] read after every
VPU-side refresh (every 8 visits at the default), and the per-trip
visit/entry SMEM reads that gate the batteries' cluster addresses.
`pallas_exit_refresh` stretches the refresh interval; `pallas_prefetch`
carries the next trip's scalars in the loop state. Both bit-exact
(tests/test_pallas_traverse.py::test_exit_refresh_and_prefetch_bit_exact).

    python benchmarks/diag_walk_knobs.py [--passes 48] [--mesh 20k,100k]
"""
import argparse
import json
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def measure(name, scene, policy, width, height, passes):
    import jax
    import jax.numpy as jnp

    from cpu_raytracing_experiments_tpu.render import estimator, renderer

    @jax.jit
    def counted(scene):
        return renderer.render_pass(scene, policy, jnp.uint32(1), width,
                                    height)

    rad, count = counted(scene)
    jax.block_until_ready(rad)
    rays_per_pass = int(count)

    @partial(jax.jit, donate_argnames=("state",))
    def run(scene, state):
        return estimator.accumulate_n(scene, policy, state, width, height,
                                      passes)

    state = estimator.RenderState.create(width, height, policy)
    state = run(scene, state)
    jax.block_until_ready(state)
    dt = 1e30
    for _ in range(3):
        state2 = estimator.RenderState.create(width, height, policy)
        jax.block_until_ready(state2)
        t0 = time.perf_counter()
        state2 = run(scene, state2)
        jax.block_until_ready(state2)
        dt = min(dt, time.perf_counter() - t0)
    per_pass = dt / passes
    print(json.dumps({
        "config": name,
        "ms_per_pass": round(per_pass * 1e3, 2),
        "Mrays_per_s": round(rays_per_pass / per_pass / 1e6, 2),
    }), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--passes", type=int, default=48)
    ap.add_argument("--mesh", default="20k,100k")
    args = ap.parse_args()

    import jax

    from cpu_raytracing_experiments_tpu.scene import accel, builders
    from cpu_raytracing_experiments_tpu.utils.config import RendererPolicy

    print(f"device={jax.devices()[0].device_kind}", flush=True)
    scenes = {}
    if "20k" in args.mesh:
        scenes["20k"] = accel.with_pallas_clusters(
            builders.mesh_scene(384, 384, subdivisions=5))
    if "100k" in args.mesh:
        scenes["100k"] = accel.with_pallas_clusters(
            builders.mesh_scene(384, 384, uv_res=224))

    grid = [
        (8, False),   # production default (control)
        (32, False),  # fewer VPU->scalar syncs
        (8, True),    # prefetched trip scalars
        (32, True),   # both
        (64, True),   # sync nearly off
    ]
    for mesh, scene in scenes.items():
        for er, pf in grid:
            pol = RendererPolicy(max_bounces=8, accel="pallas",
                                 pallas_exit_refresh=er, pallas_prefetch=pf)
            try:
                measure(f"{mesh} er={er} pf={pf}", scene, pol, 384, 384,
                        args.passes)
            except Exception as e:  # a Mosaic lowering failure IS a result
                print(json.dumps({
                    "config": f"{mesh} er={er} pf={pf}",
                    "error": f"{type(e).__name__}: {e}"[:300],
                }), flush=True)


if __name__ == "__main__":
    main()
