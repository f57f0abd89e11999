"""Config-2 (1k-sphere random field, 512x512, 8 bounces) hybrid-accel A/B:

  brute            — production path (all bounces dense battery)
  primary=pallas   — bounce 0 + its shadow trace via tile-culled clustered
                     traversal (camera rays are screen-tile coherent, the
                     regime where the traversal wins), bounces >= 1 brute
  pallas           — all bounces clustered traversal (known loser here,
                     context row)

All three produce bit-identical images (tests/test_pallas_traverse.py::
test_primary_accel_override_bit_exact). Fused multi-pass timing (one jit
call per measurement) to keep the axon per-call round-trip out of the
numbers, same pattern as diag_config2b.py.
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses
import numpy as np
import jax

from cpu_raytracing_experiments_tpu.render import estimator
from cpu_raytracing_experiments_tpu.scene import accel, builders
from cpu_raytracing_experiments_tpu.utils.config import RendererPolicy

W = H = 512
PASSES = 8


def per_pass_ms(scene, pol, label):
    @partial(jax.jit, donate_argnames=("state",))
    def run(scene, state):
        return estimator.accumulate_n(scene, pol, state, W, H, PASSES)

    state = estimator.RenderState.create(W, H, pol)
    state = run(scene, state)
    float(np.asarray(state.buckets).ravel()[0])
    best = 1e30
    for _ in range(3):
        state = estimator.RenderState.create(W, H, pol)
        t0 = time.perf_counter()
        state = run(scene, state)
        jax.block_until_ready(state.buckets)
        best = min(best, time.perf_counter() - t0)
    ms = best * 1e3 / PASSES
    # config-2 useful-ray rate: 1.83 rays/sample (benchmarks/RESULTS.md)
    mrays = 1.83 * W * H / ms / 1e3
    print(f"{label:20s} {ms:8.2f} ms/pass  (~{mrays:5.1f} Mrays/s)")
    return state


def main():
    print(f"device={jax.devices()[0].device_kind}  {W}x{H}  {PASSES} fused passes")
    base = builders.random_spheres_scene(W, H, num_spheres=1000)
    pol = RendererPolicy(max_bounces=8, narrow_factors=(8, 32))
    s_brute = per_pass_ms(base, pol, "brute")
    for k in (64, 128):
        sc = accel.with_pallas_clusters(base, cluster_size=k)
        s_hyb = per_pass_ms(
            sc, dataclasses.replace(pol, primary_accel="pallas"),
            f"primary=pallas K={k}",
        )
        ok = bool(np.array_equal(np.asarray(s_hyb.buckets),
                                 np.asarray(s_brute.buckets)))
        print(f"    bit-exact vs brute: {ok}")
    sc = accel.with_pallas_clusters(base, cluster_size=128)
    per_pass_ms(sc, dataclasses.replace(pol, accel="pallas"), "pallas all")


if __name__ == "__main__":
    main()
