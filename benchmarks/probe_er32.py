"""Round-4 anomaly probe: exit_refresh=32 on the 100k mesh measured ~0 ms
in diag_walk_knobs (both pf variants) while every er=8 row was normal and
the 20k er=32 rows were normal. ~0 ms for a 48-pass render is physically
impossible, so either (a) the harness/tunnel glitched, or (b) the Mosaic
compile at C=1130 with er=32 produces an instantly-exiting (wrong) walk —
which interpret-mode tests can NOT catch (the interpreter's while_loop cond
reads stale SMEM, so early exit never fires there; ROADMAP item 4).

This renders the 100k scene at 384x384, 2 passes, er=8 vs er=32 (pf off and
on), compares buckets BIT-EXACTLY and prints per-config wall times. A wrong
early exit cannot produce identical buckets: entries skipped by a premature
exit change tfar for real hits.

Run on TPU: python benchmarks/probe_er32.py
"""
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from cpu_raytracing_experiments_tpu.render import estimator
    from cpu_raytracing_experiments_tpu.scene import accel, builders
    from cpu_raytracing_experiments_tpu.utils.config import RendererPolicy

    print(f"device={jax.devices()[0].device_kind}", flush=True)
    scene = accel.with_pallas_clusters(
        builders.mesh_scene(384, 384, uv_res=224))
    W = H = 384

    def render2(er, pf):
        pol = RendererPolicy(max_bounces=8, accel="pallas",
                             pallas_exit_refresh=er, pallas_prefetch=pf)

        @partial(jax.jit, static_argnames=())
        def run(scene, state):
            return estimator.accumulate_n(scene, pol, state, W, H, 2)

        state = estimator.RenderState.create(W, H, pol)
        t0 = time.perf_counter()
        state = run(scene, state)
        jax.block_until_ready(state)
        compile_s = time.perf_counter() - t0
        state2 = estimator.RenderState.create(W, H, pol)
        t0 = time.perf_counter()
        state2 = run(scene, state2)
        jax.block_until_ready(state2)
        hot_s = time.perf_counter() - t0
        print(f"er={er} pf={pf}: compile+2p {compile_s:.2f} s, "
              f"hot 2p {hot_s * 1e3:.1f} ms", flush=True)
        return np.asarray(state2.buckets)

    ref = render2(8, False)
    ok_all = True
    for er, pf in ((32, False), (32, True), (64, True)):
        got = render2(er, pf)
        same = np.array_equal(ref, got)
        ok_all &= same
        if not same:
            diff = np.abs(ref - got)
            print(f"er={er} pf={pf}: MISMATCH max|d|={diff.max():.3e} "
                  f"frac={np.mean(diff > 0):.4f}", flush=True)
        else:
            print(f"er={er} pf={pf}: bit-identical to er=8", flush=True)
    print("PROBE", "PASS" if ok_all else "FAIL", flush=True)


if __name__ == "__main__":
    main()
