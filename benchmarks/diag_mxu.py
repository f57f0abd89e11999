"""MXU battery experiment (ARCHITECTURE.md 'known future optimizations' #4):
reformulate the sphere battery's two [R,3]x[3,P] contractions (d.C and p.C)
as dot_generals so they run on the MXU, vs the fused VPU elementwise battery.

The contraction depth is K=3 — the MXU is a 128x128 systolic array, so a
K=3 matmul uses 3/128 of its pipeline; this measures whether XLA's matmul
path can still beat the VPU, and at which precision tier (DEFAULT = 1-pass
bf16 — measured id_agreement 0.67 vs the f32 battery, unusable; HIGHEST =
float32-faithful passes) the selection stays correct.

Timing note: the axon tunnel has a ~30-90 ms per-dispatch floor, so each
variant runs ITERS chained batteries inside ONE jit (origin perturbed by
the previous result so XLA cannot CSE them) and reports per-iteration time.

    python benchmarks/diag_mxu.py [--rays 262144] [--prims 1024]
"""
import argparse
import json
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

ITERS = 30


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=1 << 18)
    ap.add_argument("--prims", type=int, default=1024)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from cpu_raytracing_experiments_tpu.core.vec import Vec3
    from cpu_raytracing_experiments_tpu.ops import intersect

    R, P = args.rays, args.prims
    rng = np.random.default_rng(0)
    pm = rng.uniform(-8, 8, (R, 3)).astype(np.float32)
    dm = rng.normal(size=(R, 3)).astype(np.float32)
    dm /= np.linalg.norm(dm, axis=1, keepdims=True)
    c = rng.uniform(-8, 8, (P, 3)).astype(np.float32)
    rsq = jnp.asarray(rng.uniform(0.01, 0.25, P).astype(np.float32))
    pmat = jnp.asarray(pm)
    dmat = jnp.asarray(dm)
    cmat = jnp.asarray(c.T)  # [3, P]
    center = Vec3(*[jnp.asarray(c[:, i]) for i in range(3)])
    c2 = jnp.sum(cmat * cmat, axis=0)

    def vpu_once(pmat, dmat):
        p = Vec3(pmat[:, 0], pmat[:, 1], pmat[:, 2])
        d = Vec3(dmat[:, 0], dmat[:, 1], dmat[:, 2])
        return intersect.intersect_spheres(p, d, center, rsq, prim_chunk=min(P, 512))

    def mxu_once(pmat, dmat, precision):
        # b = d.(C-p) = dC - d.p ; |C-p|^2 = |C|^2 - 2 p.C + |p|^2
        dot = partial(jax.lax.dot_general,
                      dimension_numbers=(((1,), (0,)), ((), ())),
                      precision=precision,
                      preferred_element_type=jnp.float32)
        dC = dot(dmat, cmat)                              # [R, P] MXU
        pC = dot(pmat, cmat)                              # [R, P] MXU
        dp = jnp.sum(dmat * pmat, axis=1, keepdims=True)  # [R, 1]
        p2 = jnp.sum(pmat * pmat, axis=1, keepdims=True)
        b = dC - dp
        dist2 = c2[None, :] - 2.0 * pC + p2
        disc = rsq[None, :] - dist2 + b * b
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        t_near = b - sq
        t = jnp.where(t_near < 0.0, b + sq, t_near)
        t = jnp.where((disc >= 0.0) & (t >= 0.0), t, 3.4e38)
        best = jnp.min(t, axis=1)
        iota = jax.lax.broadcasted_iota(jnp.int32, t.shape, 1)
        arg = jnp.min(jnp.where(t == best[:, None], iota, 1 << 30), axis=1)
        return best, jnp.where(best < 3.4e38, arg, -1)

    def chained(once):
        @jax.jit
        def run(pmat, dmat):
            def body(carry, _):
                t, i = once(pmat + carry[:, None] * 1e-7, dmat)
                return jnp.where(t < 3.4e38, t, 0.0), i
            carry, idx = jax.lax.scan(
                body, jnp.zeros((R,), jnp.float32), None, length=ITERS)
            return carry, idx[-1]
        return run

    def timeit(f):
        out = f(pmat, dmat)
        jax.block_until_ready(out)
        best = 1e30
        for _ in range(args.reps):
            t0 = time.perf_counter()
            out = f(pmat, dmat)
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        return best / ITERS, out

    t_v, (tv, iv) = timeit(chained(vpu_once))
    results = {"rays": R, "prims": P,
               "vpu_ms": round(t_v * 1e3, 3),
               "vpu_Gtests_s": round(R * P / t_v / 1e9, 1)}
    for prec in ("default", "highest"):
        t_m, (tm, im) = timeit(chained(partial(mxu_once, precision=prec)))
        agree = float(np.mean(np.asarray(iv) == np.asarray(im)))
        results[f"mxu_{prec}_ms"] = round(t_m * 1e3, 3)
        results[f"mxu_{prec}_Gtests_s"] = round(R * P / t_m / 1e9, 1)
        results[f"mxu_{prec}_id_agreement"] = round(agree, 5)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
