"""MXU battery experiment (ARCHITECTURE.md 'known future optimizations' #4):
reformulate the sphere battery's two [R,3]x[3,P] contractions (d.C and p.C)
as dot_generals so they run on the MXU, vs the fused VPU elementwise battery.

The contraction depth is K=3 — the MXU is a 128x128 systolic array, so a
K=3 matmul uses 3/128 of its pipeline; this measures whether XLA's
mixed-precision f32 matmul path (3-6 bf16 passes) can still beat the VPU,
or whether the K=3 utilization floor kills it (the expected outcome).

    python benchmarks/diag_mxu.py [--rays 262144] [--prims 1024]
"""
import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=1 << 18)
    ap.add_argument("--prims", type=int, default=1024)
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from cpu_raytracing_experiments_tpu.core.vec import Vec3
    from cpu_raytracing_experiments_tpu.ops import intersect

    R, P = args.rays, args.prims
    rng = np.random.default_rng(0)
    p = Vec3(*[jnp.asarray(rng.uniform(-8, 8, R).astype(np.float32))
               for _ in range(3)])
    dm = rng.normal(size=(R, 3)).astype(np.float32)
    dm /= np.linalg.norm(dm, axis=1, keepdims=True)
    d = Vec3(*[jnp.asarray(dm[:, i]) for i in range(3)])
    c = rng.uniform(-8, 8, (P, 3)).astype(np.float32)
    center = Vec3(*[jnp.asarray(c[:, i]) for i in range(3)])
    rsq = jnp.asarray(rng.uniform(0.01, 0.25, P).astype(np.float32))

    dmat = jnp.stack([d.x, d.y, d.z], axis=1)        # [R, 3]
    pmat = jnp.stack([p.x, p.y, p.z], axis=1)        # [R, 3]
    cmat = jnp.stack([center.x, center.y, center.z])  # [3, P]
    c2 = jnp.sum(cmat * cmat, axis=0)                 # [P]

    @jax.jit
    def battery_vpu(p, d, center, rsq):
        t, i = intersect.intersect_spheres(p, d, center, rsq,
                                           prim_chunk=P)
        return t, i

    @jax.jit
    def battery_mxu(dmat, pmat, cmat, c2, rsq):
        # b = d.(C-p) = dC - d.p ; |C-p|^2 = |C|^2 - 2 p.C + |p|^2
        dC = jax.lax.dot_general(
            dmat, cmat, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)           # [R, P] MXU
        pC = jax.lax.dot_general(
            pmat, cmat, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)           # [R, P] MXU
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

    def timeit(f, *a):
        out = f(*a)
        jax.block_until_ready(out)
        float(np.asarray(out[0])[0])  # host read: the only reliable fence
        best = 1e30
        for _ in range(args.reps):
            t0 = time.perf_counter()
            out = f(*a)
            jax.block_until_ready(out)
            float(np.asarray(out[0])[0])
            best = min(best, time.perf_counter() - t0)
        return best, out

    t_v, (tv, iv) = timeit(battery_vpu, p, d, center, rsq)
    t_m, (tm, im) = timeit(battery_mxu, dmat, pmat, cmat, c2, rsq)
    agree = float(np.mean(np.asarray(iv) == np.asarray(im)))
    print(json.dumps({
        "rays": R, "prims": P,
        "vpu_ms": round(t_v * 1e3, 3),
        "mxu_ms": round(t_m * 1e3, 3),
        "vpu_Gtests_s": round(R * P / t_v / 1e9, 1),
        "mxu_Gtests_s": round(R * P / t_m / 1e9, 1),
        "id_agreement": agree,
    }), flush=True)


if __name__ == "__main__":
    main()
