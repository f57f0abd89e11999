"""Dense sphere battery: production XLA fusion vs the VMEM-tiled Pallas
kernel (ops/pallas/sphere_kernel.py) — re-measured AFTER the round-5
reduce-phase fix.

ARCHITECTURE.md's "XLA's own fusion is already within ~20% of it" verdict
for the Pallas sphere kernel predates every epilogue/narrowing change
since round 1; no harness in benchmarks/ ever exercised the kernel. With
config 2 pinned as battery-bound and its XLA epilogue now at the vreduce
floor, this is the one remaining unmeasured corner of the config-2
ledger: does keeping the [TILE_R x P] candidate matrix in VMEM (one
pallas program per 1024-ray tile, full sphere table broadcast) beat
XLA's fusion of the same math?

Variants (bit-compared before timing):
  * closest_xla    — _sphere_candidates + the production one-pass
                     variadic vreduce argmin (exactly prod's epilogue)
  * closest_pallas — intersect_spheres_pallas (in-kernel min+argmin)
  * occl_xla       — the production sqrt-free any-hit battery
  * occl_pallas    — occluded_spheres_pallas

Timing: x64-fused scan with origin perturbation (no CSE), empty-scan
floor subtracted (RESULTS.md methodology).

Run on TPU: python benchmarks/diag_battery4.py [--rays 262144] [--prims 1024]
"""
import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

FLT_MAX = np.float32(3.4028235e38)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=262144)
    ap.add_argument("--prims", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=64)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (interpret-mode smoke test)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax import lax

    from cpu_raytracing_experiments_tpu.core.vec import Vec3
    from cpu_raytracing_experiments_tpu.ops import intersect
    from cpu_raytracing_experiments_tpu.ops.pallas import sphere_kernel as pk

    interp = args.cpu  # Mosaic on TPU, interpreter on CPU
    print(f"device={jax.devices()[0].device_kind}", flush=True)
    rng = np.random.default_rng(7)
    R, P = args.rays, args.prims
    p = Vec3(*(jnp.asarray(rng.uniform(-4, 4, R).astype(np.float32))
               for _ in range(3)))
    dn = rng.normal(size=(3, R)).astype(np.float32)
    dn /= np.linalg.norm(dn, axis=0, keepdims=True)
    d = Vec3(*(jnp.asarray(x) for x in dn))
    c = [jnp.asarray(rng.uniform(-5, 5, P).astype(np.float32))
         for _ in range(3)]
    r_sq = jnp.asarray((rng.uniform(0.05, 0.4, P).astype(np.float32)) ** 2)
    center = Vec3(*c)
    tfar0 = jnp.full((R,), 8.0, jnp.float32)  # shadow-ray style finite tfar

    def closest_xla(p, d):
        t = intersect._sphere_candidates(p, d, c[0], c[1], c[2], r_sq)
        iota = lax.broadcasted_iota(jnp.int32, t.shape, 1)

        def comp(a, b):
            at, ai = a
            bt, bi = b
            pick_b = (bt < at) | ((bt == at) & (bi < ai))
            return (jnp.where(pick_b, bt, at), jnp.where(pick_b, bi, ai))

        best, first = lax.reduce(
            (t, iota), (jnp.float32(FLT_MAX), jnp.int32(1 << 30)), comp, (1,))
        return best, jnp.where(best < FLT_MAX, first, -1)

    def closest_pallas(p, d):
        return pk.intersect_spheres_pallas(p, d, center, r_sq,
                                           interpret=interp)

    def occl_xla(p, d):
        return intersect._sphere_occluded_pairs(
            p, d, tfar0, c[0], c[1], c[2], r_sq).any(axis=1)

    def occl_pallas(p, d):
        return pk.occluded_spheres_pallas(p, d, tfar0, center, r_sq,
                                          interpret=interp)

    # exactness gates
    ct, ci = jax.jit(closest_xla)(p, d)
    pt, pi = jax.jit(closest_pallas)(p, d)
    assert np.array_equal(np.asarray(ct), np.asarray(pt)), "closest t"
    assert np.array_equal(np.asarray(ci), np.asarray(pi)), "closest id"
    ox = jax.jit(occl_xla)(p, d)
    op = jax.jit(occl_pallas)(p, d)
    assert np.array_equal(np.asarray(ox), np.asarray(op)), "occluded"
    print("exactness: pallas bit-equal to prod XLA (closest + occluded)",
          flush=True)

    def timed(fn, scalarize):
        @jax.jit
        def fused(p, d):
            def body(carry, _):
                pp = Vec3(p.x + carry * 1e-7, p.y, p.z)
                out = fn(pp, d)
                return carry + jnp.float32(1e-6), scalarize(out)
            carry, s = lax.scan(body, jnp.float32(0), None,
                                length=args.iters)
            return jnp.sum(s)

        fused(p, d).block_until_ready()
        dt = 1e30
        for _ in range(3):
            t0 = time.perf_counter()
            fused(p, d).block_until_ready()
            dt = min(dt, time.perf_counter() - t0)
        return dt / args.iters

    @jax.jit
    def empty(p, d):
        def body(carry, _):
            return carry + jnp.float32(1e-6), carry
        carry, _ = lax.scan(body, jnp.float32(0), None, length=args.iters)
        return jnp.sum(carry)

    empty(p, d).block_until_ready()
    t0 = time.perf_counter()
    empty(p, d).block_until_ready()
    floor = (time.perf_counter() - t0) / args.iters

    def s_closest(out):
        t, i = out
        return jnp.min(t) + jnp.float32(jnp.max(i))

    def s_occl(out):
        return jnp.float32(jnp.sum(out))

    for name, fn, sc in (("closest_xla", closest_xla, s_closest),
                         ("closest_pallas", closest_pallas, s_closest),
                         ("occl_xla", occl_xla, s_occl),
                         ("occl_pallas", occl_pallas, s_occl)):
        ms = (timed(fn, sc) - floor) * 1e3
        print(json.dumps({"variant": name, "R": R, "P": P,
                          "ms_per_call": round(ms, 3)}), flush=True)


if __name__ == "__main__":
    main()
