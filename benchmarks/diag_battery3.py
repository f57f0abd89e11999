"""Config-2 closest-hit battery: reduce-phase strategy A/B.

The production battery (ops/intersect.py::intersect_spheres) computes the
[R, C] candidate matrix, min-reduces it for chunk_best, then re-compares
`t == chunk_best` against a broadcast iota for the first-index argmin — the
candidate matrix feeds TWO reduces, so XLA either materializes [R, C] in
HBM or recomputes the battery math per reduce. This measures that cost in
isolation against:

  * minonly — the min reduce alone (lower bound: what argmin adds on top)
  * prod    — the production two-reduce min + iota-compare argmin
  * vreduce — one-pass variadic lax.reduce((t, iota)) argmin (battery math
              feeds ONE reduce; tie-break = smallest index, matching prod)
  * pack    — bitcast-packed single f32/int32 key argmin: key = (t_bits
              << 0) with index in the low bits is impossible in 32 bits, so
              this packs into one int64-free form: int32 key = t_bits
              (monotone for t >= 0) reduced with jnp.min, index recovered
              by one compare pass against the WINNING KEY (still two
              passes, but the second compares int equality — tests whether
              the recompute is the cost or the float compare is)

All variants must agree exactly with prod on (t, id) — asserted on a
random field before timing. Timing: x64-fused scan, empty-scan floor
subtracted (RESULTS.md methodology).

Run on TPU: python benchmarks/diag_battery3.py [--rays 262144] [--prims 1024]
"""
import argparse
import json
import sys
import time
from functools import partial
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
                    help="force the CPU backend (smoke test; env vars are "
                         "too late under the axon sitecustomize)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax import lax

    from cpu_raytracing_experiments_tpu.core.vec import Vec3
    from cpu_raytracing_experiments_tpu.ops import intersect

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

    def cand(p, d):
        return intersect._sphere_candidates(p, d, c[0], c[1], c[2], r_sq)

    def v_prod(p, d):
        t = cand(p, d)
        best = jnp.min(t, axis=1)
        iota = lax.broadcasted_iota(jnp.int32, t.shape, 1)
        first = jnp.min(
            jnp.where(t == best[:, None], iota, jnp.int32(1 << 30)), axis=1)
        return best, jnp.where(best < FLT_MAX, first, -1)

    def v_minonly(p, d):
        t = cand(p, d)
        best = jnp.min(t, axis=1)
        return best, jnp.zeros(best.shape, jnp.int32)

    def v_vreduce(p, d):
        t = cand(p, d)
        iota = lax.broadcasted_iota(jnp.int32, t.shape, 1)

        def comp(a, b):
            at, ai = a
            bt, bi = b
            pick_b = (bt < at) | ((bt == at) & (bi < ai))
            return (jnp.where(pick_b, bt, at), jnp.where(pick_b, bi, ai))

        best, first = lax.reduce(
            (t, iota), (jnp.float32(FLT_MAX), jnp.int32(1 << 30)), comp, (1,))
        return best, jnp.where(best < FLT_MAX, first, -1)

    def v_pack(p, d):
        t = cand(p, d)
        # t >= 0 everywhere (misses are FLT_MAX), so the int32 bit pattern
        # is monotone in t and min over keys == min over t.
        key = lax.bitcast_convert_type(t, jnp.int32)
        kbest = jnp.min(key, axis=1)
        iota = lax.broadcasted_iota(jnp.int32, key.shape, 1)
        first = jnp.min(
            jnp.where(key == kbest[:, None], iota, jnp.int32(1 << 30)), axis=1)
        best = lax.bitcast_convert_type(kbest, jnp.float32)
        return best, jnp.where(best < FLT_MAX, first, -1)

    variants = {"minonly": v_minonly, "prod": v_prod, "vreduce": v_vreduce,
                "pack": v_pack}

    # exactness gate (id for minonly exempt)
    ref_t, ref_i = jax.jit(v_prod)(p, d)
    ref_t, ref_i = np.asarray(ref_t), np.asarray(ref_i)
    for name, fn in variants.items():
        tt, ii = jax.jit(fn)(p, d)
        assert np.array_equal(np.asarray(tt), ref_t), name
        if name not in ("minonly",):
            assert np.array_equal(np.asarray(ii), ref_i), name
    print("exactness: all variants bit-equal to prod", flush=True)

    def timed(fn):
        @jax.jit
        def fused(p, d):
            def body(carry, _):
                pp = Vec3(p.x + carry * 1e-7, p.y, p.z)
                t, i = fn(pp, d)
                return carry + jnp.float32(1e-6), (jnp.min(t), jnp.max(i))
            carry, (ts, is_) = lax.scan(
                body, jnp.float32(0), None, length=args.iters)
            return jnp.sum(ts) + jnp.float32(jnp.sum(is_))

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
        return carry

    empty(p, d).block_until_ready()
    t0 = time.perf_counter()
    empty(p, d).block_until_ready()
    floor = (time.perf_counter() - t0) / args.iters

    for name, fn in variants.items():
        ms = (timed(fn) - floor) * 1e3
        print(json.dumps({"variant": name, "R": R, "P": P,
                          "ms_per_call": round(ms, 3)}), flush=True)


if __name__ == "__main__":
    main()
