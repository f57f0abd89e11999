"""Why is the sphere battery 8 Gtests/s while the triangle battery was
recorded at 45?  Sweep shapes/formulations on the real chip."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from cpu_raytracing_experiments_tpu.core.vec import Vec3
from cpu_raytracing_experiments_tpu.ops import intersect


def fence(x):
    float(jax.tree.leaves(x)[0].ravel()[0])


def timeit(fn, reps=3):
    fn()
    best = 1e30
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def rays(R, seed=0):
    rng = np.random.default_rng(seed)
    p = rng.uniform(-6, 6, (R, 3)).astype(np.float32)
    d = rng.normal(size=(R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return (Vec3(*[jnp.asarray(p[:, i]) for i in range(3)]),
            Vec3(*[jnp.asarray(d[:, i]) for i in range(3)]))


def spheres(P, seed=1):
    rng = np.random.default_rng(seed)
    c = rng.uniform(-5, 5, (P, 3)).astype(np.float32)
    r = rng.uniform(0.1, 0.5, P).astype(np.float32)
    return Vec3(*[jnp.asarray(c[:, i]) for i in range(3)]), jnp.asarray(r ** 2)


def tris(P, seed=2):
    rng = np.random.default_rng(seed)
    v0 = rng.uniform(-5, 5, (P, 3)).astype(np.float32)
    e1 = rng.normal(0, 0.15, (P, 3)).astype(np.float32)
    e2 = rng.normal(0, 0.15, (P, 3)).astype(np.float32)
    return tuple(Vec3(*[jnp.asarray(a[:, i]) for i in range(3)]) for a in (v0, e1, e2))


def main():
    R = 262144
    p, d = rays(R)
    print("device:", jax.devices()[0].device_kind, f"R={R}", flush=True)

    for P in (1000, 1024):
        c, rsq = spheres(P)
        for chunk in (256, 512, 1024):
            f = jax.jit(lambda p, d: intersect.intersect_spheres(
                p, d, c, rsq, prim_chunk=chunk))
            ms = timeit(lambda: fence(f(p, d)))
            print(f"sphere P={P} chunk={chunk}: {ms:.2f} ms = "
                  f"{R*P/ms/1e6:.1f} Gtests/s", flush=True)

    for P in (1024, 20480):
        t3 = tris(P)
        for chunk in (1024, 5120):
            f = jax.jit(lambda p, d: intersect.intersect_triangles(
                p, d, *t3, prim_chunk=chunk))
            ms = timeit(lambda: fence(f(p, d)))
            print(f"tri P={P} chunk={chunk}: {ms:.2f} ms = "
                  f"{R*P/ms/1e6:.1f} Gtests/s", flush=True)

    # candidates only (no argmin) — is the reduce the bottleneck?
    c, rsq = spheres(1024)
    f = jax.jit(lambda p, d: jnp.sum(intersect._sphere_candidates(
        p, d, c.x, c.y, c.z, rsq), axis=1))
    ms = timeit(lambda: fence(f(p, d)))
    print(f"sphere candidates+sum P=1024: {ms:.2f} ms = "
          f"{R*1024/ms/1e6:.1f} Gtests/s", flush=True)

    # min+argmin in one pass via min of packed (t, id) trick
    def packed_argmin(p_, d_):
        t = intersect._sphere_candidates(p_, d_, c.x, c.y, c.z, rsq)
        best = jnp.min(t, axis=1)
        arg = jnp.argmin(t, axis=1)
        return best, arg
    f = jax.jit(packed_argmin)
    ms = timeit(lambda: fence(f(p, d)))
    print(f"sphere cand+min+argmin P=1024 single chunk: {ms:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
