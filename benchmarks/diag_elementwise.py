"""Micro-bench the per-bounce elementwise helpers at 262k lanes inside a
fused scan (64 iters, deps carried, one dispatch)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from cpu_raytracing_experiments_tpu.core import rng, sampling
from cpu_raytracing_experiments_tpu.core.vec import Vec3
from cpu_raytracing_experiments_tpu.ops import closures
from cpu_raytracing_experiments_tpu.render import renderer as RR
from cpu_raytracing_experiments_tpu.scene import builders
from cpu_raytracing_experiments_tpu.utils.config import RendererPolicy

R = 262144
N = 64


def fence(x):
    float(jax.tree.leaves(x)[0].ravel()[0])


def bench(label, f, *args):
    @jax.jit
    def run(*a):
        def body(c, _):
            out = f(c, *a)
            return out, None

        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=N)
        return c

    fence(run(*args))
    best = 1e30
    for _ in range(3):
        t0 = time.perf_counter()
        fence(run(*args))
        best = min(best, time.perf_counter() - t0)
    # subtract measured empty-loop + call overhead baseline later
    print(f"{label:34s}: {best/N*1e3:7.3f} ms/iter  (call {best*1e3:.0f} ms)",
          flush=True)
    return best / N * 1e3


def main():
    print("device:", jax.devices()[0].device_kind, flush=True)
    pol = RendererPolicy()
    seeds = jnp.arange(R, dtype=jnp.uint32)
    rngv = np.random.default_rng(0)
    f32 = lambda: jnp.asarray(rngv.uniform(0.1, 0.9, R).astype(np.float32))
    v = Vec3(f32(), f32(), f32())
    w = Vec3(f32(), f32(), f32())

    base = bench("empty (floor)", lambda c: c * 1.0000001)

    bench("site_state+2 draws (NEE RNG)",
          lambda c: c + 1e-12 * rng.draws(
              rng.hash_2d(jnp.uint32(1), seeds + jnp.uint32(2)), 2
          )[1][0].sum() * 0 + 1e-12 * jnp.sum(rng.draws(
              rng.hash_2d(jnp.uint32(1), seeds + (c).astype(jnp.uint32)), 2
          )[1][1]))
    bench("hash_2d alone",
          lambda c: c + 1e-12 * jnp.sum(rng.hash_2d(
              jnp.uint32(3), seeds + c.astype(jnp.uint32)).astype(jnp.float32)))
    bench("5 uint32 draws",
          lambda c: c + 1e-12 * sum(jnp.sum(d) for d in rng.draws(
              rng.hash_2d(jnp.uint32(1), seeds + c.astype(jnp.uint32)), 5)[1]))

    def cone(c):
        dir_s, dist_s, pdf_s = sampling.sample_direction_to_sphere(
            v, w.x * 0.01, w.y * 10.0, w.z * 0.1,
            jnp.clip(v.x + c * 0, 0.0, 1.0), v.y)
        return c + 1e-12 * jnp.sum(dir_s.x + dist_s + pdf_s)

    bench("sample_direction_to_sphere", cone)

    def tangent(c):
        q = sampling.tangent_space(v)
        l = sampling.to_local(q, w)
        return c + 1e-12 * jnp.sum(l.z)

    bench("tangent_space+to_local", tangent)

    def lamb(c):
        bs = closures.lambert_sample(w, v, jnp.clip(v.x + c * 0, 0, 1), v.y)
        return c + 1e-12 * jnp.sum(bs.direction.z + bs.estimator.x)

    bench("lambert_sample", lamb)

    scene = builders.random_spheres_scene(64, 64, num_spheres=1000)
    prim_id = jnp.asarray(rngv.integers(0, 1000, R).astype(np.int32))
    tfar = f32() * 10

    def chf(c):
        st = RR.PathState(
            bounce=jnp.int32(1), p=v, d=w,
            throughput=Vec3.ones((R,)), radiance=Vec3.zeros((R,)),
            prev_pdf=tfar * 0, prev_delta=prim_id < 0,
            alive=prim_id >= 0, ray_count=jnp.uint32(0))
        p_off, n, t_quat, v_local, mat_id, backface, hit_pt, _px = (
            RR._closest_hit_frame(scene, st, tfar + c * 0, prim_id,
                                  prim_id < 0))
        return c + 1e-12 * jnp.sum(v_local.z + p_off.x + mat_id)

    bench("_closest_hit_frame", chf)

    print(f"(floor to subtract: {base:.3f} ms)", flush=True)


if __name__ == "__main__":
    main()
