"""Direct stage ablation of the config-2 bounce loop. Builds custom
while-loops from renderer internals with stages selectively enabled; every
stage output feeds the carry so nothing is DCE'd. All variants run 8 bounces
with a forced-alive mask so the work is constant across variants (no RR/death
differences) — we're isolating per-stage cost, not convergence."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from cpu_raytracing_experiments_tpu.core import rng, sampling
from cpu_raytracing_experiments_tpu.core.vec import Vec3
from cpu_raytracing_experiments_tpu.ops import closures, intersect
from cpu_raytracing_experiments_tpu.render import renderer as RR
from cpu_raytracing_experiments_tpu.scene import builders
from cpu_raytracing_experiments_tpu.utils.config import RendererPolicy

W = H = 512
R = W * H
B = 8  # bounces


def fence(x):
    float(jax.tree.leaves(x)[0].ravel()[0])


def timeit(f, *a, reps=3):
    fence(f(*a))
    best = 1e30
    for _ in range(reps):
        t0 = time.perf_counter()
        fence(f(*a))
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def main():
    scene = builders.random_spheres_scene(W, H, num_spheres=1000)
    policy = RendererPolicy(max_bounces=B)
    print("device:", jax.devices()[0].device_kind, flush=True)

    accumulation = jnp.uint32(1)
    i = jnp.arange(R, dtype=jnp.uint32)
    x = (i % jnp.uint32(W)).astype(jnp.int32)
    y = (i // jnp.uint32(W)).astype(jnp.int32)
    seeds = RR.pixel_seeds_from_index(i, W, policy, jnp.uint32(0))

    def variant(nee=False, shadow=False, emissive=False, brdf=False,
                frame=True):
        def run():
            p0, d0 = RR.generate_camera_rays(
                scene.camera, x, y, accumulation, seeds, False, policy)

            def body(c):
                b, p, d, acc = c
                alive = jnp.ones((R,), bool)
                tfar, prim_id, is_tri = intersect.intersect_scene(
                    scene, p, d, accel="brute", alive=alive, policy=policy)
                hit = prim_id >= 0
                acc = acc + tfar * 1e-9
                if frame:
                    p_off, n, t_quat, v_local, mat_id, backface, hit_pt, _px = (
                        RR._closest_hit_frame(
                            scene,
                            RR.PathState(
                                bounce=b, p=p, d=d,
                                throughput=Vec3.ones(p.x.shape),
                                radiance=Vec3.zeros(p.x.shape),
                                prev_pdf=tfar * 0, prev_delta=hit,
                                alive=alive, ray_count=jnp.uint32(0)),
                            tfar, prim_id, is_tri))
                    mat = {
                        "albedo": scene.materials.albedo.gather(mat_id),
                        "f0": scene.materials.f0.gather(mat_id),
                        "alpha": scene.materials.roughness[mat_id] ** 2,
                    }
                    acc = acc + v_local.z * 1e-9
                st = RR.PathState(
                    bounce=b, p=p, d=d,
                    throughput=Vec3.ones(p.x.shape),
                    radiance=Vec3.zeros(p.x.shape),
                    prev_pdf=tfar * 0, prev_delta=hit & False,
                    alive=alive, ray_count=jnp.uint32(0))
                if nee:
                    if shadow:
                        cont, traced, _ = RR._next_event_estimation(
                            scene, policy, st, accumulation, seeds, hit,
                            prim_id, is_tri, p_off, t_quat, v_local, mat)
                        acc = acc + cont.x * 1e-9
                    else:
                        # NEE logic only: monkeypatched occlusion -> free
                        orig = intersect.occluded_scene
                        intersect.occluded_scene = (
                            lambda sc, p_, d_, tf, accel=None, policy=None:
                            jnp.zeros_like(tf, bool))
                        try:
                            cont, traced, _ = RR._next_event_estimation(
                                scene, policy, st, accumulation, seeds, hit,
                                prim_id, is_tri, p_off, t_quat, v_local, mat)
                        finally:
                            intersect.occluded_scene = orig
                        acc = acc + cont.x * 1e-9
                if emissive:
                    contribution = RR._emissive_hit(
                        scene, policy, st, hit, prim_id, is_tri, mat_id,
                        tfar, v_local)
                    acc = acc + contribution.x * 1e-9
                if brdf:
                    site = RR._site_state(
                        accumulation, seeds + jnp.uint32(2) *
                        b.astype(jnp.uint32) + jnp.uint32(1), policy)
                    site, (u_draw, v_draw, rr_draw) = rng.draws(site, 3)
                    bs = closures.lambert_sample(
                        mat["albedo"], v_local, u_draw, v_draw)
                    nd = sampling.to_world(t_quat, bs.direction)
                    np_ = p_off
                    acc = acc + bs.estimator.x * 1e-9
                else:
                    nd = Vec3(d.x, d.y, -d.z)
                    np_ = Vec3(p.x + tfar * 0.001, p.y, p.z)
                return (b + 1, np_, nd, acc)

            _, _, _, acc = jax.lax.while_loop(
                lambda c: c[0] < B, body, (jnp.int32(0), p0, d0, p0.x * 0.0))
            return acc

        return jax.jit(run)

    t0 = timeit(variant(frame=False))
    print(f"intersect only        : {t0:7.1f} ms ({t0/B:5.2f}/bounce)", flush=True)
    t1 = timeit(variant())
    print(f"+closest_hit frame    : {t1:7.1f} ms (+{(t1-t0)/B:5.2f}/bounce)", flush=True)
    t2 = timeit(variant(emissive=True))
    print(f"+emissive MIS         : {t2:7.1f} ms (+{(t2-t1)/B:5.2f}/bounce)", flush=True)
    t3 = timeit(variant(emissive=True, nee=True))
    print(f"+NEE logic (no shadow): {t3:7.1f} ms (+{(t3-t2)/B:5.2f}/bounce)", flush=True)
    t4 = timeit(variant(emissive=True, nee=True, shadow=True))
    print(f"+shadow trace         : {t4:7.1f} ms (+{(t4-t3)/B:5.2f}/bounce)", flush=True)
    t5 = timeit(variant(emissive=True, nee=True, shadow=True, brdf=True))
    print(f"+BRDF sample (full-ish): {t5:7.1f} ms (+{(t5-t4)/B:5.2f}/bounce)", flush=True)


if __name__ == "__main__":
    main()
