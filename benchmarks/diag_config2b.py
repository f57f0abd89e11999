"""Config-2 stage breakdown with FUSED dispatch (n passes in one jit call,
scalar host-read fence) — the per-call axon round-trip (~27 ms) poisoned the
per-pass numbers in diag_config2.py."""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from cpu_raytracing_experiments_tpu.core.vec import Vec3
from cpu_raytracing_experiments_tpu.ops import intersect
from cpu_raytracing_experiments_tpu.render import estimator
from cpu_raytracing_experiments_tpu.scene import accel, builders
from cpu_raytracing_experiments_tpu.utils.config import RendererPolicy

W = H = 512
PASSES = 8


def fence(x):
    float(jax.tree.leaves(x)[0].ravel()[0])


def per_pass_ms(scene, pol, label):
    from functools import partial

    @partial(jax.jit, donate_argnames=("state",))
    def run(scene, state):
        return estimator.accumulate_n(scene, pol, state, W, H, PASSES)

    state = estimator.RenderState.create(W, H, pol)
    state = run(scene, state)
    fence(state.buckets)
    best = 1e30
    for _ in range(3):
        state = estimator.RenderState.create(W, H, pol)
        t0 = time.perf_counter()
        state = run(scene, state)
        fence(state.buckets)
        best = min(best, (time.perf_counter() - t0) / PASSES)
    print(f"{label}: {best*1e3:.1f} ms/pass", flush=True)
    return best * 1e3


def main():
    print("device:", jax.devices()[0].device_kind, flush=True)
    scene = builders.random_spheres_scene(W, H, num_spheres=1000)

    # fused battery rate at config-2 shape: scan 16 dependent batteries
    R = W * H
    rng = np.random.default_rng(0)
    p = Vec3(*[jnp.asarray(rng.uniform(-6, 6, R).astype(np.float32)) for _ in range(3)])
    dn = rng.normal(size=(R, 3)).astype(np.float32)
    dn /= np.linalg.norm(dn, axis=1, keepdims=True)
    d = Vec3(*[jnp.asarray(dn[:, i]) for i in range(3)])
    sp = scene.spheres

    @jax.jit
    def bat16(p, d):
        def body(carry, _):
            t, _i = intersect.intersect_spheres(
                Vec3(p.x + carry, p.y, p.z), d, sp.center, sp.radius_sq)
            return carry + 1e-6 * jnp.minimum(t, 1.0).sum() * 0, t.sum() * 0

        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=16)
        return c

    fence(bat16(p, d))
    t0 = time.perf_counter(); fence(bat16(p, d)); dt = time.perf_counter() - t0
    per = dt / 16
    print(f"fused battery: {per*1e3:.2f} ms per [262144 x 1000] = "
          f"{R*1000/per/1e9:.1f} Gtests/s", flush=True)

    full = per_pass_ms(scene, RendererPolicy(max_bounces=8), "full 8b")
    per_pass_ms(scene, RendererPolicy(max_bounces=1), "1 bounce")
    per_pass_ms(scene, RendererPolicy(max_bounces=2), "2 bounces")
    per_pass_ms(scene, RendererPolicy(max_bounces=4), "4 bounces")
    no_mis = per_pass_ms(scene, RendererPolicy(max_bounces=8, mis=False), "no MIS/NEE 8b")
    print(f"NEE+shadow share: {full-no_mis:.1f} ms", flush=True)

    sc = accel.with_pallas_clusters(scene, cluster_size=128)
    for tile_r in (256, 512):
        per_pass_ms(sc, RendererPolicy(max_bounces=8, accel="pallas",
                                       pallas_tile_rays=tile_r),
                    f"pallas tile_r={tile_r} 8b")


if __name__ == "__main__":
    main()
