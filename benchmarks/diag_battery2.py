"""Honest fused battery timings (results genuinely feed the scan carry, so
XLA cannot DCE them) for closest-hit and shadow batteries at config-2 shape."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from cpu_raytracing_experiments_tpu.core.vec import Vec3
from cpu_raytracing_experiments_tpu.ops import intersect
from cpu_raytracing_experiments_tpu.scene import builders


def fence(x):
    float(jax.tree.leaves(x)[0].ravel()[0])


def main():
    W = H = 512
    R = W * H
    scene = builders.random_spheres_scene(W, H, num_spheres=1000)
    sp = scene.spheres
    print("device:", jax.devices()[0].device_kind,
          "n_lights:", int(scene.lights.shape[0]), flush=True)
    rng = np.random.default_rng(0)
    p = Vec3(*[jnp.asarray(rng.uniform(-6, 6, R).astype(np.float32)) for _ in range(3)])
    dn = rng.normal(size=(R, 3)).astype(np.float32)
    dn /= np.linalg.norm(dn, axis=1, keepdims=True)
    d = Vec3(*[jnp.asarray(dn[:, i]) for i in range(3)])

    N = 16

    @jax.jit
    def closest16(p, d):
        def body(carry, _):
            t, i = intersect.intersect_spheres(
                Vec3(p.x + carry, p.y, p.z), d, sp.center, sp.radius_sq)
            carry = carry + 1e-7 * jnp.min(jnp.where(jnp.isfinite(t), t, 0.0))
            carry = carry + 1e-9 * jnp.max(i).astype(jnp.float32)
            return carry, None

        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=N)
        return c

    @jax.jit
    def shadow16(p, d):
        tf = jnp.full((R,), 5.0)

        def body(carry, _):
            occ = intersect.occluded_spheres(
                Vec3(p.x + carry, p.y, p.z), d, tf, sp.center, sp.radius_sq)
            return carry + 1e-7 * jnp.sum(occ).astype(jnp.float32), None

        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=N)
        return c

    for name, f in (("closest", closest16), ("shadow", shadow16)):
        fence(f(p, d))
        best = 1e30
        for _ in range(3):
            t0 = time.perf_counter()
            fence(f(p, d))
            best = min(best, time.perf_counter() - t0)
        per = best / N
        print(f"{name} battery fused: {per*1e3:.2f} ms per [262144x1000] = "
              f"{R*1000/per/1e9:.1f} Gtests/s", flush=True)


if __name__ == "__main__":
    main()
