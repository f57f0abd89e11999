"""NEE/closest battery batching proxy (ROADMAP 4b, VERDICT r3 item 6).

The proposed restructure rotates the bounce loop so bounce i's shadow
battery and bounce i+1's closest battery run as ONE [2R x P] sweep,
halving per-bounce battery op count. Same FLOPs — the win, if any, is
per-op fixed cost. Before the invasive loop rotation, this measures the
ceiling in isolation: one [2R, P] battery vs two [R, P] batteries
(closest + sqrt-free any-hit, the real pair) at hero/DoF widths on the
hero scene's 9 spheres and on 1k prims, x`N`-fused, floor-subtracted.

If the isolated fused-vs-split delta is ~zero, the restructure cannot
win and the verdict is recorded without building it.

    python benchmarks/diag_batched_battery.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from cpu_raytracing_experiments_tpu.core.vec import Vec3
from cpu_raytracing_experiments_tpu.ops import intersect

N = 64


def fence(x):
    jax.block_until_ready(x)
    np.asarray(jax.tree.leaves(x)[0].ravel()[:1])


def best_s(fn, reps=4):
    out = fn(); fence(out)
    best = 1e30
    for _ in range(reps):
        t0 = time.perf_counter(); out = fn(); fence(out)
        best = min(best, time.perf_counter() - t0)
    return best


def rays(r, seed):
    g = np.random.default_rng(seed)
    p = g.uniform(-5, 5, (r, 3)).astype(np.float32)
    d = g.normal(size=(r, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return (Vec3(*[jnp.asarray(p[:, i]) for i in range(3)]),
            Vec3(*[jnp.asarray(d[:, i]) for i in range(3)]))


def main():
    print(f"device={jax.devices()[0].device_kind}", flush=True)

    @jax.jit
    def floor_run():
        return jax.lax.fori_loop(0, N, lambda i, a: a + jnp.float32(i),
                                 jnp.float32(0))

    floor = best_s(floor_run)
    print(f"floor {floor*1e3:.1f} ms / N={N}", flush=True)

    for P in (9, 1000):
        g = np.random.default_rng(3)
        c = g.uniform(-8, 8, (P, 3)).astype(np.float32)
        rad = g.uniform(0.3, 1.5, P).astype(np.float32)
        geom = (Vec3(*[jnp.asarray(c[:, i]) for i in range(3)]),
                jnp.asarray(rad ** 2))
        for R in (1 << 19, 1 << 21):  # chunk width / full 1080p
            pc, dc = rays(R, 1)   # "closest" rays
            ps, ds = rays(R, 2)   # "shadow" rays
            tfs = jnp.full((R,), 8.0, jnp.float32)

            @jax.jit
            def split():
                def stp(i, a):
                    eps = jnp.float32(i) * 1e-7
                    t, pid = intersect.intersect_spheres(
                        Vec3(pc.x + eps, pc.y, pc.z), dc, *geom)
                    occ = intersect.occluded_spheres(
                        Vec3(ps.x + eps, ps.y, ps.z), ds, tfs, *geom)
                    return a + t[0] + pid.astype(jnp.float32)[0] + occ.astype(jnp.float32)[0]
                return jax.lax.fori_loop(0, N, stp, jnp.float32(0))

            @jax.jit
            def fused():
                # one [2R, P] closest battery; shadow resolved as
                # t < tfar on its half (an any-hit via the closest
                # battery — an UPPER-variant: the true fused design
                # would keep the cheaper any-hit predicate for its
                # half, so report both framings)
                p2 = Vec3(*(jnp.concatenate([a, b]) for a, b in
                            zip((pc.x, pc.y, pc.z), (ps.x, ps.y, ps.z))))
                d2 = Vec3(*(jnp.concatenate([a, b]) for a, b in
                            zip((dc.x, dc.y, dc.z), (ds.x, ds.y, ds.z))))
                def stp(i, a):
                    eps = jnp.float32(i) * 1e-7
                    t, pid = intersect.intersect_spheres(
                        Vec3(p2.x + eps, p2.y, p2.z), d2, *geom)
                    occ = t[R:] < tfs
                    return a + t[0] + pid.astype(jnp.float32)[0] + occ.astype(jnp.float32)[0]
                return jax.lax.fori_loop(0, N, stp, jnp.float32(0))

            sp = (best_s(split) - floor) * 1e3 / N
            fu = (best_s(fused) - floor) * 1e3 / N
            print(f"P={P:5d} R={R}: split {sp:7.3f} ms  "
                  f"fused2R {fu:7.3f} ms  ratio {fu/sp:.3f}", flush=True)


if __name__ == "__main__":
    main()
