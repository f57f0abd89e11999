"""Batched TPU diagnostics (run when the axon tunnel is healthy):
1. execution-time budget: how long can a single XLA execution run?
2. threaded-BVH traversal throughput vs brute force across prim counts
3. pooled vs masked wavefront at 1080p
Writes JSON lines to benchmarks/tpu_diag.jsonl as it goes (crash-safe).
"""
import json
import signal
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

OUT = Path(__file__).parent / "tpu_diag.jsonl"


def log(**rec):
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


class Timeout(Exception):
    pass


def with_timeout(seconds, fn, *args):
    def raise_(s, f):
        raise Timeout()

    old = signal.signal(signal.SIGALRM, raise_)
    signal.alarm(seconds)
    try:
        return fn(*args)
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    which = sys.argv[1] if len(sys.argv) > 1 else "all"

    if which in ("all", "budget"):
        # 1. execution-time budget: while_loop burning ~n iterations of VPU work
        @jax.jit
        def burn(n):
            def body(c):
                i, x = c
                return i + 1, jnp.sin(x) * 1.0001

            _, x = jax.lax.while_loop(
                lambda c: c[0] < n, body, (jnp.int32(0), jnp.ones((8, 128)))
            )
            return x.sum()

        # calibrate iterations/second (after a warmup to exclude compile)
        burn(jnp.int32(1000)).block_until_ready()
        t0 = time.perf_counter()
        burn(jnp.int32(5_000_000)).block_until_ready()
        cal = time.perf_counter() - t0
        ips = 5_000_000 / cal
        log(event="burn_calibration", iters_per_s=int(ips), wall_s=round(cal, 2))
        for target_s in (5, 15, 30, 60, 120):
            n = int(ips * target_s)
            try:
                t0 = time.perf_counter()
                with_timeout(
                    target_s * 3 + 60,
                    lambda: burn(jnp.int32(n)).block_until_ready(),
                )
                log(event="burn", target_s=target_s,
                    actual_s=round(time.perf_counter() - t0, 1), ok=True)
            except Exception as e:
                log(event="burn", target_s=target_s, ok=False,
                    error=type(e).__name__)
                return  # device likely wedged

    if which in ("all", "traversal"):
        from cpu_raytracing_experiments_tpu.bvh import builder, traverse
        from cpu_raytracing_experiments_tpu.core.vec import Vec3
        from cpu_raytracing_experiments_tpu.ops import intersect

        g = np.random.default_rng(0)
        n = 65536
        p = Vec3(*[jnp.asarray(g.uniform(-90, 90, n).astype(np.float32)) for _ in range(3)])
        dn = g.normal(size=(n, 3)).astype(np.float32)
        dn /= np.linalg.norm(dn, axis=1, keepdims=True)
        d = Vec3(*[jnp.asarray(dn[:, k]) for k in range(3)])
        for m in (256, 1024, 8192, 65536):
            c = g.uniform(-100, 100, (m, 3)).astype(np.float32)
            r = (g.uniform(0.3, 3.0, m) * (1000.0 / m) ** 0.33).astype(np.float32)
            arrays, order = builder.build_bvh(c - r[:, None], c + r[:, None], leaf_size=8)
            c2, r2 = c[order], r[order]
            center = Vec3(*[jnp.asarray(c2[:, k]) for k in range(3)])
            rsq = jnp.asarray(r2 * r2)
            trav = jax.jit(
                lambda p, d: traverse.traverse_closest(
                    arrays, p, d, traverse.sphere_leaf_test(center, rsq)
                )
            )
            brute = jax.jit(
                lambda p, d: intersect.intersect_spheres(p, d, center, rsq)
            )
            for name, fn in (("bvh", trav), ("brute", brute)):
                if name == "brute" and m > 20000:
                    continue  # too slow / memory heavy
                try:
                    t, pid = with_timeout(240, fn, p, d)
                    jax.block_until_ready(t)
                    t0 = time.perf_counter()
                    reps = 5
                    for _ in range(reps):
                        t, pid = fn(p, d)
                    jax.block_until_ready(t)
                    dt = (time.perf_counter() - t0) / reps
                    log(event="traversal", prims=m, kind=name,
                        ms=round(dt * 1e3, 2),
                        mrays_per_s=round(n / dt / 1e6, 1),
                        hits=int((np.asarray(pid) >= 0).sum()))
                except Exception as e:
                    log(event="traversal", prims=m, kind=name, ok=False,
                        error=type(e).__name__)
                    return

    if which in ("all", "renders"):
        import dataclasses

        from cpu_raytracing_experiments_tpu.render import renderer
        from cpu_raytracing_experiments_tpu.scene import accel, builders
        from cpu_raytracing_experiments_tpu.utils.config import RendererPolicy

        W = H = 256
        base = builders.random_spheres_scene(W, H, num_spheres=1000)
        log(event="render_1k_setup", stage="base_built")
        cases = {
            "brute": (lambda: base, RendererPolicy(max_bounces=8, rays_per_chunk=65536)),
            "bvh": (lambda: accel.with_bvh(base),
                    RendererPolicy(max_bounces=8, rays_per_chunk=65536, accel="bvh")),
            "grid": (lambda: accel.with_grid(base, res=32),
                     RendererPolicy(max_bounces=8, rays_per_chunk=65536, accel="grid")),
        }
        for name, (mk, pol) in cases.items():
            try:
                sc = with_timeout(180, mk)
                log(event="render_1k_setup", stage=name)
            except Exception as e:
                log(event="render_1k_setup", stage=name, ok=False, error=type(e).__name__)
                return
            f = jax.jit(lambda s, a, _p=pol: renderer.render_pass(s, _p, a, W, H))
            try:
                rad, cnt = with_timeout(240, f, sc, jnp.uint32(1))
                jax.block_until_ready(rad)
                t0 = time.perf_counter()
                reps = 3
                for k in range(reps):
                    rad, cnt = f(sc, jnp.uint32(k + 2))
                jax.block_until_ready(rad)
                dt = (time.perf_counter() - t0) / reps
                log(event="render_1k", kind=name, ms=round(dt * 1e3, 1),
                    mrays_per_s=round(int(cnt) / dt / 1e6, 2))
            except Exception as e:
                log(event="render_1k", kind=name, ok=False, error=type(e).__name__)
                return

        # mesh scene (82k tris) small frame, grid accel
        W2 = H2 = 192
        mesh = accel.with_grid(builders.mesh_scene(W2, H2, subdivisions=6), res=48)
        pol = RendererPolicy(max_bounces=5, rays_per_chunk=36864, accel="grid")
        f = jax.jit(lambda s, a: renderer.render_pass(s, pol, a, W2, H2))
        try:
            rad, cnt = with_timeout(280, f, mesh, jnp.uint32(1))
            jax.block_until_ready(rad)
            t0 = time.perf_counter()
            rad, cnt = f(mesh, jnp.uint32(2))
            jax.block_until_ready(rad)
            dt = time.perf_counter() - t0
            log(event="render_mesh82k", kind="grid", ms=round(dt * 1e3, 1),
                mrays_per_s=round(int(cnt) / dt / 1e6, 2))
        except Exception as e:
            log(event="render_mesh82k", kind="grid", ok=False, error=type(e).__name__)
            return

    if which in ("all", "shares"):
        from cpu_raytracing_experiments_tpu.scene import builders
        from cpu_raytracing_experiments_tpu.utils.config import RendererPolicy
        from cpu_raytracing_experiments_tpu.utils.profiling import stage_shares

        try:
            scene = builders.default_scene(1920, 1088)
            pol = RendererPolicy(max_bounces=8, rays_per_chunk=1 << 19)
            shares = with_timeout(400, stage_shares, scene, pol, 1920, 1088, 5)
            log(event="stage_shares", **{k: round(v * 1e3, 2) for k, v in shares.items()})
        except Exception as e:
            log(event="stage_shares", ok=False, error=type(e).__name__)
            return

    if which in ("all", "pool"):
        from functools import partial

        from cpu_raytracing_experiments_tpu.render import renderer, wavefront_pool
        from cpu_raytracing_experiments_tpu.scene import builders
        from cpu_raytracing_experiments_tpu.utils.config import RendererPolicy

        W, H = 1920, 1088
        scene = builders.default_scene(W, H)
        for name, fn_mod in (("masked", renderer.render_pass),
                             ("pooled", wavefront_pool.render_pass_pooled)):
            pol = RendererPolicy(max_bounces=8, rays_per_chunk=1 << 19)
            f = jax.jit(lambda s, a: fn_mod(s, pol, a, W, H))
            try:
                rad, cnt = with_timeout(300, f, scene, jnp.uint32(1))
                jax.block_until_ready(rad)
                t0 = time.perf_counter()
                reps = 10
                for k in range(reps):
                    rad, cnt = f(scene, jnp.uint32(k + 2))
                jax.block_until_ready(rad)
                dt = (time.perf_counter() - t0) / reps
                log(event="pool_compare", kind=name, ms=round(dt * 1e3, 1),
                    mrays_per_s=round(int(cnt) / dt / 1e6, 1),
                    msamples_per_s=round(W * H / dt / 1e6, 1))
            except Exception as e:
                log(event="pool_compare", kind=name, ok=False, error=type(e).__name__)
                return


if __name__ == "__main__":
    main()
