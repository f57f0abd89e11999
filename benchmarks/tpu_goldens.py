"""On-hardware golden check: render the golden scenes on the real TPU
(Mosaic-compiled kernels, not interpret mode) and compare against the
checked-in CPU goldens (tests/goldens/). The CPU suite validates the Pallas
kernels only in interpret mode; this closes the loop on the compiled path.

    python benchmarks/tpu_goldens.py        # prints one JSON line per scene
"""
import dataclasses
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

GOLDEN_DIR = Path(__file__).resolve().parents[1] / "tests" / "goldens"
SIZE, SPP = 64, 10


def main():
    from cpu_raytracing_experiments_tpu.render.api import Renderer
    from cpu_raytracing_experiments_tpu.scene import accel as accel_mod
    from cpu_raytracing_experiments_tpu.scene import builders
    from cpu_raytracing_experiments_tpu.utils.config import RendererPolicy

    pol = RendererPolicy(max_bounces=6, rays_per_chunk=4096)
    cases = {
        "hero": (builders.default_scene(SIZE, SIZE), pol),
        "cornell": (builders.cornell_box_scene(SIZE, SIZE), pol),
        "white_furnace": (builders.white_furnace_scene(SIZE, SIZE), pol),
        "bvh_test": (  # compiled Pallas traversal on hardware (spheres)
            accel_mod.with_pallas_clusters(
                builders.bvh_test_scene(SIZE, SIZE), cluster_size=64
            ),
            dataclasses.replace(pol, accel="pallas", pallas_tile_rays=64),
        ),
        "mesh": (  # compiled Pallas traversal on hardware (triangles)
            accel_mod.with_pallas_clusters(
                builders.mesh_scene(96, 96, subdivisions=3), cluster_size=64
            ),
            dataclasses.replace(pol, accel="pallas", pallas_tile_rays=64),
        ),
    }
    failures = 0
    hw_imgs = {}
    for name, (scene, p) in cases.items():
        size = 96 if name == "mesh" else SIZE
        r = Renderer(scene, p, size, size)
        r.accumulate(SPP)
        img = np.asarray(r.render(tonemap=False))
        if p.accel == "pallas":
            hw_imgs[name] = (scene, p, size, img)
        want = np.load(GOLDEN_DIR / f"{name}_{size}x{size}_{SPP}spp.npy")
        close = float(np.isclose(img, want, rtol=1e-3, atol=1e-4).mean())
        # cross-PLATFORM tolerance (TPU vs the CPU-rendered goldens) is
        # looser than the same-platform suite's 0.995: different fusion/
        # rounding moves ~1% of the 10-spp hero's high-variance pixels
        # past isclose while the mean relative error stays ~5e-4.
        # The TRIANGLE mesh is looser still (0.92): shared-edge u/v
        # decisions flip under different rounding, and a flipped winner
        # changes that sample's whole downstream path — the same-platform
        # pallas-vs-brute gate below is the real traversal-kernel check.
        ok = close > (0.92 if name == "mesh" else 0.98)
        failures += not ok
        print(json.dumps({
            "scene": name,
            "accel": p.accel,
            "pixels_close": round(close, 5),
            "mean_rel_err": round(
                float(np.abs(img - want).mean() / max(want.mean(), 1e-6)), 6
            ),
            "ok": ok,
        }), flush=True)
    # Same-platform traversal-kernel gate: the compiled Pallas traversal vs
    # the XLA brute battery ON THE SAME DEVICE. This isolates the kernel
    # from CPU-vs-TPU platform rounding: both paths share the hit framing,
    # shading and RNG, and differ only in intersection algebra (brute
    # Moller-Trumbore vs kernel Baldwin-Weber — float-rounding different,
    # so the gate is tight isclose, not bit-equality).
    for name, (scene, p, size, img) in list(hw_imgs.items()):
        pb = dataclasses.replace(p, accel="brute", primary_accel=None)
        rb = Renderer(scene, pb, size, size)
        rb.accumulate(SPP)
        brute_img = np.asarray(rb.render(tonemap=False))
        close = float(np.isclose(img, brute_img, rtol=1e-3, atol=1e-4).mean())
        ok = close > 0.995
        failures += not ok
        print(json.dumps({
            "scene": name, "accel": "pallas_vs_brute_same_device",
            "pixels_close": round(close, 5), "ok": ok,
        }), flush=True)
    # bit-exact traversal-schedule knobs must stay bit-exact when
    # Mosaic-COMPILED too (interpret mode accepts lowerings hardware
    # rejects — and a miscompiled variant could silently render wrong)
    for name, (scene, p, size, base_img) in hw_imgs.items():
        for knobs, tag in (
            (dict(pallas_fuse=True, pallas_trav_block=8), "fuse,tb8"),
        ):
            pv = dataclasses.replace(p, **knobs)
            r = Renderer(scene, pv, size, size)
            r.accumulate(SPP)
            img = np.asarray(r.render(tonemap=False))
            ok = bool(np.array_equal(img, base_img))
            failures += not ok
            print(json.dumps({
                "scene": name, "accel": f"pallas({tag})",
                "bit_exact_vs_default": ok, "ok": ok,
            }), flush=True)
    # HBM-streaming gate at a stream-ELIGIBLE pack: the K=64 scenes above
    # are lane-packed, which clamps pallas_stream off (intersect._tile_for),
    # so stream must be exercised on its own K=128 clustering — resident vs
    # stream over the SAME cp must be bit-exact (this is the gate that
    # caught the cross-program Baldwin-Weber FMA divergence fixed by
    # ClusteredPrims.planes).
    for name, (scene, p, size, _img) in hw_imgs.items():
        s128 = accel_mod.with_pallas_clusters(scene, cluster_size=128)
        imgs = []
        for stream in (False, True):
            pv = dataclasses.replace(p, pallas_stream=stream)
            r = Renderer(s128, pv, size, size)
            r.accumulate(SPP)
            imgs.append(np.asarray(r.render(tonemap=False)))
        ok = bool(np.array_equal(imgs[0], imgs[1]))
        failures += not ok
        print(json.dumps({
            "scene": name, "accel": "pallas(stream,K=128)",
            "bit_exact_vs_resident": ok, "ok": ok,
        }), flush=True)
    failures += _early_exit_gate()
    sys.exit(1 if failures else 0)


def _early_exit_gate(interpret: bool = False):
    """Adversarial check of the traversal early-exit on COMPILED Mosaic.
    Interpret mode never fires the exit (the interpreter's while_loop cond
    reads a stale mx — SMEM writes in the body don't reach cond), so only
    hardware exercises it. The scene forces the spike-then-dip visit-entry
    pattern that the sort=False suffix-min entries exist for: 10 blocker
    clusters (hits shrink mx at the 8-visit refresh), then a far spike,
    then a near dip holding the true closest hit."""
    import dataclasses as dc

    import jax.numpy as jnp

    from cpu_raytracing_experiments_tpu.core.vec import Vec3
    from cpu_raytracing_experiments_tpu.ops import clustered, intersect
    from cpu_raytracing_experiments_tpu.ops.pallas import traverse_kernel as tk

    K = 8
    def blob(z):
        c = np.tile(np.array([[0.0, 0.0, z]], np.float32), (K, 1))
        c[:, 1] += np.linspace(-0.2, 0.2, K)
        return c

    zs = [3.0 + 0.01 * i for i in range(10)] + [5.0, 1.2]
    centers = np.concatenate([blob(z) for z in zs], 0)
    radii = np.full(12 * K, 0.3, np.float32)
    rows = np.concatenate([centers, (radii ** 2)[:, None]], 1)
    cp = clustered.build_clusters(
        centers - radii[:, None], centers + radii[:, None], rows,
        num_clusters=12, kind="sphere",
    )
    perm = np.arange(12 * K, dtype=np.int32)  # force blob-major visit order
    lo = (centers - radii[:, None]).reshape(12, K, 3).min(1)
    hi = (centers + radii[:, None]).reshape(12, K, 3).max(1)
    cp = dc.replace(
        cp, rows=jnp.asarray(rows), order=jnp.asarray(perm),
        lo=Vec3(*[jnp.asarray(lo[:, i]) for i in range(3)]),
        hi=Vec3(*[jnp.asarray(hi[:, i]) for i in range(3)]),
    )
    R = 64
    p0 = np.tile(np.array([[0.0, 0.0, 0.0]], np.float32), (R, 1))
    p0[:, 1] = np.linspace(-0.2, 0.2, R)
    d0 = np.tile(np.array([[0.0, 0.0, 1.0]], np.float32), (R, 1))
    p = Vec3(*[jnp.asarray(p0[:, i]) for i in range(3)])
    d = Vec3(*[jnp.asarray(d0[:, i]) for i in range(3)])
    geom = (
        Vec3(*[jnp.asarray(centers[:, i]) for i in range(3)]),
        jnp.asarray(radii ** 2),
    )
    _, id_ref = intersect.intersect_spheres(p, d, *geom)
    fails = 0
    for sort in (True, False):
        _, i1 = tk.intersect_clustered_pallas(cp, p, d, tile_r=64, sort=sort,
                                              interpret=interpret)
        ok = bool(np.array_equal(np.asarray(i1), np.asarray(id_ref)))
        fails += not ok
        print(json.dumps({
            "scene": "early_exit_spike_dip", "sort": sort, "ok": ok,
        }), flush=True)

    # Shadow variant: the any-hit exit bound shrinks as LANES drop out
    # (occluded lanes leave the live max). Upper-half lanes are occluded by
    # 10 blocker clusters; the spike is upper-only so its entry (3.8)
    # exceeds every still-live lower lane's tfar bound (3.0) after the
    # 8-visit refresh — a raw sort=False order would exit there and miss
    # the lower-only dip occluder at t~1.
    def half_blob(z, y0, y1):
        c = np.tile(np.array([[0.0, 0.0, z]], np.float32), (K, 1))
        c[:, 1] += np.linspace(y0, y1, K)
        return c

    centers2 = np.concatenate(
        [half_blob(3.0 + 0.01 * i, 0.05, 0.2) for i in range(10)]
        + [half_blob(3.8, 0.05, 0.2), half_blob(1.0, -0.2, -0.05)], 0
    )
    radii2 = np.full(12 * K, 0.04, np.float32)
    rows2 = np.concatenate([centers2, (radii2 ** 2)[:, None]], 1)
    cp2 = clustered.build_clusters(
        centers2 - radii2[:, None], centers2 + radii2[:, None], rows2,
        num_clusters=12, kind="sphere",
    )
    lo2 = (centers2 - radii2[:, None]).reshape(12, K, 3).min(1)
    hi2 = (centers2 + radii2[:, None]).reshape(12, K, 3).max(1)
    cp2 = dc.replace(
        cp2, rows=jnp.asarray(rows2), order=jnp.asarray(perm),
        lo=Vec3(*[jnp.asarray(lo2[:, i]) for i in range(3)]),
        hi=Vec3(*[jnp.asarray(hi2[:, i]) for i in range(3)]),
    )
    geom2 = (
        Vec3(*[jnp.asarray(centers2[:, i]) for i in range(3)]),
        jnp.asarray(radii2 ** 2),
    )
    # rays aimed exactly at the per-half prim y's so hits are robust
    ys = np.concatenate([np.linspace(0.05, 0.2, K),      # upper lanes
                         np.linspace(-0.2, -0.05, K)])   # lower lanes
    R2 = 2 * K
    p2 = np.tile(np.array([[0.0, 0.0, 0.0]], np.float32), (R2, 1))
    p2[:, 1] = ys
    d2 = np.tile(np.array([[0.0, 0.0, 1.0]], np.float32), (R2, 1))
    pv = Vec3(*[jnp.asarray(p2[:, i]) for i in range(3)])
    dv = Vec3(*[jnp.asarray(d2[:, i]) for i in range(3)])
    tf = jnp.asarray(np.where(ys > 0, 6.0, 3.0).astype(np.float32))
    occ_ref = intersect.occluded_spheres(pv, dv, tf, *geom2)
    for sort in (True, False):
        o1 = tk.occluded_clustered_pallas(cp2, pv, dv, tf, tile_r=64,
                                          sort=sort, interpret=interpret)
        ok = bool(np.array_equal(np.asarray(o1), np.asarray(occ_ref)))
        fails += not ok
        print(json.dumps({
            "scene": "early_exit_shadow_spike_dip", "sort": sort, "ok": ok,
        }), flush=True)
    return fails


if __name__ == "__main__":
    main()
