"""Off-hardware A/B of windowed fill-packing (build_clusters_sah
fill_window) via the traversal schedule simulator.

The ROADMAP round-5 note conjectured ~25% fewer battery rows from lifting
the 0.69 SAH-leaf fill. The builder-level numbers already look bad (fill
only reaches ~0.74 while the summed box surface area grows 26%+ at w=8 —
union boxes of non-sibling leaves inflate), but SA is a proxy; this script
measures the thing the walk actually pays: VISITS EXECUTED (battery rows,
early-exit semantics included) for bounce-state-like ray tiles, using the
interpret-mode planner + numpy schedule sim. No TPU needed.

Ray model: origin-coherent / direction-incoherent tiles, like post-bounce
wavefront tiles under tile ray order — 64 rays per tile from a small
surface patch of the displaced sphere, cosine-distributed outward
directions.

Run: python benchmarks/sim_fill_pack.py [--mesh 100k] [--tiles 24]
"""
import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mesh", default="100k", choices=("20k", "100k"))
    ap.add_argument("--tiles", type=int, default=24)
    ap.add_argument("--windows", default="1,4,8,32")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from cpu_raytracing_experiments_tpu.core.vec import Vec3
    from cpu_raytracing_experiments_tpu.ops.pallas import (
        schedule_sim as sim, traverse_kernel as tk)
    from cpu_raytracing_experiments_tpu.scene import accel, builders

    kw = dict(subdivisions=5) if args.mesh == "20k" else dict(uv_res=224)
    K = 64 if args.mesh == "20k" else 128
    scene = builders.mesh_scene(64, 64, **kw)

    # bounce-like tiles: cluster origins on the displaced sphere surface
    rng = np.random.default_rng(11)
    tile_r = 64
    n_tiles = -(-args.tiles // 8) * 8
    R = n_tiles * tile_r
    # surface points: normalize fBm-displaced directions (approximate —
    # exact surface not needed, just origin-coherent patches near it)
    tc = rng.normal(size=(n_tiles, 3))
    tc /= np.linalg.norm(tc, axis=1, keepdims=True)
    p0 = np.repeat(tc, tile_r, axis=0)
    p0 += rng.normal(scale=0.02, size=p0.shape)  # small patch jitter
    nrm = p0 / np.linalg.norm(p0, axis=1, keepdims=True)
    p0 = (nrm * 1.02).astype(np.float32)  # just off the surface
    # cosine-weighted outward directions around the local normal
    u = rng.uniform(size=(R, 2))
    r_ = np.sqrt(u[:, 0])
    phi = 2 * np.pi * u[:, 1]
    loc = np.stack([r_ * np.cos(phi), r_ * np.sin(phi),
                    np.sqrt(np.maximum(0, 1 - u[:, 0]))], axis=1)
    t0v = np.where(np.abs(nrm[:, 0:1]) < 0.9,
                   np.array([[1.0, 0, 0]]), np.array([[0, 1.0, 0]]))
    tx = np.cross(nrm, t0v)
    tx /= np.linalg.norm(tx, axis=1, keepdims=True)
    ty = np.cross(nrm, tx)
    d0 = (loc[:, 0:1] * tx + loc[:, 1:2] * ty + loc[:, 2:3] * nrm)
    d0 = (d0 / np.linalg.norm(d0, axis=1, keepdims=True)).astype(np.float32)

    p = Vec3(*[jnp.asarray(p0[:, i]) for i in range(3)])
    d = Vec3(*[jnp.asarray(d0[:, i]) for i in range(3)])
    tf0 = np.full(R, sim.FLT_MAX, np.float32)
    valid = np.ones(R, np.float32)

    ref_orig = None
    for wdw in [int(x) for x in args.windows.split(",")]:
        t0 = time.time()
        sc = accel.with_pallas_clusters(scene, cluster_size=K,
                                        fill_window=wdw)
        cp = sc.tri_clusters
        fill = float((np.asarray(cp.order) >= 0).mean())
        cols = tk._ray_cols(
            [(p.x, 1e30), (p.y, 1e30), (p.z, 1e30), (d.x, 1.0),
             (d.y, 1.0), (d.z, 1.0), (jnp.asarray(tf0), 0.0),
             (jnp.asarray(valid), 0.0)], R)
        visit, entry, nvis = tk._plan_visits(
            cp, cols, n_tiles, tile_r, True, True, "ray", 8, "xla")
        tfar, prim, nexec = sim.simulate_closest(
            cp, p, d, tile_r=tile_r, visit=visit, entry=entry, nvis=nvis,
            w_trip=4)
        orig = np.where(prim >= 0, np.asarray(cp.order)[np.maximum(prim, 0)],
                        -1)
        if ref_orig is None:
            ref_orig = orig
            same = True
        else:
            same = bool(np.array_equal(orig, ref_orig))
        planned = int(np.asarray(nvis).sum())
        print({"window": wdw, "C": cp.num_clusters, "fill": round(fill, 3),
               "planned_visits": planned, "visits_executed": int(nexec),
               "lanes_tested": int(nexec) * 128,
               "hits_match_w1": same,
               "sec": round(time.time() - t0, 1)}, flush=True)


if __name__ == "__main__":
    main()
