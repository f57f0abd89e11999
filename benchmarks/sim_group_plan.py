"""Off-hardware A/B of per-leaf group culling (plan='group' +
build_clusters_sah group_boxes) via the traversal schedule simulator.

The plain fill-packing experiment (sim_fill_pack.py) measured NEGATIVE:
fill saturates at ~0.75 while union boxes inflate visits at every window
width. plan='group' removes the union-box looseness — the planner culls
against each packed row's TWO constituent SAH-leaf boxes and a row is
visited iff either leaf would be — so the remaining question is pure
visit accounting: does sharing rows between co-visited leaf pairs cut
VISITS EXECUTED (battery rows, early-exit semantics included) below the
unpacked w=1 baseline? Upper bound = the pair rate; expected win = the
co-visitation rate of paired leaves.

Same ray model as sim_fill_pack.py: origin-coherent / direction-
incoherent bounce-like tiles. No TPU needed (interpret-mode planner +
numpy schedule sim).

Run: python benchmarks/sim_group_plan.py [--mesh 100k] [--tiles 24]
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
    ap.add_argument("--windows", default="1,4,8")
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

    rng = np.random.default_rng(11)
    tile_r = 64
    n_tiles = -(-args.tiles // 8) * 8
    R = n_tiles * tile_r
    tc = rng.normal(size=(n_tiles, 3))
    tc /= np.linalg.norm(tc, axis=1, keepdims=True)
    p0 = np.repeat(tc, tile_r, axis=0)
    p0 += rng.normal(scale=0.02, size=p0.shape)
    nrm = p0 / np.linalg.norm(p0, axis=1, keepdims=True)
    p0 = (nrm * 1.02).astype(np.float32)
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
    cols = tk._ray_cols(
        [(p.x, 1e30), (p.y, 1e30), (p.z, 1e30), (d.x, 1.0),
         (d.y, 1.0), (d.z, 1.0), (jnp.asarray(tf0), 0.0),
         (jnp.asarray(valid), 0.0)], R)

    def leg(name, sc_cp, plan):
        t0 = time.time()
        fill = float((np.asarray(sc_cp.order) >= 0).mean())
        visit, entry, nvis = tk._plan_visits(
            sc_cp, cols, n_tiles, tile_r, True, True, plan, 8, "xla")
        tfar, prim, nexec = sim.simulate_closest(
            sc_cp, p, d, tile_r=tile_r, visit=visit, entry=entry, nvis=nvis,
            w_trip=4)
        orig = np.where(
            prim >= 0, np.asarray(sc_cp.order)[np.maximum(prim, 0)], -1)
        planned = int(np.asarray(nvis).sum())
        return {"leg": name, "C": sc_cp.num_clusters, "fill": round(fill, 3),
                "planned_visits": planned, "visits_executed": int(nexec),
                "sec": round(time.time() - t0, 1)}, orig

    base = accel.with_pallas_clusters(scene, cluster_size=K)
    row, ref_orig = leg("w=1 plan=ray (default)", base.tri_clusters, "ray")
    print(row, flush=True)
    for wdw in [int(x) for x in args.windows.split(",")]:
        sc = accel.with_pallas_clusters(scene, cluster_size=K,
                                        fill_window=wdw, group_boxes=True)
        row, orig = leg(f"w={wdw} group_boxes plan=group",
                        sc.tri_clusters, "group")
        row["hits_match"] = bool(np.array_equal(orig, ref_orig))
        print(row, flush=True)


if __name__ == "__main__":
    main()
