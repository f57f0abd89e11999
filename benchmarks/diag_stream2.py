"""Stage-2 diagnosis of the hardware-only streaming-traversal mismatch
(diag_stream.py found a deterministic single-lane wrong hit at P=100k,
independent of sort order, slot count and the early exit).

Stages:
  --repro    full-size repro + isolate the bad tile's rays to a single
             hardware program (pad to the 8-tile grid minimum)
  --dma      DMA-replay kernel: walk the bad tile's visit list, copy every
             visit's DMA'd buffer rows out, compare vs the packed table
  --trace    per-visit hit-state dump from an instrumented stream kernel:
             which visit loses the closer hit for the bad ray

    python benchmarks/diag_stream2.py --repro
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from cpu_raytracing_experiments_tpu.core.vec import Vec3
from cpu_raytracing_experiments_tpu.ops import clustered
from cpu_raytracing_experiments_tpu.ops.pallas import traverse_kernel as tk
from bench_stream import make_tris, make_rays

P, K, R = 100000, 256, 262144


def build():
    rng = np.random.default_rng(7)
    mins, maxs, rows = make_tris(P, rng)
    cp = clustered.build_clusters(mins, maxs, rows,
                                  num_clusters=-(-P // K), kind="triangle")
    p, d = make_rays(R, rng)
    return cp, p, d


def find_bad(cp, p, d, tile_r=256):
    t0, i0 = tk.intersect_clustered_pallas(cp, p, d, tile_r=tile_r)
    t1, i1 = tk.intersect_clustered_pallas(cp, p, d, tile_r=tile_r,
                                           stream=True)
    t0, i0 = np.asarray(t0), np.asarray(i0)
    t1, i1 = np.asarray(t1), np.asarray(i1)
    bad = np.nonzero(i1 != i0)[0]
    return bad, (t0, i0, t1, i1)


def slice_rays(p, d, lo, hi):
    return (
        Vec3(p.x[lo:hi], p.y[lo:hi], p.z[lo:hi]),
        Vec3(d.x[lo:hi], d.y[lo:hi], d.z[lo:hi]),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", default="repro",
                    choices=["repro", "dma", "trace", "trace2"])
    ap.add_argument("--tile", type=int, default=None,
                    help="known bad tile: skip the full-size repro pass")
    ap.add_argument("--variant", default="full",
                    choices=["full", "ext-packed", "ext-plan", "no-cp",
                             "ext-both"],
                    help="trace2: which pieces stay OUTSIDE the jit")
    args = ap.parse_args()
    print(f"device={jax.devices()[0].device_kind}")
    cp, p, d = build()

    if args.tile is None:
        bad, (t0, i0, t1, i1) = find_bad(cp, p, d)
        print(f"full-size mismatches: {bad.size}")
        if not bad.size:
            print("NO MISMATCH — cannot reproduce")
            return
        lane = int(bad[0])
        tile = lane // 256
        print(f"first bad lane {lane} tile {tile} in-tile {lane % 256}")
        print(f"  resident (t, id): {float(t0[lane])}, {int(i0[lane])}")
        print(f"  stream   (t, id): {float(t1[lane])}, {int(i1[lane])}")
    else:
        tile = args.tile

    # single-tile isolation: just this tile's 256 rays
    ps, ds = slice_rays(p, d, tile * 256, (tile + 1) * 256)
    if args.stage in ("repro", "trace"):
        tb0, ib0 = tk.intersect_clustered_pallas(cp, ps, ds, tile_r=256)
        tb1, ib1 = tk.intersect_clustered_pallas(cp, ps, ds, tile_r=256,
                                                 stream=True)
        sub_bad = np.nonzero(np.asarray(ib1) != np.asarray(ib0))[0]
        print(f"single-tile mismatches: {sub_bad.size} at {sub_bad.tolist()}")
        if args.stage == "repro":
            return

    if args.stage == "dma":
        # replay the DMA schedule for this tile's visit list and dump every
        # visit's buffer rows
        import jax.experimental.pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        f8 = tk._stream_rows(cp.kind)
        rp = 8 * 256
        ray_in = tk._ray_cols(
            [(ps.x, 1e30), (ps.y, 1e30), (ps.z, 1e30), (ds.x, 1.0),
             (ds.y, 1.0), (ds.z, 1.0),
             (jnp.full((256,), tk.FLT_MAX), 0.0),
             (jnp.ones((256,), jnp.float32), 0.0)], rp)
        visit, entry, nvis = tk._plan_visits(
            cp, ray_in, 8, 256, True, False, "ray", 8)
        packed = tk._tables_packed(cp)
        nv = int(np.asarray(nvis)[0, 0])
        print(f"visits for tile 0: {nv}")
        C = cp.num_clusters

        def kernel(nvis_r, visit_r, packed_r, out, buf, sem):
            def body(j, _):
                slot = jax.lax.rem(j, 2)

                @pl.when(j + 1 < nvis_r[0, 0])
                def _():
                    c2 = visit_r[0, j + 1]
                    pltpu.make_async_copy(
                        packed_r.at[pl.ds(c2 * f8, f8), :],
                        buf.at[pl.ds((1 - slot) * f8, f8), :],
                        sem.at[1 - slot],
                    ).start()

                @pl.when(j == 0)
                def _():
                    c0 = visit_r[0, 0]
                    pltpu.make_async_copy(
                        packed_r.at[pl.ds(c0 * f8, f8), :],
                        buf.at[pl.ds(0, f8), :],
                        sem.at[0],
                    ).start()

                c = visit_r[0, j]
                pltpu.make_async_copy(
                    packed_r.at[pl.ds(c * f8, f8), :],
                    buf.at[pl.ds(slot * f8, f8), :],
                    sem.at[slot],
                ).wait()
                out[pl.ds(j * f8, f8), :] = buf[pl.ds(slot * f8, f8), :]
                return 0

            jax.lax.fori_loop(0, nvis_r[0, 0], body, 0)

        nvp = -(-nv // 8) * 8
        out = pl.pallas_call(
            kernel,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nvp * f8, K), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((2 * f8, K), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )(nvis[:1], visit[:1], packed)
        out = np.asarray(out)
        pk = np.asarray(packed)
        vis = np.asarray(visit)[0]
        nbad = 0
        for j in range(nv):
            want = pk[vis[j] * f8:(vis[j] + 1) * f8]
            got = out[j * f8:(j + 1) * f8]
            if not np.array_equal(want, got):
                nbad += 1
                if nbad < 5:
                    db = np.nonzero(want != got)
                    print(f"  visit {j} cluster {vis[j]}: "
                          f"{db[0].size} bad cells, rows {set(db[0].tolist())}")
        print(f"DMA replay: {nbad}/{nv} visits mismatched")
        return

    if args.stage == "trace2":
        # exact replica of the wrapper's stream branch INSIDE one jit
        # (plan + _tables_packed + pallas_call fused into one XLA program,
        # like the failing intersect_clustered_pallas), with the visit
        # count clamped to a traced prefix m. The eager stage-by-stage
        # trace run was CORRECT; this localizes the jit-composition
        # trigger.
        import functools
        import jax.experimental.pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        ray = 12
        f8 = tk._stream_rows(cp.kind)
        rp = 8 * 256
        C = cp.num_clusters

        variant = args.variant
        ext_packed = variant in ("ext-packed", "ext-both")
        ext_plan = variant in ("ext-plan", "ext-both")
        cparams = None if variant == "no-cp" else tk._COMPILER_PARAMS

        def mk_ray_in(px, pyy, pzz, dx, dy, dz):
            return tk._ray_cols(
                [(px, 1e30), (pyy, 1e30), (pzz, 1e30), (dx, 1.0),
                 (dy, 1.0), (dz, 1.0),
                 (jnp.full((256,), tk.FLT_MAX), 0.0),
                 (jnp.ones((256,), jnp.float32), 0.0)], rp)

        def stream_call(nvis, visit, entry, ray_in, packed):
            col = pl.BlockSpec((256, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)
            smem_row = lambda w: pl.BlockSpec(
                (8, w), lambda i: (i // 8, 0), memory_space=pltpu.SMEM)
            root_spec = pl.BlockSpec((1, 8), lambda i: (0, 0),
                                     memory_space=pltpu.SMEM)
            return pl.pallas_call(
                tk._stream_kernels(cp.kind, K, shadow=False),
                grid=(8,),
                in_specs=[smem_row(1), smem_row(C), smem_row(C), root_spec]
                + [col] * 8 + [pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=[col, col],
                out_shape=[
                    jax.ShapeDtypeStruct((rp, 1), jnp.float32),
                    jax.ShapeDtypeStruct((rp, 1), jnp.int32),
                ],
                scratch_shapes=[
                    pltpu.SMEM((1, 1), jnp.float32),
                    pltpu.VMEM((2 * f8, K), jnp.float32),
                    pltpu.SemaphoreType.DMA((2,)),
                ],
                compiler_params=cparams,
            )(nvis, visit, entry, tk._root_row(cp), *ray_in, packed)

        pre_packed = jax.device_put(np.asarray(tk._tables_packed(cp)))
        pre_ray_in = mk_ray_in(ps.x, ps.y, ps.z, ds.x, ds.y, ds.z)
        pre_plan = tk._plan_visits(cp, pre_ray_in, 8, 256, True, False,
                                   "ray", 8)
        pre_plan = tuple(jax.device_put(np.asarray(a)) for a in pre_plan)

        @jax.jit
        def run_jit(cp, px, pyy, pzz, dx, dy, dz, m, plan_opt, packed_opt):
            ray_in = mk_ray_in(px, pyy, pzz, dx, dy, dz)
            if ext_plan:
                visit, entry, nvis = plan_opt
            else:
                visit, entry, nvis = tk._plan_visits(
                    cp, ray_in, 8, 256, True, False, "ray", 8)
            nvis = jnp.minimum(nvis, m)
            packed = packed_opt if ext_packed else tk._tables_packed(cp)
            return stream_call(nvis, visit, entry, ray_in, packed)

        print(f"variant={variant}")
        for m in (10000, 60):
            tfar, prim = run_jit(cp, ps.x, ps.y, ps.z, ds.x, ds.y, ds.z,
                                 jnp.int32(m), pre_plan, pre_packed)
            print(f"m={m}: ray12 hw=({float(np.asarray(tfar)[ray, 0])}, "
                  f"{int(np.asarray(prim)[ray, 0])})")
        return

    if args.stage == "trace":
        # Localize WHICH visit the hardware stream kernel loses for the bad
        # ray: nvis is runtime SMEM data, so one compiled kernel evaluates
        # any visit-list prefix. Replay the same prefix algebra in numpy
        # from the packed table (ground truth per-visit running hit state),
        # then bisect the first prefix where hardware != replay.
        import jax.experimental.pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        ray = int(sub_bad[0])
        f8 = tk._stream_rows(cp.kind)
        rp = 8 * 256
        ray_in = tk._ray_cols(
            [(ps.x, 1e30), (ps.y, 1e30), (ps.z, 1e30), (ds.x, 1.0),
             (ds.y, 1.0), (ds.z, 1.0),
             (jnp.full((256,), tk.FLT_MAX), 0.0),
             (jnp.ones((256,), jnp.float32), 0.0)], rp)
        visit, entry, nvis = tk._plan_visits(
            cp, ray_in, 8, 256, True, False, "ray", 8)
        packed = tk._tables_packed(cp)
        (root,) = (tk._root_row(cp),)
        nv = int(np.asarray(nvis)[0, 0])
        vis = np.asarray(visit)[0]
        print(f"visits: {nv}")

        # ---- numpy replay of the per-visit battery for the bad ray ----
        pk = np.asarray(packed)
        px_, py_, pz_ = (float(np.asarray(a)[ray]) for a in
                         (ps.x, ps.y, ps.z))
        dx_, dy_, dz_ = (float(np.asarray(a)[ray]) for a in
                         (ds.x, ds.y, ds.z))
        t_run, pr_run = np.float32(tk.FLT_MAX), -1
        expect = []
        for j in range(nv):
            c = vis[j]
            rows = pk[c * f8:c * f8 + 12].astype(np.float32)
            (nx, ny, nz, d0, f1x, f1y, f1z, g1, f2x, f2y, f2z, g2) = rows
            den = nx * dx_ + ny * dy_ + nz * dz_
            num = d0 - (nx * px_ + ny * py_ + nz * pz_)
            with np.errstate(all="ignore"):
                t = (num / den).astype(np.float32)
                hx = (px_ + dx_ * t).astype(np.float32)
                hy = (py_ + dy_ * t).astype(np.float32)
                hz = (pz_ + dz_ * t).astype(np.float32)
                u = (f1x * hx + f1y * hy + f1z * hz + g1).astype(np.float32)
                v = (f2x * hx + f2y * hy + f2z * hz + g2).astype(np.float32)
            valid = ((np.abs(den) > 1e-12) & (t > 1e-6) & (u >= 0)
                     & (v >= 0) & (u + v <= 1))
            t = np.where(valid, t, tk.FLT_MAX).astype(np.float32)
            best = t.min()
            arg = int(np.where(t == best, np.arange(K), 1 << 30).min())
            if best < t_run:
                t_run, pr_run = np.float32(best), int(c) * K + arg
            expect.append((float(t_run), pr_run))

        # ---- hardware prefix eval (same compiled kernel, nvis=m) ----
        col = pl.BlockSpec((256, 1), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
        smem_row = lambda w: pl.BlockSpec((8, w), lambda i: (i // 8, 0),
                                          memory_space=pltpu.SMEM)
        root_spec = pl.BlockSpec((1, 8), lambda i: (0, 0),
                                 memory_space=pltpu.SMEM)
        kern = tk._stream_kernels(cp.kind, K, shadow=False)

        def run_prefix(m):
            nv_m = jnp.minimum(nvis, m)
            tfar, prim = pl.pallas_call(
                kern,
                grid=(8,),
                in_specs=[smem_row(1), smem_row(cp.num_clusters),
                          smem_row(cp.num_clusters), root_spec]
                + [col] * 8 + [pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=[col, col],
                out_shape=[
                    jax.ShapeDtypeStruct((rp, 1), jnp.float32),
                    jax.ShapeDtypeStruct((rp, 1), jnp.int32),
                ],
                scratch_shapes=[
                    pltpu.SMEM((1, 1), jnp.float32),
                    pltpu.VMEM((2 * f8, K), jnp.float32),
                    pltpu.SemaphoreType.DMA((2,)),
                ],
            )(nv_m, visit, entry, root, *ray_in, packed)
            return (float(np.asarray(tfar)[ray, 0]),
                    int(np.asarray(prim)[ray, 0]))

        full = run_prefix(nv)
        print(f"full prefix hw: {full}, replay: {expect[-1]}")
        if full == expect[-1]:
            print("prefix-run matches replay?! (bug not reproduced here)")
            return
        lo, hi = 0, nv  # first m in (0, nv] where hw(m) != expect[m-1]
        while lo + 1 < hi:
            mid = (lo + hi) // 2
            got = run_prefix(mid)
            ok_m = got == expect[mid - 1]
            print(f"  m={mid}: hw={got} expect={expect[mid - 1]}"
                  f" {'OK' if ok_m else 'DIVERGED'}")
            if ok_m:
                lo = mid
            else:
                hi = mid
        j_bad = hi - 1
        print(f"FIRST DIVERGING VISIT: j={j_bad} cluster={vis[j_bad]}")
        print(f"  expect after visit: {expect[j_bad]}")
        print(f"  hw     after visit: {run_prefix(hi)}")
        if j_bad > 0:
            print(f"  state before: {expect[j_bad - 1]}")


if __name__ == "__main__":
    main()
