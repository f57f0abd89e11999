"""Pallas TPU clustered-traversal kernel — the large-scene intersection path.

This is the north-star kernel (BASELINE.json: "the SIMD sphere tests and
`BVH.hpp` traversal become a Pallas stackless BVH-traversal kernel over
flattened node arrays"; reference semantics /root/reference/BVH.hpp:309-360
closest-hit, :362-404 any-hit), redesigned for how a TPU actually executes:

* Per-ray pointer-chasing traversal is hostile to the VPU (measured 40-90x
  slower at the XLA level — ARCHITECTURE.md), so the "nodes" are flattened
  morton clusters of K=128 primitives: one cluster battery is exactly one
  full-width [TILE_R x 128] VPU op stream, i.e. culling granularity equals
  the hardware's free-compute granularity. All primitive data lives in VMEM
  for the whole kernel (100k tris ~ 3.6 MB).
* The traversal decisions move OFF the vector unit: a Pallas *planning*
  kernel (one [TILE_R x C] slab battery per tile, VMEM-resident, min-reduced
  to a [1, C] row — nothing ray-resolution ever touches HBM) plans, per
  ray-tile, the front-to-back-sorted list of clusters any of its rays can
  touch; the sort itself is an XLA argsort on the tiny [T, C] entry matrix.
  The traversal kernel while-loops over *that list only* — a scalar SMEM
  read per cluster, no vector->scalar sync inside the loop. (Two designs
  measured slower: planning in XLA materialized [T x TILE_R x C] HBM
  temporaries, ~30 ms/bounce at 147k rays; in-kernel argmin selection
  serialized a cross-lane reduce against every battery, ~5x slower than the
  SMEM visit list.)
* Early termination: the loop stops when the sorted entry distance exceeds
  the tile's worst current hit (closest) / when every lane is occluded
  (shadow) — the reference's traversal-order cull (BVH.hpp:340 TODO) done at
  tile granularity.
* Dead-lane elimination + ray coherence: `coherence_order` sorts rays by
  (dead, direction octant) within segments of consecutive pixels before the
  kernel. Tile-union culling only works when a tile's rays agree on which
  clusters matter: unsorted diffuse-bounce tiles touch ~99% of clusters
  (measured nvis 159/160 on the 20k mesh), octant-sorted tiles far fewer;
  dead lanes condense into tiles that plan zero visits. This recovers the
  reference's stream compaction + coherence sort (Renderer.hpp:235-243,
  357-404, 431) at tile granularity without per-bounce scatter traffic on
  the full path state.

Layouts: rays ride the sublane axis as [TILE_R, 1] columns; primitive
attributes are [C, K] planes (cluster rows on sublanes, prims on lanes), so
a cluster battery is a [TILE_R,1] x [1,K] broadcast — no in-kernel
transposes. Cluster AABBs are [8, Cp] lane-major rows (Cp = C padded to the
128-lane boundary); visit lists and entry distances are SMEM scalars.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ...core.vec import Vec3
from ..clustered import ClusteredPrims

try:  # pragma: no cover - import guard
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAVE_PALLAS = True
except Exception:  # pragma: no cover
    _HAVE_PALLAS = False

FLT_MAX = 3.4028235e38

# XLA's default 16 MB scoped-vmem budget trips at 4K chunk sizes (the
# fused while-loop schedule co-stages several traversal kernels' operand
# copies); v5e has 128 MB of VMEM, so grant the kernels a bigger slice.
if _HAVE_PALLAS:
    _COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)
else:  # pragma: no cover
    _COMPILER_PARAMS = None
DEFAULT_TILE_R = 256
DEFAULT_SEG_LEN = 2048


def available() -> bool:
    return _HAVE_PALLAS


def _pad1(a, n_pad, value):
    if n_pad == 0:
        return a
    return jnp.pad(a, (0, n_pad), constant_values=value)


def _match_vma(arrs, like):
    """Cast replicated operands (cluster tables, slab rows) to the rays'
    varying-mesh-axes set: under shard_map(check_vma=True) pallas_call's
    internal grid loop requires a uniform vma across its carried blocks
    (mixed replicated/varying carries are rejected by the interpreter)."""
    want = getattr(jax.typeof(like), "vma", None)
    if not want:
        return arrs
    pcast = getattr(jax.lax, "pcast", None)

    def cast(a):
        have = getattr(jax.typeof(a), "vma", frozenset())
        missing = tuple(ax for ax in want if ax not in have)
        if not missing:
            return a
        if pcast is not None:
            return pcast(a, missing, to="varying")
        return jax.lax.pvary(a, missing)

    return type(arrs)(cast(a) for a in arrs)


def _out_struct(shape, dtype, like):
    """pallas_call out_shape that inherits the rays' varying-mesh-axes set:
    under shard_map(check_vma=True) a plain ShapeDtypeStruct (vma=None) is
    rejected — the kernel output varies across exactly the axes its ray
    inputs do (each device traverses its own rays against the replicated
    cluster tables)."""
    vma = getattr(jax.typeof(like), "vma", None)
    if vma:
        return jax.ShapeDtypeStruct(shape, dtype, vma=vma)
    return jax.ShapeDtypeStruct(shape, dtype)


# ---------------------------------------------------------------------------
# Batteries (kernel-side): rays [TILE_R, 1] x prims [K] -> t [TILE_R, K]
# ---------------------------------------------------------------------------
def _sphere_battery(px, py, pz, dx, dy, dz, rows):
    """rows = per-attribute [1, L] cluster rows (prebuilt by the caller:
    one cluster's table row, a lane-packed group of sub-128 clusters, or a
    DMA'd streaming buffer row)."""
    cx, cy, cz, rsq = rows
    tx = cx - px
    ty = cy - py
    tz = cz - pz
    b = dx * tx + dy * ty + dz * tz
    disc = rsq - (tx * tx + ty * ty + tz * tz) + b * b
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t_near = b - sq
    t = jnp.where(t_near < 0.0, b + sq, t_near)
    return jnp.where((disc >= 0.0) & (t >= 0.0), t, FLT_MAX)


def _triangle_battery(px, py, pz, dx, dy, dz, rows):
    """Baldwin-Weber precomputed-plane test: ~40 VPU ops/pair vs
    Moller-Trumbore's ~57 (the per-pair cross products move to a per-tri
    host/loop-invariant precompute in _tables). Same u/v semantics (e1/e2
    barycentrics) and epsilons as the XLA brute battery; results agree to
    float rounding."""
    (nx, ny, nz, d0, f1x, f1y, f1z, g1, f2x, f2y, f2z, g2) = rows
    den = nx * dx + ny * dy + nz * dz
    num = d0 - (nx * px + ny * py + nz * pz)
    t = num / den
    qx = px + t * dx
    qy = py + t * dy
    qz = pz + t * dz
    u = f1x * qx + f1y * qy + f1z * qz + g1
    v = f2x * qx + f2y * qy + f2z * qz + g2
    valid = (
        (jnp.abs(den) > 1e-12)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > 1e-6)
    )
    return jnp.where(valid, t, FLT_MAX)


def _sphere_anyhit_battery(px, py, pz, dx, dy, dz, tf, rows):
    """Occlusion bits [TILE_R, K] — the sqrt-free any-hit predicate
    (see ops/intersect.py::_sphere_occluded_pairs for the derivation):
    every root comparison of the reference's selected-root-in-[0,tfar)
    test becomes a sign test plus a square comparison, dropping the sqrt,
    the root select and the FLT_MAX select from the shadow battery."""
    cx, cy, cz, rsq = rows
    tx = cx - px
    ty = cy - py
    tz = cz - pz
    b = dx * tx + dy * ty + dz * tz
    disc = rsq - (tx * tx + ty * ty + tz * tz) + b * b
    bb = b * b
    e = b - tf
    q = e * e
    near_ge0 = (b >= 0.0) & (bb >= disc)
    hit_near = (e < 0.0) | (q < disc)
    far_ge0 = (b >= 0.0) | (bb <= disc)
    hit_far = (e < 0.0) & (disc < q)
    # pure and/or instead of jnp.where on bool vectors: Mosaic lowers the
    # i1-vector select_n through an i8->i1 arith.trunci it cannot compile
    # ("Unsupported target bitwidth for truncation", caught by
    # benchmarks/tpu_goldens.py on hardware — interpret mode accepts both)
    sel = (near_ge0 & hit_near) | (
        jnp.logical_not(near_ge0) & far_ge0 & hit_far
    )
    return (disc >= 0.0) & sel


def _triangle_anyhit_battery(px, py, pz, dx, dy, dz, tf, rows):
    return _triangle_battery(px, py, pz, dx, dy, dz, rows) < tf


def _triangle_battery_mxu(pmat, dmat, attrs, c, k):
    """Baldwin-Weber with the six ray.(constant-vector) contractions batched
    into two [TILE_R,3]x[3,3K] MXU matmuls (benchmarks/diag_mxu.py measured
    the XLA-level analog 1.28x at the [R x 128] shape). q = p + t*d is
    distributed: u = f1.p + t*(f1.d) + g1 — algebraically identical to the
    VPU battery, float-rounding different (golden tolerance covers it).
    precision=HIGHEST keeps the contraction f32-faithful (DEFAULT's 1-pass
    bf16 measured id_agreement 0.67 — unusable)."""
    (nx, ny, nz, d0, f1x, f1y, f1z, g1, f2x, f2y, f2z, g2) = attrs

    def row(a, b, cc):  # [1, 3K]: n | f1 | f2 component rows
        return jnp.concatenate(
            [a[c][None, :], b[c][None, :], cc[c][None, :]], axis=1
        )

    m = jnp.concatenate(
        [row(nx, f1x, f2x), row(ny, f1y, f2y), row(nz, f1z, f2z)], axis=0
    )  # [3, 3K]

    def dot(x):
        return jax.lax.dot_general(
            x, m, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )

    dd = dot(dmat)  # [TILE_R, 3K]
    pp = dot(pmat)
    den, f1d, f2d = dd[:, :k], dd[:, k : 2 * k], dd[:, 2 * k :]
    pn, f1p, f2p = pp[:, :k], pp[:, k : 2 * k], pp[:, 2 * k :]
    t = (d0[c][None, :] - pn) / den
    u = f1p + t * f1d + g1[c][None, :]
    v = f2p + t * f2d + g2[c][None, :]
    valid = (
        (jnp.abs(den) > 1e-12)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > 1e-6)
    )
    return jnp.where(valid, t, FLT_MAX)


_BATTERIES = {"sphere": _sphere_battery, "triangle": _triangle_battery}
_ANYHIT_BATTERIES = {
    "sphere": _sphere_anyhit_battery,
    "triangle": _triangle_anyhit_battery,
}
_N_ATTRS = {"sphere": 4, "triangle": 12}


# ---------------------------------------------------------------------------
# Planning: Pallas per-tile slab battery -> entry matrix [T, C] -> XLA
# argsort (tiny). test_AABB semantics (BVH.hpp:220-234).
# ---------------------------------------------------------------------------
def _tile_entry_row(slabs, rpx, rpy, rpz, rdx, rdy, rdz, tf, ok, c_real):
    """[TILE_R, Cp] slab battery reduced to the per-cluster tile-min entry
    distance (FLT_MAX where no valid ray can hit before its tfar)."""
    lox, loy, loz, hix, hiy, hiz = (s[0:1, :] for s in slabs)  # [1, Cp]
    ix, iy, iz = 1.0 / rdx, 1.0 / rdy, 1.0 / rdz
    ax, bx = (lox - rpx) * ix, (hix - rpx) * ix
    tmin = jnp.minimum(ax, bx)
    tmax = jnp.maximum(ax, bx)
    ay, by = (loy - rpy) * iy, (hiy - rpy) * iy
    tmin = jnp.maximum(tmin, jnp.minimum(ay, by))
    tmax = jnp.minimum(tmax, jnp.maximum(ay, by))
    az, bz = (loz - rpz) * iz, (hiz - rpz) * iz
    tmin = jnp.maximum(tmin, jnp.minimum(az, bz))
    tmax = jnp.minimum(tmax, jnp.maximum(az, bz))
    entry = jnp.maximum(tmin, 0.0)
    hit = (tmax >= entry) & (entry < tf) & ok
    row = jnp.min(jnp.where(hit, entry, FLT_MAX), axis=0, keepdims=True)
    lane = jax.lax.broadcasted_iota(jnp.int32, row.shape, 1)
    return jnp.where(lane < c_real, row, FLT_MAX)


def _root_exit_bound(root, rpx, rpy, rpz, rdx, rdy, rdz):
    """Per-ray exit distance of the ROOT AABB (union of cluster bounds),
    0 where the ray misses it entirely. Used to cap the early-exit bound:
    a ray that leaves the clustered geometry's bounds cannot hit anything
    beyond its root exit, so sky/miss rays stop forcing their tile to walk
    its whole visit list (mx would otherwise stay FLT_MAX). `root` is the
    (1, 8) SMEM row of [lo.xyz, hi.xyz, 0, 0] scalars — the union is
    tile-invariant, so it's reduced ONCE in XLA (loop-invariant, hoisted
    out of the bounce loop) instead of re-reduced by every program."""
    rlx, rly, rlz = root[0, 0], root[0, 1], root[0, 2]
    rhx, rhy, rhz = root[0, 3], root[0, 4], root[0, 5]
    ix, iy, iz = 1.0 / rdx, 1.0 / rdy, 1.0 / rdz
    ax, bx = (rlx - rpx) * ix, (rhx - rpx) * ix
    tmin = jnp.minimum(ax, bx)
    tmax = jnp.maximum(ax, bx)
    ay, by = (rly - rpy) * iy, (rhy - rpy) * iy
    tmin = jnp.maximum(tmin, jnp.minimum(ay, by))
    tmax = jnp.minimum(tmax, jnp.maximum(ay, by))
    az, bz = (rlz - rpz) * iz, (rhz - rpz) * iz
    tmin = jnp.maximum(tmin, jnp.minimum(az, bz))
    tmax = jnp.minimum(tmax, jnp.maximum(az, bz))
    hit = tmax >= jnp.maximum(tmin, 0.0)
    return jnp.where(hit, tmax * (1.0 + 1e-5), 0.0)


def _tilebox_entry_row(slabs, px, py, pz, dx, dy, dz, tf, ok, c_real):
    """Conservative per-TILE slab test via interval arithmetic: the tile's
    rays are summarized by per-axis origin/direction intervals (masked
    min/max scalars), and each cluster is tested against the whole bundle in
    one [1, Cp] row — ~TILE_R x less planning compute than the per-ray
    battery, at the price of a looser (superset) visit list. The returned
    entry is a LOWER bound on any ray's true entry, so the traversal
    kernel's front-to-back early exit stays conservative. Axes whose
    direction interval spans 0 contribute (-inf, inf) — the bundle is
    direction-incoherent there and the axis can't cull."""
    big = FLT_MAX

    def mn(a):
        return jnp.min(jnp.where(ok, a, big))

    def mx_(a):
        return jnp.max(jnp.where(ok, a, -big))

    lox, loy, loz, hix, hiy, hiz = (s[0:1, :] for s in slabs)  # [1, Cp]
    any_ok = jnp.any(ok)
    tfm = mx_(tf)

    def axis(lo, hi, pl_, ph, dl, dh):
        mixed = (dl <= 0.0) & (dh >= 0.0)
        inv_a = 1.0 / jnp.where(mixed, 1.0, dh)
        inv_b = 1.0 / jnp.where(mixed, 1.0, dl)
        il = jnp.minimum(inv_a, inv_b)
        ih = jnp.maximum(inv_a, inv_b)
        a1, a2 = (lo - ph) * il, (lo - ph) * ih
        a3, a4 = (lo - pl_) * il, (lo - pl_) * ih
        b1, b2 = (hi - ph) * il, (hi - ph) * ih
        b3, b4 = (hi - pl_) * il, (hi - pl_) * ih
        t_lo_lb = jnp.minimum(jnp.minimum(a1, a2), jnp.minimum(a3, a4))
        t_lo_ub = jnp.maximum(jnp.maximum(a1, a2), jnp.maximum(a3, a4))
        t_hi_lb = jnp.minimum(jnp.minimum(b1, b2), jnp.minimum(b3, b4))
        t_hi_ub = jnp.maximum(jnp.maximum(b1, b2), jnp.maximum(b3, b4))
        tmin_lb = jnp.minimum(t_lo_lb, t_hi_lb)
        tmax_ub = jnp.maximum(t_lo_ub, t_hi_ub)
        return (jnp.where(mixed, -big, tmin_lb),
                jnp.where(mixed, big, tmax_ub))

    nlb, nub = axis(lox, hix, mn(px), mx_(px), mn(dx), mx_(dx))
    ylb, yub = axis(loy, hiy, mn(py), mx_(py), mn(dy), mx_(dy))
    zlb, zub = axis(loz, hiz, mn(pz), mx_(pz), mn(dz), mx_(dz))
    entry = jnp.maximum(jnp.maximum(jnp.maximum(nlb, ylb), zlb), 0.0)
    exit_ub = jnp.minimum(jnp.minimum(nub, yub), zub)
    hit = (exit_ub >= entry) & (entry < tfm) & any_ok
    row = jnp.where(hit, entry, big)
    lane = jax.lax.broadcasted_iota(jnp.int32, row.shape, 1)
    return jnp.where(lane < c_real, row, big)


def _make_plan_kernel_tilebox(c_real: int, tile_r: int, ppb: int = 8):
    def kernel(*refs):
        slabs = refs[:6]
        (px, py, pz, dx, dy, dz, tf, valid) = refs[6:14]
        out = refs[14]

        def body(i, _):
            s = pl.ds(i * tile_r, tile_r)
            ok = valid[s, :] > 0
            out[pl.ds(i, 1), :] = _tilebox_entry_row(
                slabs, px[s, :], py[s, :], pz[s, :], dx[s, :], dy[s, :],
                dz[s, :], tf[s, :], ok, c_real,
            )
            return 0

        jax.lax.fori_loop(0, ppb, body, 0)

    return kernel


def _make_plan_kernel_hybrid(c_real: int, tile_r: int, ppb: int = 8):
    """Per-tile planner dispatch: direction-sign-coherent tiles (all of
    camera rays, most shadow/early-bounce tiles under tile ray order) take
    the ~TILE_R x cheaper interval row; incoherent tiles — where the
    interval test degenerates to visit-everything-at-entry-0 (measured 3.5x
    WORSE end-to-end as the only planner, RESULTS.md) — keep the exact
    per-ray battery."""

    def kernel(*refs):
        slabs = refs[:6]
        (px, py, pz, dx, dy, dz, tf, valid) = refs[6:14]
        out = refs[14]

        def body(i, _):
            s = pl.ds(i * tile_r, tile_r)
            ok = valid[s, :] > 0

            def sign_coherent(a):
                lo = jnp.min(jnp.where(ok, a, FLT_MAX))
                hi = jnp.max(jnp.where(ok, a, -FLT_MAX))
                return (lo > 0.0) | (hi < 0.0)

            coh = (
                sign_coherent(dx[s, :])
                & sign_coherent(dy[s, :])
                & sign_coherent(dz[s, :])
            )

            @pl.when(coh)
            def _():
                out[pl.ds(i, 1), :] = _tilebox_entry_row(
                    slabs, px[s, :], py[s, :], pz[s, :], dx[s, :], dy[s, :],
                    dz[s, :], tf[s, :], ok, c_real,
                )

            @pl.when(jnp.logical_not(coh))
            def _():
                out[pl.ds(i, 1), :] = _tile_entry_row(
                    slabs, px[s, :], py[s, :], pz[s, :], dx[s, :], dy[s, :],
                    dz[s, :], tf[s, :], ok, c_real,
                )

            return 0

        jax.lax.fori_loop(0, ppb, body, 0)

    return kernel


def _make_plan_kernel(c_real: int, tile_r: int, ppb: int = 8,
                      sort_in_kernel: bool = False,
                      use_super: bool = False,
                      use_dual: bool = False):
    """One program plans `ppb` consecutive tiles (output blocks must be
    8-sublane-divisible, so ppb is a multiple of 8); the per-tile reduce is
    a fori static-slice loop — no in-kernel reshape across the sublane dim.
    Larger ppb amortizes per-program fixed cost (block copies, grid
    bookkeeping) over more tiles — the planner measured ~4.8 us/tile of
    fixed overhead vs ~0.3 us of battery at the 20k config.

    `sort_in_kernel` additionally front-to-back sorts each tile's entry
    row in-register (vectorized selection sort over 8 tile-rows at once)
    and emits (entry_sorted, visit_ids) — replacing the XLA
    argsort + take_along_axis tail, which cost more than the broad phase
    itself (~2-3 ms per traversal call at 147k rays: TPU sorts and flat
    gathers run near one element per cycle). The selection loop runs
    max(nvis) steps (one vector->SMEM->scalar crossing per 8-row group),
    so cost scales with visits actually planned, not O(C^2).

    `use_super` = two-level (supercluster) refinement (the VERDICT round-3
    item / ARCHITECTURE.md supercluster sketch): phase A runs the slab
    battery against S = ceil(C/128) union AABBs of 128 consecutive
    SAH-order clusters (six extra [8, 128] rows), phase B refines ONLY the
    entered superclusters — a lax.cond-gated [TILE_R, 128] member battery
    per entered super, placed into the full row by a lane-block select.
    The member battery runs _tile_entry_row's exact arithmetic on the
    exact per-cluster slab values, so the emitted entries (and therefore
    the sorted visit lists and every render) are BIT-IDENTICAL to the
    flat planner; skipping a super whose union box rejects the tile is
    exact (union entry lower-bounds every member entry). Planner battery
    cost drops from O(TILE_R x C) to O(TILE_R x (S + 128*E)) per tile.
    Measured NEGATIVE at 384x384 AND 4K widths (benchmarks/RESULTS.md
    supercluster A/Bs: the x48-fused 4K flat plan is 6.5-12.8 ms — an
    earlier single-shot 15.7 ms reading was dispatch-floor-inflated — and
    'super' loses in both plan and walk); kept as a documented
    experiment, pallas_plan='auto' resolves to 'ray'.

    `use_dual` = per-LEAF group culling (plan='group'): the second slab
    set holds the SECOND packed SAH leaf's box per row (group_boxes
    clustering, clustered.py), and the row entry is the min of the two
    leaf-box entries — a row is visited iff EITHER constituent leaf would
    be, so fill-packed rows cull as tightly as unpacked leaves. Entry
    stays a lower bound on any contained prim's hit (each prim lies in
    one of the two boxes), so the walk's early exit remains exact."""
    assert not (use_super and use_dual)

    def kernel(*refs):
        slabs = refs[:6]
        k = 6
        if use_super:
            sslabs = refs[6:12]
            k = 12
        if use_dual:
            dslabs = refs[6:12]
            k = 12
        (px, py, pz, dx, dy, dz, tf, valid) = refs[k:k + 8]
        if sort_in_kernel:
            out_e, out_v, ns = refs[k + 8], refs[k + 9], refs[k + 10]
            cpad = out_e.shape[1]
        else:
            out = refs[k + 8]
            cpad = out.shape[1]
        sub = jax.lax.broadcasted_iota(jnp.int32, (8, cpad), 0)
        n_super = (c_real + 127) // 128 if use_super else 0

        def body(i, acc):
            s = pl.ds(i * tile_r, tile_r)
            ok = valid[s, :] > 0
            rays = (px[s, :], py[s, :], pz[s, :], dx[s, :], dy[s, :],
                    dz[s, :])
            tfs = tf[s, :]
            if use_dual:
                row = jnp.minimum(
                    _tile_entry_row(slabs, *rays, tfs, ok, c_real),
                    _tile_entry_row(dslabs, *rays, tfs, ok, c_real),
                )
            elif not use_super:
                row = _tile_entry_row(slabs, *rays, tfs, ok, c_real)
            else:
                # phase A: one [TILE_R, 128] battery over the union boxes
                srow = _tile_entry_row(sslabs, *rays, tfs, ok, n_super)
                siota = jax.lax.broadcasted_iota(jnp.int32, srow.shape, 1)
                blk = jax.lax.broadcasted_iota(
                    jnp.int32, (1, cpad), 1) // 128
                tiles128 = cpad // 128

                def refine(sc, row):
                    e_s = jnp.min(jnp.where(siota == sc, srow, FLT_MAX))

                    def do(row):
                        ds = pl.ds(sc * 128, 128)
                        mslabs = tuple(t[0:1, ds] for t in slabs)
                        # c_real=128: member padding lanes carry inverted
                        # boxes (never hit), no extra mask needed
                        mrow = _tile_entry_row(
                            mslabs, *rays, tfs, ok, 128)
                        return jnp.where(
                            blk == sc,
                            jnp.tile(mrow, (1, tiles128)), row)

                    return jax.lax.cond(
                        e_s < FLT_MAX, do, lambda r: r, row)

                row = jax.lax.fori_loop(
                    0, n_super, refine,
                    jnp.full((1, cpad), FLT_MAX, jnp.float32))
                lane = jax.lax.broadcasted_iota(jnp.int32, row.shape, 1)
                row = jnp.where(lane < c_real, row, FLT_MAX)
            # accumulate rows in registers; a [1, Cp] row store is a
            # partial-sublane write (read-modify-write per tile) — batching
            # 8 rows per VMEM store keeps every store a full sublane group
            return jnp.where(
                sub == jax.lax.rem(i, 8), jnp.broadcast_to(row, (8, cpad)),
                acc,
            )

        # fori (not unrolled): Mosaic reuses the body's VMEM stack — the
        # unrolled form held 8 tiles of slab temporaries live at once and
        # blew the 16 MB scoped-vmem limit at Cp=896 (100k tris, 4K chunks)
        for g in range(ppb // 8):
            acc = jax.lax.fori_loop(
                g * 8, g * 8 + 8, body,
                jnp.zeros((8, cpad), jnp.float32),
            )
            if not sort_in_kernel:
                out[pl.ds(g * 8, 8), :] = acc
                continue
            # Selection sort, all 8 tile-rows in lockstep, pure vector ops:
            # per step, min + first-match min-iota lane, write column k of
            # the sorted outputs by lane mask, retire the winning lane.
            # Tie-break (lowest cluster id first) matches jnp.argsort's
            # stable order bit-for-bit. Rows exhausted before nmax steps
            # keep emitting FLT_MAX columns — beyond their nvis, unread.
            gidx = jax.lax.broadcasted_iota(jnp.int32, (8, cpad), 1)
            nvis8 = jnp.sum((acc < FLT_MAX).astype(jnp.int32), axis=1,
                            keepdims=True)
            ns[0, 0] = jnp.max(nvis8)

            def step(k, st):
                e, se, sv = st
                m = jnp.min(e, axis=1, keepdims=True)
                a = jnp.min(
                    jnp.where(e == jnp.broadcast_to(m, e.shape), gidx,
                              jnp.int32(1 << 30)),
                    axis=1, keepdims=True,
                )
                sel = gidx == k
                se = jnp.where(sel, jnp.broadcast_to(m, se.shape), se)
                sv = jnp.where(sel, jnp.broadcast_to(a, sv.shape), sv)
                e = jnp.where(gidx == jnp.broadcast_to(a, e.shape),
                              FLT_MAX, e)
                return e, se, sv

            _, se, sv = jax.lax.fori_loop(
                0, ns[0, 0], step,
                (acc,
                 jnp.full((8, cpad), FLT_MAX, jnp.float32),
                 jnp.zeros((8, cpad), jnp.int32)),
            )
            out_e[pl.ds(g * 8, 8), :] = se
            out_v[pl.ds(g * 8, 8), :] = sv

    return kernel


def _plan_visits(cp: ClusteredPrims, ray_in, t_tiles: int, tile_r: int,
                 sort: bool, interpret: bool, plan: str = "ray",
                 plan_block: int = 8, sort_impl: str = "kernel"):
    """Per ray-tile broad phase. Returns (visit [T,C] i32 cluster ids sorted
    near-to-far, entry [T,C] f32 sorted tile-min entry distances (FLT_MAX
    past the end), nvis [T,1] i32). T must be a multiple of 8 (both this
    kernel's output blocks and the traversal kernel's SMEM blocks map 8
    tile-rows at a time).

    Rays whose tfar is 0 (masked shadow lanes, dead wavefront lanes,
    padding) plan no visits; a tile of only such rays is skipped entirely
    by the traversal kernel.

    `sort_impl='kernel'` (default; requires sort=True and the 'ray'
    planner) sorts inside the planner program — bit-identical output to
    the XLA path ('xla': argsort + take_along_axis), which costs ~2-3 ms
    per traversal call at 147k rays against ~0.1 ms in-kernel.
    """
    c = cp.num_clusters
    ppb = plan_block
    while t_tiles % ppb:  # t_tiles is a multiple of 8; shrink ppb to fit
        ppb //= 2
    ppb = max(ppb, 8)
    use_dual = plan == "group"
    if use_dual and cp.glo is None:
        # group boxes not built for this pack (e.g. morton clustering or
        # group_boxes=False) — per-row culling degenerates to the row union
        use_dual = False
        plan = "ray"
    if use_dual:
        sets = _group_slab_rows(cp)
        slabs = tuple(_match_vma(sets[:6], ray_in[0]))
        cpad = slabs[0].shape[1]
    else:
        slabs, cpad = _slab_rows(cp)
        slabs = _match_vma(slabs, ray_in[0])
    use_super = plan == "super"
    sslabs, sspecs = (), []
    if use_super:
        sslabs = tuple(_match_vma(_super_slab_rows(cp), ray_in[0]))
        sp = sslabs[0].shape[1]
        sspecs = [pl.BlockSpec((8, sp), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)] * 6
    if use_dual:
        sslabs = tuple(_match_vma(sets[6:], ray_in[0]))
        sspecs = [pl.BlockSpec((8, cpad), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)] * 6
    slab_spec = pl.BlockSpec((8, cpad), lambda i: (0, 0), memory_space=pltpu.VMEM)
    colb = pl.BlockSpec((ppb * tile_r, 1), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    if sort and sort_impl == "kernel" and plan in ("ray", "super", "group"):
        out_spec = pl.BlockSpec((ppb, cpad), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
        entry_s, visit = pl.pallas_call(
            _make_plan_kernel(c, tile_r, ppb, sort_in_kernel=True,
                              use_super=use_super, use_dual=use_dual),
            grid=(t_tiles // ppb,),
            in_specs=[slab_spec] * 6 + sspecs + [colb] * 8,
            out_specs=[out_spec, out_spec],
            out_shape=[
                _out_struct((t_tiles, cpad), jnp.float32, ray_in[0]),
                _out_struct((t_tiles, cpad), jnp.int32, ray_in[0]),
            ],
            scratch_shapes=[pltpu.SMEM((1, 1), jnp.int32)],
            interpret=interpret,
            compiler_params=_COMPILER_PARAMS,
        )(*slabs, *sslabs, *ray_in)
        entry_sorted = entry_s[:, :c]
        order = visit[:, :c]
        nvis = jnp.sum((entry_sorted < FLT_MAX).astype(jnp.int32), axis=1,
                       keepdims=True)
        return order, entry_sorted, nvis
    maker = {
        "tilebox": _make_plan_kernel_tilebox,
        "hybrid": _make_plan_kernel_hybrid,
    }.get(plan, _make_plan_kernel)
    if use_super:
        kern = maker(c, tile_r, ppb, use_super=True)
    elif use_dual:
        kern = maker(c, tile_r, ppb, use_dual=True)
    else:
        kern = maker(c, tile_r, ppb)
    entry_t = pl.pallas_call(
        kern,
        grid=(t_tiles // ppb,),
        in_specs=[slab_spec] * 6 + sspecs + [colb] * 8,
        out_specs=pl.BlockSpec((ppb, cpad), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=_out_struct((t_tiles, cpad), jnp.float32, ray_in[0]),
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(*slabs, *sslabs, *ray_in)
    entry_t = entry_t[:, :c]  # [T, C]
    nvis = jnp.sum((entry_t < FLT_MAX).astype(jnp.int32), axis=1, keepdims=True)
    if sort:
        order = jnp.argsort(entry_t, axis=1).astype(jnp.int32)
        entry_sorted = jnp.take_along_axis(entry_t, order, axis=1)
    else:
        # visit in morton order, hit clusters compacted to the front by a
        # stable sort on the hit flag only
        key = (entry_t >= FLT_MAX).astype(jnp.int32)
        order = jnp.argsort(key, axis=1, stable=True).astype(jnp.int32)
        entry_sorted = jnp.take_along_axis(entry_t, order, axis=1)
        # The kernels' early-exit test `entry[j] < mx` assumes entries are
        # front-to-back sorted (all later entries at least as far). Morton
        # order is NOT: a far "spike" cluster mid-list would terminate the
        # loop and skip a later nearer cluster that still holds a valid hit
        # (constructible: blockers shrink mx at the 8-visit refresh, then
        # spike >= mx precedes dip < mx). Passing the SUFFIX MINIMUM makes
        # the test mean "no remaining cluster can beat any lane's bound" —
        # provably safe for any visit order; for sorted entries it is the
        # identity, so sort=True is untouched. NOTE: interpret mode never
        # exercises this path — the interpreter's while_loop cond reads a
        # stale mx (SMEM writes in the body don't reach cond), so the exit
        # only fires in compiled Mosaic; benchmarks/tpu_goldens.py gates it.
        entry_sorted = jax.lax.cummin(entry_sorted, axis=1, reverse=True)
    return order, entry_sorted, nvis


# ---------------------------------------------------------------------------
# Traversal kernels (visit lists + entry distances as SMEM scalars)
# ---------------------------------------------------------------------------
def _fuse_width(fuse) -> int:
    """Normalize the fuse knob: False/0 = serial loop, True = paired visits
    (the original fused schedule), 2/4 = that many clusters per loop trip."""
    if fuse is True:
        return 2
    return int(fuse or 0)


def _pack_rows(attrs, cs_group, lane_grp, k_prims):
    """[1, 128] attribute rows covering a lane-packed GROUP of sub-128
    clusters: the tables are lane-TILED (each [C, 128] row repeats its
    cluster's K values 128/K times — see _tables in the wrappers), so lane
    group g of the packed row takes cluster cs_group[g]'s row unshifted
    (value at lane l is prim l % K in every group). pack-1 scalar-gated
    vector selects per attribute, no lane concat/rotate (Mosaic-safe)."""
    rows = []
    for a in attrs:
        r = a[cs_group[0]][None, :]
        for g in range(1, len(cs_group)):
            r = jnp.where(lane_grp == g, a[cs_group[g]][None, :], r)
        rows.append(r)
    return tuple(rows)


def _make_closest_kernel(kind: str, k_prims: int, mxu: bool = False,
                         unroll: int = 1, fuse=False, tb: int = 1,
                         pack: int = 1, er: int = 8, prefetch: bool = False):
    battery = _BATTERIES[kind]
    use_mxu = mxu and kind == "triangle"
    n_attr = _N_ATTRS[kind]
    fw = _fuse_width(fuse)
    if pack > 1:
        fw = max(fw, 1)  # lane-packed mode runs through the fused branch

    def kernel(*refs):
        (nvis, visit, entry, root) = refs[:4]
        (px, py, pz, dx, dy, dz, tfin, valid) = refs[4:12]
        attrs = refs[12 : 12 + n_attr]
        tfar_out, prim_out = refs[12 + n_attr : 14 + n_attr]
        mx = refs[14 + n_attr]
        lane_grp = (
            jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1) // k_prims
            if pack > 1 else None
        )

        def one_tile(row, u, _):
            s = pl.ds(u * px.shape[0] // tb, px.shape[0] // tb)
            tf0 = tfin[s, :]
            ok = valid[s, :] > 0
            rpx, rpy, rpz = px[s, :], py[s, :], pz[s, :]
            rdx, rdy, rdz = dx[s, :], dy[s, :], dz[s, :]
            rexit = _root_exit_bound(root, rpx, rpy, rpz, rdx, rdy, rdz)
            bound = jnp.minimum(tf0, rexit)
            mx[0, 0] = jnp.max(jnp.where(ok, bound, -FLT_MAX))
            n = nvis[row, 0]
            if use_mxu:  # [TILE_R, 3] ray matrices, hoisted out of the loop
                pmat = jnp.concatenate([rpx, rpy, rpz], axis=1)
                dmat = jnp.concatenate([rdx, rdy, rdz], axis=1)

            def battery_at(c):
                if use_mxu:
                    return _triangle_battery_mxu(pmat, dmat, attrs, c, k_prims)
                rows = tuple(a[c][None, :] for a in attrs)
                return battery(rpx, rpy, rpz, rdx, rdy, rdz, rows)

            def select_best(t, tfc, prc, packed_of):
                best = jnp.min(t, axis=1, keepdims=True)
                # first-match min-iota instead of argmin: the (f32,i32)
                # tuple-reduce lowers poorly on the VPU (~13% of the whole
                # brute battery); same first-occurrence tie-break, bit-exact
                lanes = jax.lax.broadcasted_iota(jnp.int32, t.shape, 1)
                arg = jnp.min(
                    jnp.where(t == best, lanes, jnp.int32(1 << 30)),
                    axis=1, keepdims=True,
                )
                closer = (best < tfc) & ok
                return (jnp.where(closer, best, tfc),
                        jnp.where(closer, packed_of(arg), prc))

            if not fw:
                tfar_out[s, :] = tf0
                prim_out[s, :] = jnp.full((px.shape[0] // tb, 1), -1,
                                          jnp.int32)

                def visit_one(j):
                    c = visit[row, j]
                    tfc, prc = select_best(
                        battery_at(c), tfar_out[s, :], prim_out[s, :],
                        lambda arg: c * k_prims + arg,
                    )
                    tfar_out[s, :] = tfc
                    prim_out[s, :] = prc

                def cond(j):
                    return (j < n) & (entry[row, j] < mx[0, 0])

                def body(j):
                    visit_one(j)
                    # Extra visits share one loop trip (fewer while-loop
                    # control round-trips). Each is gated on the same
                    # sorted-entry early-exit test the serial cond applies;
                    # skipping/extra-visiting past the bound cannot change
                    # results (a cluster with tile-entry >= the max live
                    # tfar can't beat any lane's current best). The entry
                    # index is clamped in-bounds — the j+u<n gate makes the
                    # clamped read's value irrelevant.
                    for u2 in range(1, unroll):
                        ju = jnp.minimum(j + u2, n - 1)
                        @pl.when((j + u2 < n) & (entry[row, ju] < mx[0, 0]))
                        def _(ju=ju):
                            visit_one(ju)

                    # refresh the early-exit bound only every `er`-th visit:
                    # the cross-sublane max -> SMEM write is a VPU->scalar
                    # sync that would otherwise serialize the scalar unit
                    # against every battery; a stale mx is LARGER, so the
                    # exit stays conservative
                    @pl.when(jax.lax.rem(j, er) == er - unroll)
                    def _():
                        mx[0, 0] = jnp.max(
                            jnp.where(
                                ok,
                                jnp.minimum(tfar_out[s, :], bound),
                                -FLT_MAX,
                            )
                        )

                    return j + unroll

                jax.lax.while_loop(cond, body, jnp.int32(0))
            else:
                # Fused visits with loop-carried hit state: each trip
                # covers w = fw*pack clusters — fw batteries, each a
                # [TILE_R, pack*K] lane-packed group of `pack` sub-128
                # clusters (_pack_rows) — concatenated into one
                # [TILE_R, fw*128] block, so the min / min-iota reductions
                # and the closer/select epilogue run once per TRIP, and
                # the running (tfar, prim) ride the while_loop carry
                # instead of VMEM refs (no per-visit load/store).
                # Bit-exact vs the serial loop: cluster u's lanes precede
                # cluster u+1's in the concat/pack order, so the
                # lexicographic (t, lane) tie-break keeps the
                # visit-order-first semantics, and each extra visit's gate
                # (j+u < n, sorted entry below the stale bound) is the
                # same test the serial pl.when applies — ungated lanes of
                # a partially-live group are forced to FLT_MAX.
                w = fw * pack

                def read_trip(j):
                    """Scalar SMEM reads for the trip starting at visit j.
                    visit/entry are loop-invariant inputs, so values read a
                    trip early (prefetch mode) are identical to values read
                    at the trip itself. The lower clamp matters only for the
                    pre-loop prefetch of an empty (n == 0) visit list, whose
                    values are never used."""
                    nm1 = jnp.maximum(n - 1, 0)
                    cs, es = [], []
                    for u2 in range(w):
                        ju = jnp.minimum(j + u2, nm1)
                        cs.append(visit[row, ju])
                        es.append(entry[row, ju])
                    return tuple(cs), tuple(es)

                def trip(j, cs, es, tfc, prc):
                    """One fused trip: w = fw*pack cluster batteries with
                    the shared select/early-exit epilogue. `es[u2]` is
                    entry[row, j+u2] (however it was fetched)."""
                    uses = [None] + [
                        (j + u2 < n) & (es[u2] < mx[0, 0])
                        for u2 in range(1, w)
                    ]
                    ts = []
                    for b in range(fw):
                        grp = cs[b * pack:(b + 1) * pack]
                        gus = uses[b * pack:(b + 1) * pack]
                        if pack == 1:
                            tb_ = battery_at(grp[0])
                            if gus[0] is not None:
                                tb_ = jnp.where(gus[0], tb_, FLT_MAX)
                        else:
                            rows = _pack_rows(attrs, grp, lane_grp, k_prims)
                            tb_ = battery(rpx, rpy, rpz, rdx, rdy, rdz,
                                          rows)
                            gm = None
                            for g, gu in enumerate(gus):
                                if gu is None:
                                    continue
                                bad = (lane_grp == g) & jnp.logical_not(gu)
                                gm = bad if gm is None else (gm | bad)
                            if gm is not None:
                                tb_ = jnp.where(gm, FLT_MAX, tb_)
                        ts.append(tb_)
                    t = jnp.concatenate(ts, axis=1) if fw > 1 else ts[0]

                    def packed_of(arg):
                        wk = pack * k_prims
                        bb = arg // wk
                        li = arg - bb * wk
                        g = li // k_prims
                        pr = li - g * k_prims
                        grp_i = bb * pack + g
                        c_sel = cs[0]
                        for i in range(1, w):
                            c_sel = jnp.where(grp_i == i, cs[i], c_sel)
                        return c_sel * k_prims + pr

                    tfc, prc = select_best(t, tfc, prc, packed_of)

                    @pl.when(jax.lax.rem(j, er) == (er - w) % er)
                    def _():
                        mx[0, 0] = jnp.max(
                            jnp.where(ok, jnp.minimum(tfc, bound), -FLT_MAX)
                        )

                    return tfc, prc

                init = (jnp.int32(0), tf0,
                        jnp.full((px.shape[0] // tb, 1), -1, jnp.int32))
                if not prefetch:
                    def cond(state):
                        j = state[0]
                        return (j < n) & (entry[row, j] < mx[0, 0])

                    def body(state):
                        j, tfc, prc = state
                        cs, es = read_trip(j)
                        tfc, prc = trip(j, cs, es, tfc, prc)
                        return j + w, tfc, prc

                    _, tfc, prc = jax.lax.while_loop(cond, body, init)
                else:
                    # Prefetched walk: the NEXT trip's visit/entry scalars
                    # ride the loop carry, fetched at the END of the
                    # previous body — the scalar unit resolves trip j+w's
                    # cluster addresses while the VPU is still draining
                    # trip j's batteries, and the loop cond tests the
                    # carried entry instead of a fresh SMEM load.
                    # Bit-exact: visit/entry are loop-invariant (see
                    # read_trip) and mx is read at the same program points.
                    cs0, es0 = read_trip(jnp.int32(0))

                    def cond(state):
                        j, _cs, es = state[0], state[1], state[2]
                        return (j < n) & (es[0] < mx[0, 0])

                    def body(state):
                        j, cs, es, tfc, prc = state
                        tfc, prc = trip(j, cs, es, tfc, prc)
                        jn = j + w
                        ncs, nes = read_trip(jn)
                        return jn, ncs, nes, tfc, prc

                    _, _, _, tfc, prc = jax.lax.while_loop(
                        cond, body,
                        (init[0], cs0, es0, init[1], init[2]),
                    )
                tfar_out[s, :] = tfc
                prim_out[s, :] = prc
            return 0

        if tb == 1:
            one_tile(jax.lax.rem(pl.program_id(0), 8), 0, 0)
        else:
            # one program walks `tb` tiles (its whole 8-row SMEM block):
            # per-program fixed cost (block copies, grid bookkeeping,
            # out-spec plumbing) amortizes over tb tiles
            jax.lax.fori_loop(
                0, tb, lambda u, _: one_tile(u, u, 0), 0
            )

    return kernel


def _make_shadow_kernel(kind: str, k_prims: int = 0, mxu: bool = False,
                        unroll: int = 1, fuse=False, tb: int = 1,
                        pack: int = 1, er: int = 8, prefetch: bool = False):
    battery = _ANYHIT_BATTERIES[kind]
    use_mxu = mxu and kind == "triangle"
    n_attr = _N_ATTRS[kind]
    fw = _fuse_width(fuse)
    if pack > 1:
        fw = max(fw, 1)

    def kernel(*refs):
        (nvis, visit, entry, root) = refs[:4]
        (px, py, pz, dx, dy, dz, tfar, valid) = refs[4:12]
        attrs = refs[12 : 12 + n_attr]
        occ_out = refs[12 + n_attr]
        mx = refs[13 + n_attr]
        lane_grp = (
            jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1) // k_prims
            if pack > 1 else None
        )

        def one_tile(row, u, _):
            s = pl.ds(u * px.shape[0] // tb, px.shape[0] // tb)
            ok = valid[s, :] > 0
            tf = tfar[s, :]
            rpx, rpy, rpz = px[s, :], py[s, :], pz[s, :]
            rdx, rdy, rdz = dx[s, :], dy[s, :], dz[s, :]
            rexit = _root_exit_bound(root, rpx, rpy, rpz, rdx, rdy, rdz)
            bound = jnp.minimum(tf, rexit)
            # worst unoccluded distance: clusters entirely beyond it can't
            # occlude
            mx[0, 0] = jnp.max(jnp.where(ok, bound, -FLT_MAX))
            n = nvis[row, 0]
            if use_mxu:
                pmat = jnp.concatenate([rpx, rpy, rpz], axis=1)
                dmat = jnp.concatenate([rdx, rdy, rdz], axis=1)

            def battery_at(c):
                if use_mxu:
                    return (
                        _triangle_battery_mxu(pmat, dmat, attrs, c, k_prims)
                        < tf
                    )
                rows = tuple(a[c][None, :] for a in attrs)
                return battery(rpx, rpy, rpz, rdx, rdy, rdz, tf, rows)

            if not fw:
                occ_out[s, :] = jnp.zeros((px.shape[0] // tb, 1), jnp.int32)

                def visit_one(j):
                    occ = battery_at(visit[row, j])
                    hit = jnp.any(occ, axis=1, keepdims=True) & ok
                    occ_out[s, :] = jnp.where(hit, 1, occ_out[s, :])

                def cond(j):
                    return (j < n) & (entry[row, j] < mx[0, 0])

                def body(j):
                    visit_one(j)
                    for u2 in range(1, unroll):  # see closest kernel
                        ju = jnp.minimum(j + u2, n - 1)
                        @pl.when((j + u2 < n) & (entry[row, ju] < mx[0, 0]))
                        def _(ju=ju):
                            visit_one(ju)

                    @pl.when(jax.lax.rem(j, er) == er - unroll)
                    def _():
                        live = ok & (occ_out[s, :] == 0)
                        mx[0, 0] = jnp.max(jnp.where(live, bound, -FLT_MAX))

                    return j + unroll

                jax.lax.while_loop(cond, body, jnp.int32(0))
            else:
                # fused visits (w = fw*pack per trip), occlusion bits
                # carried. Per-battery any-reductions OR'd together, NOT
                # an i1 concat: Mosaic cannot bitcast i1 vregs for the
                # concatenate (caught on hardware by tpu_goldens.py;
                # interpret mode accepts both). Any-hit is
                # order-insensitive so the OR is identical; lane-packed
                # groups mask ungated lanes off before the reduction.
                w = fw * pack

                def read_trip(j):
                    # see the closest kernel's read_trip
                    nm1 = jnp.maximum(n - 1, 0)
                    cs, es = [], []
                    for u2 in range(w):
                        ju = jnp.minimum(j + u2, nm1)
                        cs.append(visit[row, ju])
                        es.append(entry[row, ju])
                    return tuple(cs), tuple(es)

                def trip(j, cs, es, occv):
                    uses = [None] + [
                        (j + u2 < n) & (es[u2] < mx[0, 0])
                        for u2 in range(1, w)
                    ]
                    hit = None
                    for b in range(fw):
                        grp = cs[b * pack:(b + 1) * pack]
                        gus = uses[b * pack:(b + 1) * pack]
                        if pack == 1:
                            hb = jnp.any(battery_at(grp[0]), axis=1,
                                         keepdims=True)
                            if gus[0] is not None:
                                hb = hb & gus[0]
                        else:
                            rows = _pack_rows(attrs, grp, lane_grp, k_prims)
                            occb = battery(rpx, rpy, rpz, rdx, rdy, rdz,
                                           tf, rows)
                            for g, gu in enumerate(gus):
                                if gu is None:
                                    continue
                                occb = occb & (
                                    jnp.logical_not(lane_grp == g) | gu
                                )
                            hb = jnp.any(occb, axis=1, keepdims=True)
                        hit = hb if hit is None else (hit | hb)
                    hit = hit & ok
                    occv = jnp.where(hit, 1, occv)

                    @pl.when(jax.lax.rem(j, er) == (er - w) % er)
                    def _():
                        live = ok & (occv == 0)
                        mx[0, 0] = jnp.max(jnp.where(live, bound, -FLT_MAX))

                    return occv

                occ0 = jnp.zeros((px.shape[0] // tb, 1), jnp.int32)
                if not prefetch:
                    def cond(state):
                        j = state[0]
                        return (j < n) & (entry[row, j] < mx[0, 0])

                    def body(state):
                        j, occv = state
                        cs, es = read_trip(j)
                        return j + w, trip(j, cs, es, occv)

                    _, occv = jax.lax.while_loop(
                        cond, body, (jnp.int32(0), occ0)
                    )
                else:
                    # see the closest kernel's prefetched walk
                    cs0, es0 = read_trip(jnp.int32(0))

                    def cond(state):
                        j, _cs, es = state[0], state[1], state[2]
                        return (j < n) & (es[0] < mx[0, 0])

                    def body(state):
                        j, cs, es, occv = state
                        occv = trip(j, cs, es, occv)
                        jn = j + w
                        ncs, nes = read_trip(jn)
                        return jn, ncs, nes, occv

                    _, _, _, occv = jax.lax.while_loop(
                        cond, body, (jnp.int32(0), cs0, es0, occ0)
                    )
                occ_out[s, :] = occv
            return 0

        if tb == 1:
            one_tile(jax.lax.rem(pl.program_id(0), 8), 0, 0)
        else:
            jax.lax.fori_loop(
                0, tb, lambda u, _: one_tile(u, u, 0), 0
            )

    return kernel


# ---------------------------------------------------------------------------
# HBM-streaming traversal (pallas_stream): cluster attribute tables stay in
# HBM ([C*F, K] packed rows, memory_space=ANY) and each visit DMAs its
# cluster's F rows into a double-buffered VMEM scratch, prefetching the next
# visit while the current battery runs. Lifts the VMEM-residency ceiling
# (~1M tris at the 64 MB grant) to HBM scale: per-visit traffic is F*K*4 B
# (48 KB at K=1024) against a ~2.6 us battery — fully overlapped.
# ---------------------------------------------------------------------------
def _stream_rows(kind: str) -> int:
    """Rows per cluster in the packed streaming table: n_attr rounded up to
    the 8-sublane tiling — Mosaic requires VMEM memref slices 8-row-aligned
    in dim 0 ("Slice shape along dimension 0 must be aligned to tiling (8)",
    caught on the first hardware compile; interpret mode accepts unpadded)."""
    return -(-_N_ATTRS[kind] // 8) * 8


STREAM_SLOTS = 2


def _stream_kernels(kind: str, k_prims: int, shadow: bool,
                    slots: int = None):
    battery = (_ANYHIT_BATTERIES if shadow else _BATTERIES)[kind]
    n_attr = _N_ATTRS[kind]
    f8 = _stream_rows(kind)
    slots = STREAM_SLOTS if slots is None else slots

    def kernel(*refs):
        (nvis, visit, entry, root) = refs[:4]
        (px, py, pz, dx, dy, dz, tfin, valid) = refs[4:12]
        packed = refs[12]  # [C*F, K] in HBM/ANY
        if shadow:
            occ_out = refs[13]
            mx, buf, sem = refs[14:17]
        else:
            tfar_out, prim_out = refs[13:15]
            mx, buf, sem = refs[15:18]
        row = jax.lax.rem(pl.program_id(0), 8)
        tf0 = tfin[:]
        ok = valid[:] > 0
        rpx, rpy, rpz = px[:], py[:], pz[:]
        rdx, rdy, rdz = dx[:], dy[:], dz[:]
        rexit = _root_exit_bound(root, rpx, rpy, rpz, rdx, rdy, rdz)
        bound = jnp.minimum(tf0, rexit)
        mx[0, 0] = jnp.max(jnp.where(ok, bound, -FLT_MAX))
        n = nvis[row, 0]
        if not shadow:
            tfar_out[:] = tf0
            prim_out[:] = jnp.full(prim_out.shape, -1, jnp.int32)
        else:
            occ_out[:] = jnp.zeros(occ_out.shape, jnp.int32)

        def dma(j, slot):
            c = visit[row, j]
            return pltpu.make_async_copy(
                packed.at[pl.ds(c * f8, f8), :],
                buf.at[pl.ds(slot * f8, f8), :],
                sem.at[slot],
            )

        @pl.when(n > 0)
        def _():
            dma(jnp.int32(0), jnp.int32(0)).start()

        def cond(j):
            return (j < n) & (entry[row, j] < mx[0, 0])

        def body(j):
            slot = jax.lax.rem(j, slots)
            # prefetch the NEXT visit before blocking on the current one;
            # a prefetch past the early-exit point is consumed by the
            # post-loop cleanup wait (every start has a matching wait)
            @pl.when(j + 1 < n)
            def _():
                dma(j + 1, jax.lax.rem(j + 1, slots)).start()

            dma(j, slot).wait()
            base = slot * f8
            rows = tuple(
                buf[pl.ds(base + f, 1), :] for f in range(n_attr)
            )
            if shadow:
                occ = battery(rpx, rpy, rpz, rdx, rdy, rdz, tf0, rows)
                hit = jnp.any(occ, axis=1, keepdims=True) & ok
                occ_out[:] = jnp.where(hit, 1, occ_out[:])
            else:
                c = visit[row, j]
                t = battery(rpx, rpy, rpz, rdx, rdy, rdz, rows)
                best = jnp.min(t, axis=1, keepdims=True)
                lanes = jax.lax.broadcasted_iota(jnp.int32, t.shape, 1)
                arg = jnp.min(
                    jnp.where(t == best, lanes, jnp.int32(1 << 30)),
                    axis=1, keepdims=True,
                )
                closer = (best < tfar_out[:]) & ok
                tfar_out[:] = jnp.where(closer, best, tfar_out[:])
                prim_out[:] = jnp.where(closer, c * k_prims + arg,
                                        prim_out[:])

            @pl.when(jax.lax.rem(j, 8) == 7)
            def _():
                if shadow:
                    live = ok & (occ_out[:] == 0)
                    mx[0, 0] = jnp.max(jnp.where(live, bound, -FLT_MAX))
                else:
                    mx[0, 0] = jnp.max(
                        jnp.where(ok, jnp.minimum(tfar_out[:], bound),
                                  -FLT_MAX)
                    )

            return j + 1

        j_exit = jax.lax.while_loop(cond, body, jnp.int32(0))

        # drain the dangling prefetch (started for a trip that never ran)
        @pl.when(j_exit < n)
        def _():
            dma(j_exit, jax.lax.rem(j_exit, slots)).wait()

    return kernel


def _tables_packed(cp: ClusteredPrims):
    """[C*F8, K] row-packed attribute planes for the streaming kernels:
    cluster c's attribute rows are contiguous (zero-padded from n_attr to
    the 8-row sublane tiling, see _stream_rows), so one aligned DMA fetches
    a whole cluster."""
    attrs = _tables(cp)
    c, k = cp.num_clusters, cp.cluster_size
    f8 = _stream_rows(cp.kind)
    stacked = jnp.stack(attrs, axis=1)  # [C, F, K]
    if f8 != len(attrs):
        stacked = jnp.pad(stacked, ((0, 0), (0, f8 - len(attrs)), (0, 0)))
    return stacked.reshape(c * f8, k)


# ---------------------------------------------------------------------------
# Host-facing wrappers
# ---------------------------------------------------------------------------
def _tables(cp: ClusteredPrims):
    """[C*K, F] packed rows -> per-attribute [C, K] planes (free reshape).
    Triangles use the Baldwin-Weber plane form (n, d0, u-row, v-row): when
    the cluster build stored precomputed planes (ClusteredPrims.planes —
    the canonical bit pattern; see clustered._bw_planes_np) this is a pure
    layout transform, so the resident and streaming kernels consume
    identical bits. The traced fallback below (for hand-built cps without
    planes) computes the same math in-program; degenerate / padding rows
    yield n = 0, which the battery's |den| mask rejects."""
    c, k = cp.num_clusters, cp.cluster_size
    rows = cp.rows.reshape(c, k, -1)
    if cp.kind != "triangle":
        return tuple(rows[:, :, f] for f in range(rows.shape[2]))
    if cp.planes is not None:
        pr = cp.planes.reshape(c, k, 12)
        return tuple(pr[:, :, f] for f in range(12))
    v0 = rows[:, :, 0:3]
    e1 = rows[:, :, 3:6]
    e2 = rows[:, :, 6:9]

    def cross(a, b):
        return jnp.stack(
            [
                a[..., 1] * b[..., 2] - a[..., 2] * b[..., 1],
                a[..., 2] * b[..., 0] - a[..., 0] * b[..., 2],
                a[..., 0] * b[..., 1] - a[..., 1] * b[..., 0],
            ],
            axis=-1,
        )

    n = cross(e1, e2)
    nn = jnp.sum(n * n, axis=-1)
    inv = jnp.where(nn > 0.0, 1.0 / jnp.maximum(nn, 1e-38), 0.0)[..., None]
    f1 = cross(e2, n) * inv  # u = f1 . x + g1 (u(v0+e1)=1, u(v0+e2)=0)
    f2 = -cross(e1, n) * inv
    d0 = jnp.sum(n * v0, axis=-1)
    g1 = -jnp.sum(f1 * v0, axis=-1)
    g2 = -jnp.sum(f2 * v0, axis=-1)
    return (
        n[..., 0], n[..., 1], n[..., 2], d0,
        f1[..., 0], f1[..., 1], f1[..., 2], g1,
        f2[..., 0], f2[..., 1], f2[..., 2], g2,
    )


def _slab_rows(cp: ClusteredPrims):
    """Cluster AABBs as six [8, Cp] lane-major planes (Cp = C padded to
    128; padded lanes are masked off in-kernel by the c_real iota)."""
    c = cp.num_clusters
    cpad = -(-c // 128) * 128
    out = []
    for a, pad in (
        (cp.lo.x, 1e30), (cp.lo.y, 1e30), (cp.lo.z, 1e30),
        (cp.hi.x, -1e30), (cp.hi.y, -1e30), (cp.hi.z, -1e30),
    ):
        # pad lanes with +inf (lo) / -inf (hi): inverted boxes no ray can
        # enter, and the entry-row c_real mask ignores them anyway (the
        # root-AABB union is reduced in XLA from the unpadded cp tables —
        # see _root_row)
        a = _pad1(a, cpad - c, pad)
        out.append(jnp.broadcast_to(a[None, :], (8, cpad)))
    return out, cpad


def _group_slab_rows(cp: ClusteredPrims):
    """Per-row SAH-leaf GROUP boxes (ClusteredPrims.glo/ghi, [2, C] per
    component) as TWO six-row slab sets for the dual planner (plan='group'):
    set 0 = each row's first packed leaf, set 1 = its second (a copy of the
    first for single-leaf rows, so the min of the two entries is exact)."""
    c = cp.num_clusters
    cpad = -(-c // 128) * 128
    sets = []
    for g in range(2):
        out = []
        for a, pad in (
            (cp.glo.x[g], 1e30), (cp.glo.y[g], 1e30), (cp.glo.z[g], 1e30),
            (cp.ghi.x[g], -1e30), (cp.ghi.y[g], -1e30), (cp.ghi.z[g], -1e30),
        ):
            a = _pad1(a, cpad - c, pad)
            out.append(jnp.broadcast_to(a[None, :], (8, cpad)))
        sets.append(out)
    return sets[0] + sets[1]


def _super_slab_rows(cp: ClusteredPrims):
    """Supercluster AABBs as six [8, 128] lane-major planes: supercluster
    s is the union of (up to) 128 consecutive SAH-order clusters
    [s*128, (s+1)*128) — consecutive leaves of the SAH cut are
    tree-adjacent, so the unions stay spatially tight. Padding lanes
    (>= ceil(C/128)) carry inverted boxes no ray can enter. Loop-invariant
    in the bounce loop (pure function of cp), so XLA hoists the
    reduction."""
    c = cp.num_clusters
    cpad = -(-c // 128) * 128
    s = cpad // 128
    out = []
    for a, pad, red in (
        (cp.lo.x, 1e30, jnp.min), (cp.lo.y, 1e30, jnp.min),
        (cp.lo.z, 1e30, jnp.min),
        (cp.hi.x, -1e30, jnp.max), (cp.hi.y, -1e30, jnp.max),
        (cp.hi.z, -1e30, jnp.max),
    ):
        a = _pad1(a, cpad - c, pad).reshape(s, 128)
        sp = -(-s // 128) * 128
        r = _pad1(red(a, axis=1), sp - s, pad)
        out.append(jnp.broadcast_to(r[None, :], (8, sp)))
    return out


def _root_row(cp: ClusteredPrims):
    """(1, 8) f32 row of the root AABB [lo.xyz, hi.xyz, 0, 0] — the union
    of cluster bounds, reduced once in XLA (cp is bounce-loop-invariant, so
    the reduction hoists) and handed to the traversal kernels via SMEM."""
    return jnp.stack(
        [jnp.min(cp.lo.x), jnp.min(cp.lo.y), jnp.min(cp.lo.z),
         jnp.max(cp.hi.x), jnp.max(cp.hi.y), jnp.max(cp.hi.z),
         jnp.float32(0.0), jnp.float32(0.0)]
    ).astype(jnp.float32).reshape(1, 8)


def _ray_cols(arrs, rp):
    out = []
    for a, padval in arrs:
        n_pad = rp - a.shape[0]
        out.append(_pad1(a, n_pad, padval).reshape(-1, 1))
    return out


@functools.partial(
    jax.jit,
    static_argnames=("tile_r", "sort", "sort_impl", "interpret", "mxu", "plan",
                     "plan_block", "unroll", "fuse", "trav_block", "stream",
                     "exit_refresh", "prefetch"),
)
def intersect_clustered_pallas(
    cp: ClusteredPrims,
    p: Vec3,
    d: Vec3,
    tfar0: Optional[jnp.ndarray] = None,
    alive: Optional[jnp.ndarray] = None,
    tile_r: int = DEFAULT_TILE_R,
    sort: bool = True,
    sort_impl: str = "kernel",
    interpret: bool = False,
    mxu: bool = False,
    plan: str = "ray",
    plan_block: int = 8,
    unroll: int = 1,
    fuse: bool = False,
    trav_block: int = 1,
    stream: bool = False,
    exit_refresh: int = 8,
    prefetch: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Closest hit. Returns (tfar [R], prim_id [R] in ORIGINAL numbering,
    -1 = miss). `tfar0` seeds the search; `alive=False` lanes are planned
    around and return miss. Bit-exact perf knobs: `plan_block` = ray-tiles
    planned per planner program (multiple of 8); `unroll` in {1,2,4,8} =
    cluster visits per traversal-loop trip; `fuse` = paired visits with one
    fused [TILE_R, 2K] reduction and loop-carried hit state (excludes
    unroll>1); `trav_block` in {1,8} = ray-tiles walked per traversal
    program (8 = one whole SMEM block, amortizing per-program fixed cost).
    `stream` keeps the attribute tables in HBM and DMAs each visit's
    cluster into a double-buffered VMEM scratch (scenes beyond the VMEM
    residency ceiling; excludes mxu/fuse/unroll/trav_block).
    `exit_refresh` = visits between early-exit bound refreshes (each is a
    VPU->scalar sync; larger runs the scalar unit further ahead at the
    cost of a staler — always conservative — exit bound). `prefetch`
    carries the next trip's visit/entry scalars in the walk loop state
    (fused modes only). Both bit-exact."""
    assert unroll in (1, 2, 4, 8), unroll
    assert _fuse_width(fuse) in (0, 2, 4), fuse
    assert not (fuse and unroll != 1), (fuse, unroll)
    assert trav_block in (1, 8), trav_block
    assert not (stream and (mxu or fuse or unroll != 1 or trav_block != 1))
    assert exit_refresh in (8, 16, 32, 64), exit_refresh
    assert not (prefetch and stream), "prefetch applies to resident walks"
    num_rays = p.x.shape[0]
    tfar0 = jnp.full((num_rays,), FLT_MAX) if tfar0 is None else tfar0
    t_tiles = -(-(-(-num_rays // tile_r)) // 8) * 8
    rp = t_tiles * tile_r
    c, k = cp.num_clusters, cp.cluster_size
    pack = 128 // k if k < 128 else 1
    if pack > 1:
        assert k * pack == 128, (k, "sub-128 cluster_size must divide 128")
        assert not (mxu or stream), (
            "lane-packed clusters exclude mxu/stream")
        unroll = 1  # subsumed: the packed trip already covers `pack` visits
    valid = (
        jnp.ones((num_rays,), jnp.float32)
        if alive is None
        else alive.astype(jnp.float32)
    )
    plan_tf = tfar0 if alive is None else jnp.where(alive, tfar0, 0.0)
    ray_in = _ray_cols(
        [(p.x, 1e30), (p.y, 1e30), (p.z, 1e30), (d.x, 1.0), (d.y, 1.0),
         (d.z, 1.0), (tfar0, 0.0), (valid, 0.0)], rp,
    )
    plan_in = ray_in[:6] + _ray_cols([(plan_tf, 0.0), (valid, 0.0)], rp)
    visit, entry, nvis = _plan_visits(cp, plan_in, t_tiles, tile_r, sort,
                                      interpret, plan, plan_block, sort_impl)
    attrs = _tables(cp)
    if pack > 1:
        # lane-TILE each [C, K] row to [C, 128] (K values repeated 128/K
        # times) so a lane-packed battery assembles groups with plain
        # scalar-gated selects — lane l of every group holds prim l % K
        attrs = tuple(jnp.tile(a, (1, pack)) for a in attrs)
    attrs = _match_vma(attrs, ray_in[0])
    (root,) = _match_vma((_root_row(cp),), ray_in[0])
    n_attr = len(attrs)
    smem_map = (lambda i: (i // 8, 0)) if trav_block == 1 else (lambda i: (i, 0))
    smem_row = lambda w: pl.BlockSpec(
        (8, w), smem_map, memory_space=pltpu.SMEM
    )
    root_spec = pl.BlockSpec((1, 8), lambda i: (0, 0),
                             memory_space=pltpu.SMEM)
    col = pl.BlockSpec((trav_block * tile_r, 1), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    table = pl.BlockSpec((c, k * pack), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    if stream:
        packed = _match_vma((_tables_packed(cp),), ray_in[0])[0]
        tfar, prim = pl.pallas_call(
            _stream_kernels(cp.kind, k, shadow=False),
            grid=(t_tiles,),
            in_specs=[smem_row(1), smem_row(c), smem_row(c), root_spec]
            + [col] * 8 + [pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=[col, col],
            out_shape=[
                _out_struct((rp, 1), jnp.float32, ray_in[0]),
                _out_struct((rp, 1), jnp.int32, ray_in[0]),
            ],
            scratch_shapes=[
                pltpu.SMEM((1, 1), jnp.float32),
                pltpu.VMEM((STREAM_SLOTS * _stream_rows(cp.kind), k), jnp.float32),
                pltpu.SemaphoreType.DMA((STREAM_SLOTS,)),
            ],
            interpret=interpret,
            compiler_params=_COMPILER_PARAMS,
        )(nvis, visit, entry, root, *ray_in, packed)
    else:
        tfar, prim = pl.pallas_call(
            _make_closest_kernel(cp.kind, k, mxu, unroll, fuse, trav_block,
                                 pack, exit_refresh, prefetch),
            grid=(t_tiles // trav_block,),
            in_specs=[smem_row(1), smem_row(c), smem_row(c), root_spec]
            + [col] * 8 + [table] * n_attr,
            out_specs=[col, col],
            out_shape=[
                _out_struct((rp, 1), jnp.float32, ray_in[0]),
                _out_struct((rp, 1), jnp.int32, ray_in[0]),
            ],
            scratch_shapes=[pltpu.SMEM((1, 1), jnp.float32)],
            interpret=interpret,
            compiler_params=_COMPILER_PARAMS,
        )(nvis, visit, entry, root, *ray_in, *attrs)
    tfar = tfar[:num_rays, 0]
    packed = prim[:num_rays, 0]
    orig = jnp.where(packed >= 0, cp.order[jnp.maximum(packed, 0)], -1)
    return tfar, orig


@functools.partial(
    jax.jit,
    static_argnames=("tile_r", "sort", "sort_impl", "interpret", "mxu", "plan",
                     "plan_block", "unroll", "fuse", "trav_block", "stream",
                     "exit_refresh", "prefetch"),
)
def occluded_clustered_pallas(
    cp: ClusteredPrims,
    p: Vec3,
    d: Vec3,
    tfar: jnp.ndarray,
    tile_r: int = DEFAULT_TILE_R,
    sort: bool = True,
    sort_impl: str = "kernel",
    interpret: bool = False,
    mxu: bool = False,
    plan: str = "ray",
    plan_block: int = 8,
    unroll: int = 1,
    fuse: bool = False,
    trav_block: int = 1,
    stream: bool = False,
    exit_refresh: int = 8,
    prefetch: bool = False,
) -> jnp.ndarray:
    """Any-hit: True where some prim lies at t in [0, tfar). Lanes with
    tfar <= 0 plan no visits (the renderer masks invalid shadow rays by
    tfar=0, renderer.py shadow-trace contract). exit_refresh/prefetch as
    in intersect_clustered_pallas."""
    assert unroll in (1, 2, 4, 8), unroll
    assert _fuse_width(fuse) in (0, 2, 4), fuse
    assert not (fuse and unroll != 1), (fuse, unroll)
    assert trav_block in (1, 8), trav_block
    assert not (stream and (mxu or fuse or unroll != 1 or trav_block != 1))
    assert exit_refresh in (8, 16, 32, 64), exit_refresh
    assert not (prefetch and stream), "prefetch applies to resident walks"
    num_rays = p.x.shape[0]
    t_tiles = -(-(-(-num_rays // tile_r)) // 8) * 8
    rp = t_tiles * tile_r
    c, k = cp.num_clusters, cp.cluster_size
    pack = 128 // k if k < 128 else 1
    if pack > 1:
        assert k * pack == 128, (k, "sub-128 cluster_size must divide 128")
        assert not (mxu or stream), (
            "lane-packed clusters exclude mxu/stream")
        unroll = 1  # subsumed: the packed trip already covers `pack` visits
    valid = (tfar > 0.0).astype(jnp.float32)
    ray_in = _ray_cols(
        [(p.x, 1e30), (p.y, 1e30), (p.z, 1e30), (d.x, 1.0), (d.y, 1.0),
         (d.z, 1.0), (tfar, 0.0), (valid, 0.0)], rp,
    )
    visit, entry, nvis = _plan_visits(cp, ray_in, t_tiles, tile_r, sort,
                                      interpret, plan, plan_block, sort_impl)
    attrs = _tables(cp)
    if pack > 1:
        attrs = tuple(jnp.tile(a, (1, pack)) for a in attrs)
    attrs = _match_vma(attrs, ray_in[0])
    (root,) = _match_vma((_root_row(cp),), ray_in[0])
    n_attr = len(attrs)
    smem_map = (lambda i: (i // 8, 0)) if trav_block == 1 else (lambda i: (i, 0))
    smem_row = lambda w: pl.BlockSpec(
        (8, w), smem_map, memory_space=pltpu.SMEM
    )
    root_spec = pl.BlockSpec((1, 8), lambda i: (0, 0),
                             memory_space=pltpu.SMEM)
    col = pl.BlockSpec((trav_block * tile_r, 1), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    table = pl.BlockSpec((c, k * pack), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    if stream:
        packed = _match_vma((_tables_packed(cp),), ray_in[0])[0]
        occ = pl.pallas_call(
            _stream_kernels(cp.kind, k, shadow=True),
            grid=(t_tiles,),
            in_specs=[smem_row(1), smem_row(c), smem_row(c), root_spec]
            + [col] * 8 + [pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=col,
            out_shape=_out_struct((rp, 1), jnp.int32, ray_in[0]),
            scratch_shapes=[
                pltpu.SMEM((1, 1), jnp.float32),
                pltpu.VMEM((STREAM_SLOTS * _stream_rows(cp.kind), k), jnp.float32),
                pltpu.SemaphoreType.DMA((STREAM_SLOTS,)),
            ],
            interpret=interpret,
            compiler_params=_COMPILER_PARAMS,
        )(nvis, visit, entry, root, *ray_in, packed)
    else:
        occ = pl.pallas_call(
            _make_shadow_kernel(cp.kind, k, mxu, unroll, fuse, trav_block,
                                pack, exit_refresh, prefetch),
            grid=(t_tiles // trav_block,),
            in_specs=[smem_row(1), smem_row(c), smem_row(c), root_spec]
            + [col] * 8 + [table] * n_attr,
            out_specs=col,
            out_shape=_out_struct((rp, 1), jnp.int32, ray_in[0]),
            scratch_shapes=[pltpu.SMEM((1, 1), jnp.float32)],
            interpret=interpret,
            compiler_params=_COMPILER_PARAMS,
        )(nvis, visit, entry, root, *ray_in, *attrs)
    return occ[:num_rays, 0] > 0


# ---------------------------------------------------------------------------
# Coherence ordering: segmented (dead, direction-octant) radix sort.
#
# Tile-union culling only works when a tile's rays agree on which clusters
# matter. Camera/shadow rays arrive pixel-ordered (origin-coherent) but
# diffuse bounce directions are random: a 256-ray tile of mixed octants
# touches ~every cluster (measured nvis 159/160 on the 20k mesh). Sorting
# by direction octant WITHIN segments of consecutive pixels keeps origin
# locality and makes tiles direction-coherent; folding the dead bit in
# front condenses dead lanes into zero-visit tiles. Four stable
# binary-partition passes built from cumsums — no argsort (XLA argsort
# costs ~30 ms at 262k lanes on TPU).
# ---------------------------------------------------------------------------
def coherence_order(alive: jnp.ndarray, d: Vec3, seg_len: int = DEFAULT_SEG_LEN):
    """Returns (order [RP] i32, inv [RP] i32, rp): gather by `order` groups
    each seg_len-ray segment by (alive desc, direction octant); `inv`
    scatters results back. Padding lanes (index >= R) sort last in their
    segment."""
    r = alive.shape[0]
    s = -(-r // seg_len)
    rp = s * seg_len
    octant = (
        (d.x < 0).astype(jnp.int32)
        | ((d.y < 0).astype(jnp.int32) << 1)
        | ((d.z < 0).astype(jnp.int32) << 2)
    )
    key = jnp.where(alive, octant, 8)  # dead lanes sort after all octants
    key = _pad1(key, rp - r, 15).reshape(s, seg_len)
    perm = jnp.broadcast_to(
        jnp.arange(seg_len, dtype=jnp.int32)[None, :], (s, seg_len)
    )
    rows = jnp.arange(s, dtype=jnp.int32)[:, None]
    for bit in range(4):  # LSB-first stable binary radix
        kb = (jnp.take_along_axis(key, perm, axis=1) >> bit) & 1
        n0 = jnp.sum(1 - kb, axis=1, keepdims=True)
        rank0 = jnp.cumsum(1 - kb, axis=1) - 1
        rank1 = n0 + jnp.cumsum(kb, axis=1) - 1
        pos = jnp.where(kb == 1, rank1, rank0)
        perm = jnp.zeros_like(perm).at[rows, pos].set(perm)
    base = (jnp.arange(s, dtype=jnp.int32) * seg_len)[:, None]
    order = (perm + base).reshape(-1)
    inv = jnp.zeros((rp,), jnp.int32).at[order].set(
        jnp.arange(rp, dtype=jnp.int32)
    )
    return order, inv, rp


def compact_order(alive: jnp.ndarray):
    """Returns (order, inv): `order` gathers alive lanes to the front
    (stable), `inv` scatters results back. Built from two cumsums + one
    scatter — XLA argsort on TPU costs ~30 ms at 262k lanes, this is ~free."""
    a = alive.astype(jnp.int32)
    n_alive = jnp.sum(a)
    rank_alive = jnp.cumsum(a) - 1
    rank_dead = n_alive + jnp.cumsum(1 - a) - 1
    inv = jnp.where(alive, rank_alive, rank_dead).astype(jnp.int32)
    r = alive.shape[0]
    order = jnp.zeros((r,), jnp.int32).at[inv].set(
        jnp.arange(r, dtype=jnp.int32)
    )
    return order, inv


def _gather_vec3_padded(v: Vec3, idx, r, padval) -> Vec3:
    def g(a):
        a = _pad1(a, idx.shape[0] - r, padval)
        return a[idx]

    return Vec3(g(v.x), g(v.y), g(v.z))


@functools.partial(
    jax.jit,
    static_argnames=("tile_r", "sort", "sort_impl", "interpret", "seg_len", "mxu", "plan",
                     "plan_block", "unroll", "fuse", "trav_block", "stream"),
)
def intersect_clustered_pallas_compact(
    cp, p, d, alive, tfar0=None, tile_r: int = DEFAULT_TILE_R,
    sort: bool = True, sort_impl: str = "kernel", interpret: bool = False,
    seg_len: int = DEFAULT_SEG_LEN, mxu: bool = False, plan: str = "ray",
    plan_block: int = 8, unroll: int = 1, fuse: bool = False,
    trav_block: int = 1, stream: bool = False, exit_refresh: int = 8,
    prefetch: bool = False,
):
    r = alive.shape[0]
    order, inv, rp = coherence_order(alive, d, seg_len)
    tfar, prim = intersect_clustered_pallas(
        cp,
        _gather_vec3_padded(p, order, r, 1e30),
        _gather_vec3_padded(d, order, r, 1.0),
        tfar0=None if tfar0 is None else _pad1(tfar0, rp - r, 0.0)[order],
        alive=_pad1(alive, rp - r, False)[order],
        tile_r=tile_r, sort=sort, sort_impl=sort_impl, interpret=interpret,
        mxu=mxu, plan=plan, plan_block=plan_block, unroll=unroll, fuse=fuse,
        trav_block=trav_block, stream=stream, exit_refresh=exit_refresh,
        prefetch=prefetch,
    )
    return tfar[inv[:r]], prim[inv[:r]]


@functools.partial(
    jax.jit,
    static_argnames=("tile_r", "sort", "sort_impl", "interpret", "seg_len", "mxu", "plan",
                     "plan_block", "unroll", "fuse", "trav_block", "stream"),
)
def occluded_clustered_pallas_compact(
    cp, p, d, tfar, tile_r: int = DEFAULT_TILE_R, sort: bool = True,
    sort_impl: str = "kernel", interpret: bool = False,
    seg_len: int = DEFAULT_SEG_LEN,
    mxu: bool = False, plan: str = "ray", plan_block: int = 8,
    unroll: int = 1, fuse: bool = False, trav_block: int = 1,
    stream: bool = False, exit_refresh: int = 8, prefetch: bool = False,
):
    r = tfar.shape[0]
    order, inv, rp = coherence_order(tfar > 0.0, d, seg_len)
    occ = occluded_clustered_pallas(
        cp,
        _gather_vec3_padded(p, order, r, 1e30),
        _gather_vec3_padded(d, order, r, 1.0),
        _pad1(tfar, rp - r, 0.0)[order],
        tile_r=tile_r, sort=sort, sort_impl=sort_impl, interpret=interpret,
        mxu=mxu, plan=plan, plan_block=plan_block, unroll=unroll, fuse=fuse,
        trav_block=trav_block, stream=stream, exit_refresh=exit_refresh,
        prefetch=prefetch,
    )
    return occ[inv[:r]]


def table_bytes(cp: ClusteredPrims) -> int:
    """VMEM footprint of a pack's attribute tables if kept resident
    ([C, max(K,128)] f32 per attribute plane — sub-128 clusters are
    lane-tiled to 128) — the quantity the accel dispatcher compares
    against the streaming threshold."""
    return (cp.num_clusters * max(cp.cluster_size, 128)
            * _N_ATTRS[cp.kind] * 4)
