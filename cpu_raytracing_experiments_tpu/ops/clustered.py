"""Cluster-culled brute-force batteries — the large-scene intersection
backend that actually fits the TPU.

Measured reality (ARCHITECTURE.md): per-ray traversal loops (BVH threading,
grid DDA) lose to the dense battery by 40-90x on TPU because every lockstep
step pays full-chunk gathers. This backend keeps ALL math dense and gets
its speedup from *chunk-level* culling instead:

  * primitives are morton-ordered and chopped into C equal clusters
    (host-side, like the BVH build); each cluster has an AABB;
  * per ray-chunk, a cheap [R x C] slab battery marks clusters any ray
    could hit before its current tfar;
  * a `lax.scan` over clusters runs the [R x P/C] primitive battery under
    `lax.cond` — clusters no ray touches are SKIPPED at runtime (cond
    executes one branch), so the work scales with the number of *touched*
    clusters, not total primitives.

Ray chunks are screen/origin-coherent, so primary and shadow chunks touch a
small fraction of clusters; fully incoherent chunks degrade gracefully to
~brute-force cost plus the (cheap) cull pass. Clusters are visited in
near-to-far order of slab-entry distance averaged over the chunk, so tfar
tightens early and later clusters cull harder.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.vec import Vec3

FLT_MAX = 3.4028235e38


def _pytree_dataclass(cls, meta=()):
    cls = dataclasses.dataclass(cls)
    fields = [f.name for f in dataclasses.fields(cls) if f.name not in meta]
    jax.tree_util.register_dataclass(cls, data_fields=fields, meta_fields=list(meta))
    return cls


@lambda cls: _pytree_dataclass(cls, meta=("num_clusters", "cluster_size", "kind"))
class ClusteredPrims:
    """Morton-clustered primitive arrays (padded to C * K)."""

    rows: jnp.ndarray  # [C*K, F] packed prim rows (sphere: 4, triangle: 9)
    order: jnp.ndarray  # [C*K] int32 original prim id (-1 = padding)
    lo: Vec3  # [C] cluster AABB min
    hi: Vec3  # [C] cluster AABB max
    # [C*K, 12] Baldwin-Weber plane attributes, precomputed ONCE in numpy at
    # build time (triangles only; None for spheres). Storing the planes makes
    # every downstream table layout (per-attr [C, K] planes, row-packed
    # [C*F8, K] streaming tables) a pure bit-preserving reshape, so the
    # resident and streaming Pallas traversal paths consume identical bits.
    # Computing them traced instead lets XLA contract the FMAs differently
    # per program/layout, which produced real ULP-level hit mismatches
    # between the stream and resident kernels on hardware.
    planes: jnp.ndarray = None
    # Optional per-row SAH-leaf GROUP boxes ([2, C] per component): rows
    # built with build_clusters_sah(group_boxes=True) hold up to two packed
    # leaves; glo/ghi[0] bounds the first, glo/ghi[1] the second (a copy of
    # the first for single-leaf rows). The Pallas planner's plan='group'
    # mode culls against these tight leaf boxes instead of the row union —
    # high fill WITHOUT the union-box looseness that measured the plain
    # fill-packing negative (benchmarks/sim_fill_pack.py).
    glo: Vec3 = None
    ghi: Vec3 = None
    num_clusters: int = 0
    cluster_size: int = 0
    kind: str = "sphere"


def _bw_planes_np(packed: np.ndarray) -> np.ndarray:
    """[C*K, 9] packed (v0, e1, e2) triangle rows -> [C*K, 12] Baldwin-Weber
    plane attributes (n.xyz, d0, f1.xyz, g1, f2.xyz, g2), computed in numpy
    float32 so the stored bits are the single canonical precompute (see
    ClusteredPrims.planes). u(x) = f1.x + g1 with u(v0+e1)=1, u(v0+e2)=0 and
    symmetrically for v. Degenerate / padding rows give n = 0, which the
    battery's |den| mask rejects."""
    r = packed.astype(np.float32)
    v0, e1, e2 = r[:, 0:3], r[:, 3:6], r[:, 6:9]
    n = np.cross(e1, e2).astype(np.float32)
    nn = np.sum(n * n, axis=-1, dtype=np.float32)
    inv = np.where(nn > 0.0,
                   np.float32(1.0) / np.maximum(nn, np.float32(1e-38)),
                   np.float32(0.0)).astype(np.float32)[:, None]
    f1 = (np.cross(e2, n).astype(np.float32) * inv).astype(np.float32)
    f2 = (-np.cross(e1, n).astype(np.float32) * inv).astype(np.float32)
    d0 = np.sum(n * v0, axis=-1, dtype=np.float32)
    g1 = -np.sum(f1 * v0, axis=-1, dtype=np.float32)
    g2 = -np.sum(f2 * v0, axis=-1, dtype=np.float32)
    return np.concatenate(
        [n, d0[:, None], f1, g1[:, None], f2, g2[:, None]], axis=1
    ).astype(np.float32)


def _norm_k(k: int) -> int:
    """Normalize a cluster size: sub-128 sizes round up to the next power
    of two so they divide the 128-lane vreg width — the Pallas traversal
    kernels lane-pack 128/K sub-128 clusters per battery and need
    K * pack == 128 exactly. Sizes >= 128 round up to a multiple of 128 so
    every battery is a whole number of full-width lanes; Mosaic rejects the
    streaming kernel's [F8, K] DMA blocks at fractional lane widths (a
    derived K=254 from build_clusters(P=20000, C=79) failed to compile)."""
    if k >= 128:
        return -(-k // 128) * 128
    return 1 << max(0, (k - 1)).bit_length()


def build_clusters_sah(
    mins: np.ndarray,
    maxs: np.ndarray,
    rows: np.ndarray,
    cluster_size: int = 128,
    kind: str = "sphere",
    fill_window: int = 1,
    group_boxes: bool = False,
) -> ClusteredPrims:
    """SAH-cut clustering: build a binned-SAH BVH with
    leaf_size=cluster_size (leaves are then MAXIMAL subtrees holding <=
    cluster_size prims) and emit each leaf as one cluster, padded to
    cluster_size. Versus the morton chop (build_clusters), cluster AABBs
    follow the surface partition the SAH actually optimizes — the straddler
    prims that inflate fixed morton chunk bounds land in their own tight
    boxes — at the price of partial fill (padded lanes are degenerate
    never-hit prims). Consecutive DFS leaves (usually siblings) are greedily
    re-merged while their union stays within cluster_size, recovering fill
    without giving up much tightness. Same ClusteredPrims contract as
    build_clusters: packed [C*K] rows, original-id `order` (-1 padding),
    per-cluster AABBs.

    `fill_window` > 1 upgrades the adjacent re-merge to windowed first-fit
    packing: up to `fill_window` partially-filled groups stay open, and
    each tree-order leaf joins the first open group it fits in (closing
    the oldest group when none fits and the window is full). Leaves a few
    apart in tree order are still spatially local, so the union boxes stay
    tight while fill rises — the battery-volume lever for the
    walk-dominated mesh configs (ROADMAP round-5 note): at fill f, 1-f of
    every visited row's lanes test padding, not prims. fill_window=1
    reproduces the historical adjacent-merge behavior (up to one corner:
    chopped identical-centroid runs no longer absorb the following small
    leaf — they are closed immediately).

    `group_boxes=True` caps packing at TWO leaves per row and records each
    row's constituent leaf AABBs in ClusteredPrims.glo/ghi so the Pallas
    planner's plan='group' mode culls per LEAF inside packed rows (tight
    boxes AND high fill — the design the plain fill-packing negative left
    open, ROADMAP round-5 note)."""
    from ..bvh import builder as _bvh
    from ..utils import native as _native

    mins32 = np.asarray(mins, np.float32)
    maxs32 = np.asarray(maxs, np.float32)
    p = mins32.shape[0]
    k = _norm_k(int(min(cluster_size, max(1, p))))
    # native full-sweep SAH (native/bvh_builder.cpp, same algorithm family
    # as the reference's BVH.hpp:90-206 build) — ~100x faster than the numpy
    # binned fallback at 100k prims (51 s -> sub-second)
    res = _native.bvh_build(mins32, maxs32, leaf_size=k)
    if res is None:
        res = _bvh._build_numpy(mins32, maxs32, leaf_size=k)
    node_min, node_max, first, count, order = res
    leaf_ids = np.where(count > 0)[0]
    # in-order sequence: leaves tile the reordered prim range contiguously,
    # so sorting by prim-range start makes consecutive leaves tree-adjacent
    # (usually siblings) — the right pairs to consider re-merging
    leaf_ids = leaf_ids[np.argsort(first[leaf_ids], kind="stable")]
    groups = []  # closed groups, (ids, lo, hi, leaf_boxes)
    open_groups = []  # windowed first-fit: insertion-ordered open groups
    w = max(1, int(fill_window))
    max_leaves = 2 if group_boxes else None
    for nid in leaf_ids:
        b, m = int(first[nid]), int(count[nid])
        # the native builder terminates un-splittable runs (identical
        # centroids) as leaves of up to 8*leaf_size prims; chop those into
        # k-sized clusters sharing the leaf AABB
        if m > k:
            for b2 in range(b, b + m, k):
                m2 = min(k, b + m - b2)
                ids = order[b2 : b2 + m2].astype(np.int64)
                sl = mins32[ids]
                sh = maxs32[ids]
                blo, bhi = sl.min(axis=0), sh.max(axis=0)
                groups.append((ids, blo, bhi, [(blo, bhi)]))
            continue
        ids = order[b : b + m].astype(np.int64)
        lo, hi = node_min[nid].copy(), node_max[nid].copy()
        for gi, (pids, plo, phi, pboxes) in enumerate(open_groups):
            if pids.size + m <= k and (
                max_leaves is None or len(pboxes) < max_leaves
            ):
                merged = (
                    np.concatenate([pids, ids]),
                    np.minimum(plo, lo),
                    np.maximum(phi, hi),
                    pboxes + [(lo, hi)],
                )
                # a group that can take no further leaf (at exactly k prims,
                # or at the group-box leaf cap) stops occupying a window slot
                if merged[0].size == k or (
                    max_leaves is not None and len(merged[3]) >= max_leaves
                ):
                    groups.append(merged)
                    open_groups.pop(gi)
                else:
                    open_groups[gi] = merged
                break
        else:
            if m == k:
                groups.append((ids, lo, hi, [(lo, hi)]))
            else:
                open_groups.append((ids, lo, hi, [(lo, hi)]))
            if len(open_groups) > w:  # close the oldest (most distant in
                groups.append(open_groups.pop(0))  # tree order) group
    groups.extend(open_groups)
    num_clusters = len(groups)
    full_order = np.full(num_clusters * k, -1, np.int64)
    c_lo = np.empty((num_clusters, 3), np.float32)
    c_hi = np.empty((num_clusters, 3), np.float32)
    g_lo = np.empty((2, num_clusters, 3), np.float32) if group_boxes else None
    g_hi = np.empty((2, num_clusters, 3), np.float32) if group_boxes else None
    for c, (ids, lo, hi, boxes) in enumerate(groups):
        full_order[c * k : c * k + ids.size] = ids
        c_lo[c], c_hi[c] = lo, hi
        if group_boxes:
            g_lo[0, c], g_hi[0, c] = boxes[0]
            g_lo[1, c], g_hi[1, c] = boxes[-1]  # [-1]==boxes[0] when single
    pad_row = np.zeros(rows.shape[1], np.float32)
    pad_row[0] = 1e16
    all_rows = np.vstack([rows.astype(np.float32), pad_row[None, :]])
    packed = all_rows[np.where(full_order >= 0, full_order, p)]
    return ClusteredPrims(
        rows=jnp.asarray(packed),
        order=jnp.asarray(full_order.astype(np.int32)),
        planes=(jnp.asarray(_bw_planes_np(packed))
                if kind == "triangle" else None),
        lo=Vec3(*[jnp.asarray(c_lo[:, i]) for i in range(3)]),
        hi=Vec3(*[jnp.asarray(c_hi[:, i]) for i in range(3)]),
        glo=(Vec3(*[jnp.asarray(g_lo[:, :, i]) for i in range(3)])
             if group_boxes else None),
        ghi=(Vec3(*[jnp.asarray(g_hi[:, :, i]) for i in range(3)])
             if group_boxes else None),
        num_clusters=num_clusters,
        cluster_size=k,
        kind=kind,
    )


def _morton3(x, y, z):
    def spread(v):
        v = v.astype(np.uint64) & 0x1FFFFF
        v = (v | (v << 32)) & 0x1F00000000FFFF
        v = (v | (v << 16)) & 0x1F0000FF0000FF
        v = (v | (v << 8)) & 0x100F00F00F00F00F
        v = (v | (v << 4)) & 0x10C30C30C30C30C3
        v = (v | (v << 2)) & 0x1249249249249249
        return v

    return spread(x) | (spread(y) << 1) | (spread(z) << 2)


def build_clusters(
    mins: np.ndarray,
    maxs: np.ndarray,
    rows: np.ndarray,
    num_clusters: int = 64,
    kind: str = "sphere",
) -> ClusteredPrims:
    """Host-side clustering: morton-sort prim centroids, chop into
    `num_clusters` contiguous runs, pad to equal size. `rows` is the packed
    per-prim test data ([P,4] spheres / [P,9] triangles)."""
    mins = np.asarray(mins, np.float64)
    maxs = np.asarray(maxs, np.float64)
    p = mins.shape[0]
    num_clusters = max(1, min(num_clusters, p))
    cent = 0.5 * (mins + maxs)
    lo = cent.min(axis=0)
    span = np.maximum(cent.max(axis=0) - lo, 1e-12)
    q = ((cent - lo) / span * ((1 << 21) - 1)).astype(np.uint64)
    order = np.argsort(_morton3(q[:, 0], q[:, 1], q[:, 2]), kind="stable")

    k = _norm_k(-(-p // num_clusters))
    padded = num_clusters * k
    full_order = np.full(padded, -1, np.int64)
    full_order[:p] = order
    # padding rows: far-away degenerate prims that can never hit
    pad_row = np.zeros(rows.shape[1], np.float32)
    pad_row[0] = 1e16
    all_rows = np.vstack([rows.astype(np.float32), pad_row[None, :]])
    packed = all_rows[np.where(full_order >= 0, full_order, p)]

    c_lo = np.empty((num_clusters, 3), np.float32)
    c_hi = np.empty((num_clusters, 3), np.float32)
    for c in range(num_clusters):
        ids = full_order[c * k : (c + 1) * k]
        ids = ids[ids >= 0]
        if ids.size:
            c_lo[c] = mins[ids].min(axis=0)
            c_hi[c] = maxs[ids].max(axis=0)
        else:
            c_lo[c] = 1e16
            c_hi[c] = 1e16
    return ClusteredPrims(
        rows=jnp.asarray(packed),
        order=jnp.asarray(full_order.astype(np.int32)),
        planes=(jnp.asarray(_bw_planes_np(packed))
                if kind == "triangle" else None),
        lo=Vec3(*[jnp.asarray(c_lo[:, i]) for i in range(3)]),
        hi=Vec3(*[jnp.asarray(c_hi[:, i]) for i in range(3)]),
        num_clusters=num_clusters,
        cluster_size=k,
        kind=kind,
    )


def _cluster_cull(cp: ClusteredPrims, p: Vec3, d: Vec3, tfar):
    """[C] any-ray-hits mask + chunk-mean entry distance per cluster."""
    inv = Vec3(1.0 / d.x, 1.0 / d.y, 1.0 / d.z)
    # [R, C] slab test
    lox = (cp.lo.x[None, :] - p.x[:, None]) * inv.x[:, None]
    hix = (cp.hi.x[None, :] - p.x[:, None]) * inv.x[:, None]
    tmin = jnp.minimum(lox, hix)
    tmax = jnp.maximum(lox, hix)
    loy = (cp.lo.y[None, :] - p.y[:, None]) * inv.y[:, None]
    hiy = (cp.hi.y[None, :] - p.y[:, None]) * inv.y[:, None]
    tmin = jnp.maximum(tmin, jnp.minimum(loy, hiy))
    tmax = jnp.minimum(tmax, jnp.maximum(loy, hiy))
    loz = (cp.lo.z[None, :] - p.z[:, None]) * inv.z[:, None]
    hiz = (cp.hi.z[None, :] - p.z[:, None]) * inv.z[:, None]
    tmin = jnp.maximum(tmin, jnp.minimum(loz, hiz))
    tmax = jnp.minimum(tmax, jnp.maximum(loz, hiz))
    hit = (tmax >= jnp.maximum(tmin, 0.0)) & (tmin < tfar[:, None])
    any_hit = jnp.any(hit, axis=0)
    entry = jnp.where(hit, jnp.maximum(tmin, 0.0), FLT_MAX)
    mean_entry = jnp.min(entry, axis=0)  # nearest entry over the chunk
    return any_hit, mean_entry


def _cluster_candidates(rows: jnp.ndarray, kind: str, p: Vec3, d: Vec3):
    """Dense [R, K] candidate distances for one cluster's packed rows."""
    from . import intersect as _i

    if kind == "sphere":
        center = Vec3(rows[:, 0], rows[:, 1], rows[:, 2])
        return _i._sphere_candidates(p, d, center.x, center.y, center.z, rows[:, 3])
    v0 = Vec3(rows[:, 0], rows[:, 1], rows[:, 2])
    e1 = Vec3(rows[:, 3], rows[:, 4], rows[:, 5])
    e2 = Vec3(rows[:, 6], rows[:, 7], rows[:, 8])
    return _i._triangle_candidates(p, d, v0, e1, e2)


def intersect_clustered(
    cp: ClusteredPrims,
    p: Vec3,
    d: Vec3,
    tfar0=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Closest hit over the clustered primitives. Returns (tfar, prim_id in
    ORIGINAL primitive numbering, -1 = miss). Each touched cluster runs the
    same dense [R, K] battery as the brute backend; untouched clusters are
    skipped by lax.cond at runtime."""
    num_rays = p.x.shape[0]
    tfar = jnp.full((num_rays,), FLT_MAX) if tfar0 is None else tfar0
    prim_id = jnp.full((num_rays,), -1, jnp.int32)
    any_hit, entry = _cluster_cull(cp, p, d, tfar)
    # visit near clusters first so tfar tightens and later clusters cull
    visit = jnp.argsort(entry)
    k = cp.cluster_size
    kind = cp.kind

    def body(carry, c):
        tfar, prim_id = carry

        def run(args):
            tfar, prim_id = args
            base = c * k
            rows = jax.lax.dynamic_slice_in_dim(cp.rows, base, k, axis=0)
            ids = jax.lax.dynamic_slice_in_dim(cp.order, base, k, axis=0)
            t = _cluster_candidates(rows, kind, p, d)  # [R, K]
            t = jnp.where(ids[None, :] >= 0, t, FLT_MAX)
            best = jnp.min(t, axis=1)
            arg = jnp.argmin(t, axis=1)
            closer = best < tfar
            return (
                jnp.where(closer, best, tfar),
                jnp.where(closer, ids[arg], prim_id),
            )

        tfar, prim_id = jax.lax.cond(
            any_hit[c], run, lambda a: a, (tfar, prim_id)
        )
        return (tfar, prim_id), None

    (tfar, prim_id), _ = jax.lax.scan(body, (tfar, prim_id), visit)
    return tfar, prim_id


def occluded_clustered(
    cp: ClusteredPrims,
    p: Vec3,
    d: Vec3,
    tfar: jnp.ndarray,
) -> jnp.ndarray:
    """Any-hit: clusters skipped when untouched OR once every ray is
    occluded."""
    num_rays = p.x.shape[0]
    occluded = jnp.zeros((num_rays,), bool)
    any_hit, entry = _cluster_cull(cp, p, d, tfar)
    visit = jnp.argsort(entry)
    k = cp.cluster_size
    kind = cp.kind

    def body(carry, c):
        occluded = carry

        def run(occluded):
            base = c * k
            rows = jax.lax.dynamic_slice_in_dim(cp.rows, base, k, axis=0)
            ids = jax.lax.dynamic_slice_in_dim(cp.order, base, k, axis=0)
            t = _cluster_candidates(rows, kind, p, d)
            t = jnp.where(ids[None, :] >= 0, t, FLT_MAX)
            return occluded | jnp.any(t < tfar[:, None], axis=1)

        occluded = jax.lax.cond(
            any_hit[c] & ~jnp.all(occluded), run, lambda o: o, occluded
        )
        return occluded, None

    occluded, _ = jax.lax.scan(body, occluded, visit)
    return occluded
