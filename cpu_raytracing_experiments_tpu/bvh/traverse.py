"""Stackless threaded-BVH traversal on device.

TPU-native replacement for the reference's per-stream stack traversal
(/root/reference/BVH.hpp:307-404). Data-dependent stacks are hostile to XLA,
so the tree is *threaded* host-side (builder.compute_miss_links): every ray
carries a single node cursor and steps

    cursor <- hit & inner ? first_child : miss_link

in a lockstep ``lax.while_loop``; leaf visits test up to ``max_leaf`` prims
with masked gathers. Per-ray slab coefficients m = 1/dir, n = p/dir are
precomputed exactly as the reference's AABB_acceleration_struct
(BVH.hpp:326-333); the slab test (tmin clamp 1e-4, tmax vs current tfar)
matches test_AABB (BVH.hpp:220-234).

Rays finish independently (cursor -1) and the loop exits when all are done —
the wavefront analog of the reference's per-tile early termination.
"""
from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from ..core.vec import Vec3
from .builder import BVHArrays

FLT_MAX = jnp.float32(3.4028235e38)


def _slab_test(bvh: BVHArrays, node, m: Vec3, n: Vec3, tfar):
    """Reference test_AABB (BVH.hpp:220-234) with per-ray precomputed
    m = 1/dir, n = p/dir."""
    lo = bvh.node_min.x[node] * m.x - n.x
    hi = bvh.node_max.x[node] * m.x - n.x
    tmin = jnp.maximum(1e-4, jnp.minimum(lo, hi))
    tmax = jnp.minimum(tfar, jnp.maximum(lo, hi))
    lo = bvh.node_min.y[node] * m.y - n.y
    hi = bvh.node_max.y[node] * m.y - n.y
    tmin = jnp.maximum(tmin, jnp.minimum(lo, hi))
    tmax = jnp.minimum(tmax, jnp.maximum(lo, hi))
    lo = bvh.node_min.z[node] * m.z - n.z
    hi = bvh.node_max.z[node] * m.z - n.z
    tmin = jnp.maximum(tmin, jnp.minimum(lo, hi))
    tmax = jnp.minimum(tmax, jnp.maximum(lo, hi))
    return tmax >= tmin


def _ray_coeffs(p: Vec3, d: Vec3):
    # 1/dir can be inf for axis-aligned rays; inf*0-style NaNs fall out of
    # min/max the same way the reference's AVX path handles them.
    m = Vec3(1.0 / d.x, 1.0 / d.y, 1.0 / d.z)
    n = Vec3(p.x * m.x, p.y * m.y, p.z * m.z)
    return m, n


def traverse_closest(
    bvh: BVHArrays,
    p: Vec3,
    d: Vec3,
    leaf_test: Callable,
    tfar0=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Closest-hit traversal.

    leaf_test(prim_idx [R] int32, p, d, tfar [R]) -> (t [R], valid [R]):
    intersection distance for one primitive per ray, masked by `valid`.
    Returns (tfar [R], prim_id [R] with -1 for miss).
    """
    num_rays = p.x.shape[0]
    m, n = _ray_coeffs(p, d)
    tfar = jnp.full((num_rays,), FLT_MAX) if tfar0 is None else tfar0
    prim_id = jnp.full((num_rays,), -1, jnp.int32)
    cursor = jnp.zeros((num_rays,), jnp.int32)

    def cond(state):
        cursor, _, _ = state
        return jnp.any(cursor >= 0)

    def body(state):
        cursor, tfar, prim_id = state
        active = cursor >= 0
        node = jnp.maximum(cursor, 0)
        first = bvh.first[node]
        count = bvh.count[node]
        hit = _slab_test(bvh, node, m, n, tfar) & active
        is_leaf = count > 0
        # leaf: test up to max_leaf prims (masked)
        leaf_hit = hit & is_leaf
        for s in range(bvh.max_leaf):
            prim = first + s
            valid = leaf_hit & (s < count)
            t, ok = leaf_test(jnp.where(valid, prim, 0), p, d, tfar)
            closer = valid & ok & (t < tfar)
            tfar = jnp.where(closer, t, tfar)
            prim_id = jnp.where(closer, prim, prim_id)
        descend = hit & ~is_leaf
        nxt = jnp.where(descend, first, bvh.miss[node])
        cursor = jnp.where(active, nxt, cursor)
        return cursor, tfar, prim_id

    _, tfar, prim_id = jax.lax.while_loop(
        cond, body, (cursor, tfar, prim_id)
    )
    return tfar, prim_id


def traverse_shadow(
    bvh: BVHArrays,
    p: Vec3,
    d: Vec3,
    tfar: jnp.ndarray,
    leaf_test: Callable,
) -> jnp.ndarray:
    """Any-hit traversal (BVH.hpp:362-404 semantics): returns occluded [R].
    Rays stop traversing on their first hit."""
    num_rays = p.x.shape[0]
    m, n = _ray_coeffs(p, d)
    cursor = jnp.zeros((num_rays,), jnp.int32)
    # rays with tfar <= 0 are disabled shadow queries
    cursor = jnp.where(tfar > 0.0, cursor, -1)
    occluded = jnp.zeros((num_rays,), bool)

    def cond(state):
        cursor, _ = state
        return jnp.any(cursor >= 0)

    def body(state):
        cursor, occluded = state
        active = cursor >= 0
        node = jnp.maximum(cursor, 0)
        first = bvh.first[node]
        count = bvh.count[node]
        hit = _slab_test(bvh, node, m, n, tfar) & active
        is_leaf = count > 0
        leaf_hit = hit & is_leaf
        found = jnp.zeros_like(occluded)
        for s in range(bvh.max_leaf):
            prim = first + s
            valid = leaf_hit & (s < count)
            t, ok = leaf_test(jnp.where(valid, prim, 0), p, d, tfar)
            found = found | (valid & ok & (t < tfar) & (t >= 0.0))
        occluded = occluded | found
        descend = hit & ~is_leaf
        nxt = jnp.where(descend, first, bvh.miss[node])
        cursor = jnp.where(active & ~occluded, nxt, -1)
        return cursor, occluded

    _, occluded = jax.lax.while_loop(cond, body, (cursor, occluded))
    return occluded


# ---------------------------------------------------------------------------
# Leaf primitive tests (gather one prim per ray)
# ---------------------------------------------------------------------------
def sphere_leaf_test(center: Vec3, radius_sq: jnp.ndarray):
    """Reference root-selection semantics (BVH.hpp:270-287), one gathered
    sphere per ray."""

    def test(prim, p: Vec3, d: Vec3, tfar):
        cx = center.x[prim]
        cy = center.y[prim]
        cz = center.z[prim]
        rsq = radius_sq[prim]
        tx = cx - p.x
        ty = cy - p.y
        tz = cz - p.z
        b = d.x * tx + d.y * ty + d.z * tz
        disc = rsq - (tx * tx + ty * ty + tz * tz) + b * b
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        t_near = b - sq
        t = jnp.where(t_near < 0.0, b + sq, t_near)
        return t, (disc >= 0.0) & (t >= 0.0)

    return test


def triangle_leaf_test(v0: Vec3, e1: Vec3, e2: Vec3):
    """Moller-Trumbore, one gathered triangle per ray."""

    def test(prim, p: Vec3, d: Vec3, tfar):
        a0 = v0.gather(prim)
        ae1 = e1.gather(prim)
        ae2 = e2.gather(prim)
        h = d.cross(ae2)
        det = ae1.dot(h)
        inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
        s = p - a0
        u = s.dot(h) * inv_det
        q = s.cross(ae1)
        v = d.dot(q) * inv_det
        t = ae2.dot(q) * inv_det
        ok = (
            (jnp.abs(det) > 1e-12)
            & (u >= 0.0)
            & (v >= 0.0)
            & (u + v <= 1.0)
            & (t > 1e-6)
        )
        return t, ok

    return test


# ---------------------------------------------------------------------------
# Packed-row traversal: one [8]-float row gather per step instead of nine
# scalar gathers. Node row layout: [min.x, min.y, min.z, max.x, max.y,
# max.z, bitcast(first | leaf_flag via count), bitcast(miss)] — `count` is
# packed into the high bits of slot 6 (first < 2^27 nodes, count < 32).
# ---------------------------------------------------------------------------
def pack_nodes(bvh: BVHArrays) -> jnp.ndarray:
    """[N, 8] f32 node table for row-gather traversal."""
    fc = (bvh.first.astype(jnp.uint32) | (bvh.count.astype(jnp.uint32) << 27)).astype(
        jnp.uint32
    )
    fc_f = jax.lax.bitcast_convert_type(fc, jnp.float32)
    miss_f = jax.lax.bitcast_convert_type(bvh.miss.astype(jnp.int32), jnp.float32)
    return jnp.stack(
        [
            bvh.node_min.x, bvh.node_min.y, bvh.node_min.z,
            bvh.node_max.x, bvh.node_max.y, bvh.node_max.z,
            fc_f, miss_f,
        ],
        axis=1,
    )


def _unpack_row(rows):
    """rows: [R, 8] gathered node rows -> slab bounds + first/count/miss."""
    fc = jax.lax.bitcast_convert_type(rows[:, 6], jnp.uint32)
    first = (fc & jnp.uint32((1 << 27) - 1)).astype(jnp.int32)
    count = (fc >> jnp.uint32(27)).astype(jnp.int32)
    miss = jax.lax.bitcast_convert_type(rows[:, 7], jnp.int32)
    return rows[:, 0], rows[:, 1], rows[:, 2], rows[:, 3], rows[:, 4], rows[:, 5], first, count, miss


def _slab_from_row(mnx, mny, mnz, mxx, mxy, mxz, m: Vec3, n: Vec3, tfar):
    lo = mnx * m.x - n.x
    hi = mxx * m.x - n.x
    tmin = jnp.maximum(1e-4, jnp.minimum(lo, hi))
    tmax = jnp.minimum(tfar, jnp.maximum(lo, hi))
    lo = mny * m.y - n.y
    hi = mxy * m.y - n.y
    tmin = jnp.maximum(tmin, jnp.minimum(lo, hi))
    tmax = jnp.minimum(tmax, jnp.maximum(lo, hi))
    lo = mnz * m.z - n.z
    hi = mxz * m.z - n.z
    tmin = jnp.maximum(tmin, jnp.minimum(lo, hi))
    tmax = jnp.minimum(tmax, jnp.maximum(lo, hi))
    return tmax >= tmin


def traverse_closest_packed(
    bvh: BVHArrays,
    p: Vec3,
    d: Vec3,
    leaf_rows: jnp.ndarray,
    leaf_row_test: Callable,
    tfar0=None,
    with_stats: bool = False,
):
    """Closest-hit with packed node + leaf rows.

    leaf_rows: [P, K] primitive table; leaf_row_test(rows [R, K], p, d) ->
    (t [R], valid [R]). With with_stats, also returns the lockstep step
    count (= worst-ray nodes visited — the quantity that gates wall time).
    """
    num_rays = p.x.shape[0]
    nodes = pack_nodes(bvh)
    m, n = _ray_coeffs(p, d)
    tfar = jnp.full((num_rays,), FLT_MAX) if tfar0 is None else tfar0
    prim_id = jnp.full((num_rays,), -1, jnp.int32)
    cursor = jnp.zeros((num_rays,), jnp.int32)
    steps = jnp.int32(0)

    def cond(state):
        return jnp.any(state[0] >= 0)

    def body(state):
        cursor, tfar, prim_id, steps = state
        active = cursor >= 0
        rows = nodes[jnp.maximum(cursor, 0)]
        mnx, mny, mnz, mxx, mxy, mxz, first, count, miss = _unpack_row(rows)
        hit = _slab_from_row(mnx, mny, mnz, mxx, mxy, mxz, m, n, tfar) & active
        is_leaf = count > 0
        leaf_hit = hit & is_leaf
        for s in range(bvh.max_leaf):
            prim = first + s
            valid = leaf_hit & (s < count)
            prow = leaf_rows[jnp.where(valid, prim, 0)]
            t, ok = leaf_row_test(prow, p, d)
            closer = valid & ok & (t < tfar)
            tfar = jnp.where(closer, t, tfar)
            prim_id = jnp.where(closer, prim, prim_id)
        descend = hit & ~is_leaf
        nxt = jnp.where(descend, first, miss)
        cursor = jnp.where(active, nxt, cursor)
        return cursor, tfar, prim_id, steps + 1

    _, tfar, prim_id, steps = jax.lax.while_loop(
        cond, body, (cursor, tfar, prim_id, steps)
    )
    if with_stats:
        return tfar, prim_id, steps
    return tfar, prim_id


def traverse_shadow_packed(
    bvh: BVHArrays,
    p: Vec3,
    d: Vec3,
    tfar: jnp.ndarray,
    leaf_rows: jnp.ndarray,
    leaf_row_test: Callable,
) -> jnp.ndarray:
    num_rays = p.x.shape[0]
    nodes = pack_nodes(bvh)
    m, n = _ray_coeffs(p, d)
    cursor = jnp.where(tfar > 0.0, jnp.zeros((num_rays,), jnp.int32), -1)
    occluded = jnp.zeros((num_rays,), bool)

    def cond(state):
        return jnp.any(state[0] >= 0)

    def body(state):
        cursor, occluded = state
        active = cursor >= 0
        rows = nodes[jnp.maximum(cursor, 0)]
        mnx, mny, mnz, mxx, mxy, mxz, first, count, miss = _unpack_row(rows)
        hit = _slab_from_row(mnx, mny, mnz, mxx, mxy, mxz, m, n, tfar) & active
        is_leaf = count > 0
        leaf_hit = hit & is_leaf
        found = jnp.zeros_like(occluded)
        for s in range(bvh.max_leaf):
            prim = first + s
            valid = leaf_hit & (s < count)
            prow = leaf_rows[jnp.where(valid, prim, 0)]
            t, ok = leaf_row_test(prow, p, d)
            found = found | (valid & ok & (t < tfar) & (t >= 0.0))
        occluded = occluded | found
        descend = hit & ~is_leaf
        nxt = jnp.where(descend, first, miss)
        cursor = jnp.where(active & ~occluded, nxt, -1)
        return cursor, occluded

    _, occluded = jax.lax.while_loop(cond, body, (cursor, occluded))
    return occluded


def pack_spheres(center: Vec3, radius_sq: jnp.ndarray) -> jnp.ndarray:
    """[P, 4] rows: cx, cy, cz, r^2."""
    return jnp.stack([center.x, center.y, center.z, radius_sq], axis=1)


def sphere_row_test(rows, p: Vec3, d: Vec3):
    tx = rows[:, 0] - p.x
    ty = rows[:, 1] - p.y
    tz = rows[:, 2] - p.z
    b = d.x * tx + d.y * ty + d.z * tz
    disc = rows[:, 3] - (tx * tx + ty * ty + tz * tz) + b * b
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t_near = b - sq
    t = jnp.where(t_near < 0.0, b + sq, t_near)
    return t, (disc >= 0.0) & (t >= 0.0)


def pack_triangles(v0: Vec3, e1: Vec3, e2: Vec3) -> jnp.ndarray:
    """[T, 9] rows: v0, e1, e2."""
    return jnp.stack(
        [v0.x, v0.y, v0.z, e1.x, e1.y, e1.z, e2.x, e2.y, e2.z], axis=1
    )


def triangle_row_test(rows, p: Vec3, d: Vec3):
    v0 = Vec3(rows[:, 0], rows[:, 1], rows[:, 2])
    e1 = Vec3(rows[:, 3], rows[:, 4], rows[:, 5])
    e2 = Vec3(rows[:, 6], rows[:, 7], rows[:, 8])
    h = d.cross(e2)
    det = e1.dot(h)
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
    s = p - v0
    u = s.dot(h) * inv_det
    q = s.cross(e1)
    v = d.dot(q) * inv_det
    t = e2.dot(q) * inv_det
    ok = (
        (jnp.abs(det) > 1e-12)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > 1e-6)
    )
    return t, ok
