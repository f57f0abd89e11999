"""Pure-numpy simulator of the traversal kernels' visit/early-exit
SCHEDULE (VERDICT round-3 item 9 / ROADMAP item 4).

Why this exists: the Pallas interpreter's while_loop cond reads STALE SMEM
— scratch writes in the body never reach cond — so the traversal kernels'
early exit NEVER FIRES in interpret mode, and the trickiest scheduling
logic (the every-8th-visit stale-bound refresh, the fused-trip gating, the
sort=False suffix-min exit soundness) was gated only by
benchmarks/tpu_goldens.py on real hardware. This module re-implements the
kernels' decision semantics (traverse_kernel.py _make_closest_kernel /
_make_shadow_kernel, compiled-Mosaic behavior) in float32 numpy so they
are unit-testable off-hardware, including the spike-dip adversarial case.

Semantics mirrored exactly (per the kernel source):
* per tile: bound = min(tfar0, root_exit); mx starts at the max live
  bound; the while cond is `j < n and entry[j] < mx` with mx read FRESH
  (what compiled Mosaic does; what interpret mode gets wrong);
* serial unroll: extra visits within a trip are gated on the same
  (j+u < n) & (entry[j+u] < stale-trip mx) test;
* the bound refresh runs only when j % 8 == (8 - w) % 8 (w = visits per
  trip) — a STALE (larger) mx between refreshes keeps the exit
  conservative;
* closest: per-visit [TILE_R, K] battery, first-lane tie-break, packed
  prim id c*K + lane; fused trips concatenate visits' lanes so the
  (t, lane) lexicographic tie-break preserves visit-order-first;
* shadow: any-hit bits OR'd per trip; the refresh drops occluded lanes
  from the live bound (the exit fires when every lane is occluded or no
  remaining cluster is near enough to occlude a live one).

The simulator returns the visit counts actually executed, so tests can
assert the exit FIRED, not just that results match a full walk.
"""
from __future__ import annotations

import numpy as np

FLT_MAX = np.float32(3.4028235e38)


def _f32(a):
    return np.asarray(a, np.float32)


def sphere_battery(p, d, rows):
    """[R, K] candidate t per (ray, prim) — _sphere_battery semantics."""
    cx, cy, cz, rsq = (r[None, :] for r in rows)
    px, py, pz = (p[:, i:i + 1] for i in range(3))
    dx, dy, dz = (d[:, i:i + 1] for i in range(3))
    tx, ty, tz = cx - px, cy - py, cz - pz
    b = dx * tx + dy * ty + dz * tz
    disc = rsq - (tx * tx + ty * ty + tz * tz) + b * b
    sq = np.sqrt(np.maximum(disc, np.float32(0.0)))
    t_near = b - sq
    t = np.where(t_near < 0.0, b + sq, t_near)
    return np.where((disc >= 0.0) & (t >= 0.0), t, FLT_MAX).astype(np.float32)


def sphere_anyhit(p, d, tf, rows):
    """[R, K] occlusion bits — the sqrt-free any-hit predicate."""
    cx, cy, cz, rsq = (r[None, :] for r in rows)
    px, py, pz = (p[:, i:i + 1] for i in range(3))
    dx, dy, dz = (d[:, i:i + 1] for i in range(3))
    tfc = tf[:, None]
    tx, ty, tz = cx - px, cy - py, cz - pz
    b = dx * tx + dy * ty + dz * tz
    disc = rsq - (tx * tx + ty * ty + tz * tz) + b * b
    bb = b * b
    e = b - tfc
    q = e * e
    near_ge0 = (b >= 0.0) & (bb >= disc)
    hit_near = (e < 0.0) | (q < disc)
    far_ge0 = (b >= 0.0) | (bb <= disc)
    hit_far = (e < 0.0) & (disc < q)
    sel = (near_ge0 & hit_near) | (~near_ge0 & far_ge0 & hit_far)
    return (disc >= 0.0) & sel


def _bw_planes(blk):
    """Baldwin-Weber plane rows from packed triangle rows [K, 9]
    (v0|e1|e2) — the same math as traverse_kernel._tables' traced
    fallback, in float32 numpy. Returns the 12 per-prim attribute rows."""
    v0, e1, e2 = blk[:, 0:3], blk[:, 3:6], blk[:, 6:9]
    n = np.cross(e1, e2).astype(np.float32)
    nn = np.sum(n * n, axis=-1)
    inv = np.where(nn > 0.0, np.float32(1.0) / np.maximum(nn, 1e-38),
                   np.float32(0.0))[:, None]
    f1 = (np.cross(e2, n) * inv).astype(np.float32)
    f2 = (-np.cross(e1, n) * inv).astype(np.float32)
    d0 = np.sum(n * v0, axis=-1).astype(np.float32)
    g1 = (-np.sum(f1 * v0, axis=-1)).astype(np.float32)
    g2 = (-np.sum(f2 * v0, axis=-1)).astype(np.float32)
    return (n[:, 0], n[:, 1], n[:, 2], d0,
            f1[:, 0], f1[:, 1], f1[:, 2], g1,
            f2[:, 0], f2[:, 1], f2[:, 2], g2)


def triangle_battery(p, d, rows):
    """[R, K] candidate t — _triangle_battery (Baldwin-Weber) semantics."""
    (nx, ny, nz, d0, f1x, f1y, f1z, g1, f2x, f2y, f2z, g2) = (
        r[None, :] for r in rows
    )
    px, py, pz = (p[:, i:i + 1] for i in range(3))
    dx, dy, dz = (d[:, i:i + 1] for i in range(3))
    den = nx * dx + ny * dy + nz * dz
    num = d0 - (nx * px + ny * py + nz * pz)
    with np.errstate(divide="ignore", invalid="ignore"):
        t = (num / den).astype(np.float32)
    qx = px + t * dx
    qy = py + t * dy
    qz = pz + t * dz
    u = f1x * qx + f1y * qy + f1z * qz + g1
    v = f2x * qx + f2y * qy + f2z * qz + g2
    valid = (
        (np.abs(den) > 1e-12)
        & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) & (t > 1e-6)
    )
    return np.where(valid, t, FLT_MAX).astype(np.float32)


def triangle_anyhit(p, d, tf, rows):
    """[R, K] occlusion bits — _triangle_anyhit_battery semantics."""
    return triangle_battery(p, d, rows) < tf[:, None]


def root_exit_bound(p, d, root_lo, root_hi):
    """Per-ray exit distance of the root AABB (0 on total miss)."""
    inv = np.float32(1.0) / _f32(d)
    a = (_f32(root_lo)[None, :] - _f32(p)) * inv
    b = (_f32(root_hi)[None, :] - _f32(p)) * inv
    tmin = np.minimum(a, b).max(axis=1)
    tmax = np.maximum(a, b).min(axis=1)
    hit = tmax >= np.maximum(tmin, 0.0)
    return np.where(hit, tmax * np.float32(1.0 + 1e-5), np.float32(0.0))


def _cluster_rows(cp_rows, c, k, kind, planes=None):
    """Per-cluster attribute rows from the packed [C*K, F] table. For
    triangles, prefers the stored build-time Baldwin-Weber planes
    (ClusteredPrims.planes — the canonical bit pattern the resident and
    streaming kernels share) and falls back to recomputing them from the
    v0|e1|e2 rows exactly as traverse_kernel._tables does."""
    if kind == "sphere":
        blk = np.asarray(cp_rows, np.float32)[c * k:(c + 1) * k]
        return (blk[:, 0], blk[:, 1], blk[:, 2], blk[:, 3])
    if kind == "triangle":
        if planes is not None:
            pr = np.asarray(planes, np.float32)[c * k:(c + 1) * k]
            return tuple(pr[:, f] for f in range(12))
        blk = np.asarray(cp_rows, np.float32)[c * k:(c + 1) * k]
        return _bw_planes(blk)
    raise NotImplementedError(kind)


_SIM_BATTERIES = {"sphere": sphere_battery, "triangle": triangle_battery}
_SIM_ANYHIT = {"sphere": sphere_anyhit, "triangle": triangle_anyhit}


def simulate_closest(cp, p, d, tfar0=None, alive=None, tile_r=64,
                     visit=None, entry=None, nvis=None, w_trip=1, er=8):
    """Run the closest-hit schedule for precomputed per-tile visit lists.

    `visit`/`entry`/`nvis` come from traverse_kernel._plan_visits (which
    interpret mode computes correctly); `w_trip` = visits per while-loop
    trip (the kernel's unroll/fuse width — gates extra visits on the
    stale trip-entry test exactly as the kernel does); `er` = visits
    between bound refreshes (pallas_exit_refresh).

    Returns (tfar [R], prim [R] packed ids, visits_executed int).
    """
    p = np.stack([np.asarray(p.x), np.asarray(p.y), np.asarray(p.z)], 1)
    d = np.stack([np.asarray(d.x), np.asarray(d.y), np.asarray(d.z)], 1)
    p, d = _f32(p), _f32(d)
    r = p.shape[0]
    k = cp.cluster_size
    rows_tbl = np.asarray(cp.rows, np.float32)
    root_lo = np.array([np.asarray(v).min() for v in
                        (cp.lo.x, cp.lo.y, cp.lo.z)], np.float32)
    root_hi = np.array([np.asarray(v).max() for v in
                        (cp.hi.x, cp.hi.y, cp.hi.z)], np.float32)
    tf0 = (np.full(r, FLT_MAX, np.float32) if tfar0 is None
           else _f32(np.asarray(tfar0)))
    ok_all = (np.ones(r, bool) if alive is None else np.asarray(alive))
    visit = np.asarray(visit)
    entry = np.asarray(entry, np.float32)
    nvis = np.asarray(nvis)[:, 0]
    t_tiles = visit.shape[0]
    rp = t_tiles * tile_r

    def padded(a, val):
        out = np.full(rp, val, a.dtype)
        out[:r] = a
        return out

    tf_p = padded(tf0, np.float32(0.0))
    ok_p = padded(ok_all, False)
    p_p = np.full((rp, 3), 1e30, np.float32)
    p_p[:r] = p
    d_p = np.ones((rp, 3), np.float32)
    d_p[:r] = d

    tfar_out = tf_p.copy()
    prim_out = np.full(rp, -1, np.int32)
    visits_executed = 0

    for row in range(t_tiles):
        s = slice(row * tile_r, (row + 1) * tile_r)
        tp, td = p_p[s], d_p[s]
        tf_t, ok = tf_p[s], ok_p[s]
        rexit = root_exit_bound(tp, td, root_lo, root_hi)
        bound = np.minimum(tf_t, rexit)
        mx = np.where(ok, bound, -FLT_MAX).max() if tile_r else -FLT_MAX
        n = int(nvis[row])
        tfc = tf_t.copy()
        prc = np.full(tile_r, -1, np.int32)
        j = 0
        while j < n and entry[row, j] < mx:
            for u in range(w_trip):
                ju = j + u
                # extra visits share the trip: gated on the STALE mx
                if u > 0 and not (ju < n and entry[row, min(ju, n - 1)] < mx):
                    continue
                c = int(visit[row, ju])
                t = _SIM_BATTERIES[cp.kind](
                    tp, td,
                    _cluster_rows(rows_tbl, c, k, cp.kind,
                                  getattr(cp, "planes", None)),
                )
                visits_executed += 1
                best = t.min(axis=1)
                arg = t.argmin(axis=1)  # first occurrence, matches min-iota
                closer = (best < tfc) & ok
                tfc = np.where(closer, best, tfc).astype(np.float32)
                prc = np.where(closer, c * k + arg, prc).astype(np.int32)
            if j % er == (er - w_trip) % er:
                mx = np.where(ok, np.minimum(tfc, bound), -FLT_MAX).max()
            j += w_trip
        tfar_out[s] = tfc
        prim_out[s] = prc
    return tfar_out[:r], prim_out[:r], visits_executed


def simulate_shadow(cp, p, d, tfar, tile_r=64,
                    visit=None, entry=None, nvis=None, w_trip=1, er=8):
    """Any-hit schedule; returns (occluded [R] bool, visits_executed)."""
    p = np.stack([np.asarray(p.x), np.asarray(p.y), np.asarray(p.z)], 1)
    d = np.stack([np.asarray(d.x), np.asarray(d.y), np.asarray(d.z)], 1)
    p, d = _f32(p), _f32(d)
    r = p.shape[0]
    k = cp.cluster_size
    rows_tbl = np.asarray(cp.rows, np.float32)
    root_lo = np.array([np.asarray(v).min() for v in
                        (cp.lo.x, cp.lo.y, cp.lo.z)], np.float32)
    root_hi = np.array([np.asarray(v).max() for v in
                        (cp.hi.x, cp.hi.y, cp.hi.z)], np.float32)
    tf = _f32(np.asarray(tfar))
    visit = np.asarray(visit)
    entry = np.asarray(entry, np.float32)
    nvis = np.asarray(nvis)[:, 0]
    t_tiles = visit.shape[0]
    rp = t_tiles * tile_r

    tf_p = np.zeros(rp, np.float32)
    tf_p[:r] = tf
    p_p = np.full((rp, 3), 1e30, np.float32)
    p_p[:r] = p
    d_p = np.ones((rp, 3), np.float32)
    d_p[:r] = d

    occ_out = np.zeros(rp, bool)
    visits_executed = 0
    for row in range(t_tiles):
        s = slice(row * tile_r, (row + 1) * tile_r)
        tp, td = p_p[s], d_p[s]
        tf_t = tf_p[s]
        ok = tf_t > 0.0
        rexit = root_exit_bound(tp, td, root_lo, root_hi)
        bound = np.minimum(tf_t, rexit)
        mx = np.where(ok, bound, -FLT_MAX).max() if tile_r else -FLT_MAX
        n = int(nvis[row])
        occ = np.zeros(tile_r, bool)
        j = 0
        while j < n and entry[row, j] < mx:
            for u in range(w_trip):
                ju = j + u
                if u > 0 and not (ju < n and entry[row, min(ju, n - 1)] < mx):
                    continue
                c = int(visit[row, ju])
                bits = _SIM_ANYHIT[cp.kind](
                    tp, td, tf_t,
                    _cluster_rows(rows_tbl, c, k, cp.kind,
                                  getattr(cp, "planes", None)),
                )
                visits_executed += 1
                occ |= bits.any(axis=1) & ok
            if j % er == (er - w_trip) % er:
                live = ok & ~occ
                mx = np.where(live, bound, -FLT_MAX).max()
            j += w_trip
        occ_out[s] = occ
    return occ_out[:r], visits_executed
