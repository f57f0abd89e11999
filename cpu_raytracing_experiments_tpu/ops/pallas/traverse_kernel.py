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
* The traversal decisions move OFF the vector unit: an XLA-side broad phase
  (fused slab battery + per-tile reduce, nothing [R x C] ever materialized)
  plans, per ray-tile, the front-to-back-sorted list of clusters any of its
  rays can touch. The kernel while-loops over *that list only* — a scalar
  branch per cluster instead of the ~1.7 ms lax.cond dispatch tax that made
  device-side culling lose at the XLA level (ops/clustered.py verdict).
* Early termination: the loop stops when the sorted entry distance exceeds
  the tile's worst current hit (closest) / when every lane is occluded
  (shadow) — the reference's traversal-order cull (BVH.hpp:340 TODO) done at
  tile granularity.
* Dead-lane elimination: `compact_calls` sorts rays alive-first before the
  kernel, so late-bounce tiles are either fully live or fully dead — dead
  tiles plan zero visits and cost nothing. This recovers the reference's
  stream compaction (Renderer.hpp:357-404, 431) at tile granularity without
  per-bounce scatter traffic on the full path state.

Layouts: rays ride the sublane axis as [TILE_R, 1] columns; primitive
attributes are [C, K] planes (cluster rows on sublanes, prims on lanes), so
a cluster battery is a [TILE_R,1] x [1,K] broadcast — no in-kernel
transposes. Visit lists and entry distances are SMEM scalars.
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
DEFAULT_TILE_R = 256


def available() -> bool:
    return _HAVE_PALLAS


# ---------------------------------------------------------------------------
# XLA-side planning: per-tile sorted cluster visit lists.
# ---------------------------------------------------------------------------
def _pad1(a, n_pad, value):
    if n_pad == 0:
        return a
    return jnp.pad(a, (0, n_pad), constant_values=value)


def _plan_visits(lo: Vec3, hi: Vec3, p: Vec3, d: Vec3, tfar0, tile_r: int,
                 sort: bool):
    """Per ray-tile broad phase. Returns (visit [T,C] i32 cluster ids sorted
    near-to-far, entry [T,C] f32 sorted tile-min entry distances (+inf past
    the end), nvis [T,1] i32, rays_padded).

    Rays whose tfar0 is 0 (masked shadow lanes) or that were padded plan no
    visits; a tile of only such rays is skipped entirely by the kernel.
    """
    num_rays = p.x.shape[0]
    t_tiles = -(-num_rays // tile_r)
    rp = t_tiles * tile_r
    n_pad = rp - num_rays
    px = _pad1(p.x, n_pad, 1e30).reshape(t_tiles, tile_r, 1)
    py = _pad1(p.y, n_pad, 1e30).reshape(t_tiles, tile_r, 1)
    pz = _pad1(p.z, n_pad, 1e30).reshape(t_tiles, tile_r, 1)
    dx = _pad1(d.x, n_pad, 1.0).reshape(t_tiles, tile_r, 1)
    dy = _pad1(d.y, n_pad, 1.0).reshape(t_tiles, tile_r, 1)
    dz = _pad1(d.z, n_pad, 1.0).reshape(t_tiles, tile_r, 1)
    tf = _pad1(tfar0, n_pad, 0.0).reshape(t_tiles, tile_r, 1)

    lox, loy, loz = lo.x[None, None, :], lo.y[None, None, :], lo.z[None, None, :]
    hix, hiy, hiz = hi.x[None, None, :], hi.y[None, None, :], hi.z[None, None, :]
    ix, iy, iz = 1.0 / dx, 1.0 / dy, 1.0 / dz
    ax, bx2 = (lox - px) * ix, (hix - px) * ix
    tmin = jnp.minimum(ax, bx2)
    tmax = jnp.maximum(ax, bx2)
    ay, by = (loy - py) * iy, (hiy - py) * iy
    tmin = jnp.maximum(tmin, jnp.minimum(ay, by))
    tmax = jnp.minimum(tmax, jnp.maximum(ay, by))
    az, bz = (loz - pz) * iz, (hiz - pz) * iz
    tmin = jnp.maximum(tmin, jnp.minimum(az, bz))
    tmax = jnp.minimum(tmax, jnp.maximum(az, bz))
    entry = jnp.maximum(tmin, 0.0)
    hit = (tmax >= entry) & (entry < tf)
    # tile-level reduce — XLA fuses this over the [T, tile_r, C] virtual
    # battery, nothing ray-resolution ever hits HBM
    entry_t = jnp.min(jnp.where(hit, entry, FLT_MAX), axis=1)  # [T, C]
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
    # pad the tile axis to a multiple of 8: SMEM blocks obey the same
    # (8, 128)-or-full divisibility rule as VMEM, so the kernel maps
    # 8-tile-row blocks and picks row program_id % 8
    t_pad = -(-t_tiles // 8) * 8 - t_tiles
    if t_pad:
        order = jnp.pad(order, ((0, t_pad), (0, 0)))
        entry_sorted = jnp.pad(entry_sorted, ((0, t_pad), (0, 0)))
        nvis = jnp.pad(nvis, ((0, t_pad), (0, 0)))
    return order, entry_sorted, nvis, rp


# ---------------------------------------------------------------------------
# Batteries (kernel-side): rays [TILE_R, 1] x prims [K] -> t [TILE_R, K]
# ---------------------------------------------------------------------------
def _sphere_battery(px, py, pz, dx, dy, dz, attrs, c):
    cx, cy, cz, rsq = attrs
    tx = cx[c][None, :] - px
    ty = cy[c][None, :] - py
    tz = cz[c][None, :] - pz
    b = dx * tx + dy * ty + dz * tz
    disc = rsq[c][None, :] - (tx * tx + ty * ty + tz * tz) + b * b
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t_near = b - sq
    t = jnp.where(t_near < 0.0, b + sq, t_near)
    return jnp.where((disc >= 0.0) & (t >= 0.0), t, FLT_MAX)


def _triangle_battery(px, py, pz, dx, dy, dz, attrs, c):
    v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z = (a[c][None, :] for a in attrs)
    hx = dy * e2z - dz * e2y
    hy = dz * e2x - dx * e2z
    hz = dx * e2y - dy * e2x
    det = e1x * hx + e1y * hy + e1z * hz
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
    sx = px - v0x
    sy = py - v0y
    sz = pz - v0z
    u = (sx * hx + sy * hy + sz * hz) * inv_det
    qx = sy * e1z - sz * e1y
    qy = sz * e1x - sx * e1z
    qz = sx * e1y - sy * e1x
    v = (dx * qx + dy * qy + dz * qz) * inv_det
    t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
    valid = (
        (jnp.abs(det) > 1e-12)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > 1e-6)
    )
    return jnp.where(valid, t, FLT_MAX)


_BATTERIES = {"sphere": _sphere_battery, "triangle": _triangle_battery}
_N_ATTRS = {"sphere": 4, "triangle": 9}


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------
def _make_closest_kernel(kind: str, k_prims: int):
    battery = _BATTERIES[kind]
    n_attr = _N_ATTRS[kind]

    def kernel(*refs):
        (nvis, visit, entry) = refs[:3]
        (px, py, pz, dx, dy, dz, tfin, valid) = refs[3:11]
        attrs = refs[11 : 11 + n_attr]
        tfar_out, prim_out = refs[11 + n_attr : 13 + n_attr]
        mx = refs[13 + n_attr]
        row = jax.lax.rem(pl.program_id(0), 8)
        tfar_out[:] = tfin[:]
        prim_out[:] = jnp.full(prim_out.shape, -1, jnp.int32)
        ok = valid[:] > 0
        mx[0, 0] = jnp.max(jnp.where(ok, tfin[:], -FLT_MAX))
        n = nvis[row, 0]
        rpx, rpy, rpz = px[:], py[:], pz[:]
        rdx, rdy, rdz = dx[:], dy[:], dz[:]

        def cond(j):
            return (j < n) & (entry[row, j] < mx[0, 0])

        def body(j):
            c = visit[row, j]
            t = battery(rpx, rpy, rpz, rdx, rdy, rdz, attrs, c)
            best = jnp.min(t, axis=1, keepdims=True)
            arg = jnp.argmin(t, axis=1).astype(jnp.int32).reshape(best.shape)
            closer = (best < tfar_out[:]) & ok
            tfar_out[:] = jnp.where(closer, best, tfar_out[:])
            prim_out[:] = jnp.where(closer, c * k_prims + arg, prim_out[:])
            mx[0, 0] = jnp.max(jnp.where(ok, tfar_out[:], -FLT_MAX))
            return j + 1

        jax.lax.while_loop(cond, body, jnp.int32(0))

    return kernel


def _make_shadow_kernel(kind: str):
    battery = _BATTERIES[kind]
    n_attr = _N_ATTRS[kind]

    def kernel(*refs):
        (nvis, visit, entry) = refs[:3]
        (px, py, pz, dx, dy, dz, tfar, valid) = refs[3:11]
        attrs = refs[11 : 11 + n_attr]
        occ_out = refs[11 + n_attr]
        mx = refs[12 + n_attr]
        row = jax.lax.rem(pl.program_id(0), 8)
        occ_out[:] = jnp.zeros(occ_out.shape, jnp.int32)
        ok = valid[:] > 0
        tf = tfar[:]
        # worst unoccluded distance: clusters entirely beyond it can't occlude
        mx[0, 0] = jnp.max(jnp.where(ok, tf, -FLT_MAX))
        n = nvis[row, 0]
        rpx, rpy, rpz = px[:], py[:], pz[:]
        rdx, rdy, rdz = dx[:], dy[:], dz[:]

        def cond(j):
            return (j < n) & (entry[row, j] < mx[0, 0])

        def body(j):
            c = visit[row, j]
            t = battery(rpx, rpy, rpz, rdx, rdy, rdz, attrs, c)
            hit = jnp.any(t < tf, axis=1, keepdims=True) & ok
            occ_out[:] = jnp.where(hit, 1, occ_out[:])
            live = ok & (occ_out[:] == 0)
            mx[0, 0] = jnp.max(jnp.where(live, tf, -FLT_MAX))
            return j + 1

        jax.lax.while_loop(cond, body, jnp.int32(0))

    return kernel


# ---------------------------------------------------------------------------
# Host-facing wrappers
# ---------------------------------------------------------------------------
def _tables(cp: ClusteredPrims):
    """[C*K, F] packed rows -> per-attribute [C, K] planes (free reshape)."""
    c, k = cp.num_clusters, cp.cluster_size
    rows = cp.rows.reshape(c, k, -1)
    return tuple(rows[:, :, f] for f in range(rows.shape[2]))


def _ray_cols(arrs, rp):
    out = []
    for a, padval in arrs:
        n_pad = rp - a.shape[0]
        out.append(_pad1(a, n_pad, padval).reshape(-1, 1))
    return out


@functools.partial(
    jax.jit, static_argnames=("tile_r", "sort", "interpret")
)
def intersect_clustered_pallas(
    cp: ClusteredPrims,
    p: Vec3,
    d: Vec3,
    tfar0: Optional[jnp.ndarray] = None,
    alive: Optional[jnp.ndarray] = None,
    tile_r: int = DEFAULT_TILE_R,
    sort: bool = True,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Closest hit. Returns (tfar [R], prim_id [R] in ORIGINAL numbering,
    -1 = miss). `tfar0` seeds the search; `alive=False` lanes are planned
    around and return miss."""
    num_rays = p.x.shape[0]
    tfar0 = jnp.full((num_rays,), FLT_MAX) if tfar0 is None else tfar0
    plan_tf = tfar0 if alive is None else jnp.where(alive, tfar0, 0.0)
    visit, entry, nvis, rp = _plan_visits(cp.lo, cp.hi, p, d, plan_tf, tile_r, sort)
    t_tiles = rp // tile_r
    c, k = cp.num_clusters, cp.cluster_size
    valid = jnp.ones((num_rays,), jnp.float32) if alive is None else alive.astype(jnp.float32)
    ray_in = _ray_cols(
        [(p.x, 1e30), (p.y, 1e30), (p.z, 1e30), (d.x, 1.0), (d.y, 1.0),
         (d.z, 1.0), (tfar0, 0.0), (valid, 0.0)], rp,
    )
    attrs = _tables(cp)
    n_attr = len(attrs)
    smem_row = lambda w: pl.BlockSpec(
        (8, w), lambda i: (i // 8, 0), memory_space=pltpu.SMEM
    )
    col = pl.BlockSpec((tile_r, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    table = pl.BlockSpec((c, k), lambda i: (0, 0), memory_space=pltpu.VMEM)
    tfar, prim = pl.pallas_call(
        _make_closest_kernel(cp.kind, k),
        grid=(t_tiles,),
        in_specs=[smem_row(1), smem_row(c), smem_row(c)] + [col] * 8
        + [table] * n_attr,
        out_specs=[col, col],
        out_shape=[
            jax.ShapeDtypeStruct((rp, 1), jnp.float32),
            jax.ShapeDtypeStruct((rp, 1), jnp.int32),
        ],
        scratch_shapes=[pltpu.SMEM((1, 1), jnp.float32)],
        interpret=interpret,
    )(nvis, visit, entry, *ray_in, *attrs)
    tfar = tfar[:num_rays, 0]
    packed = prim[:num_rays, 0]
    orig = jnp.where(packed >= 0, cp.order[jnp.maximum(packed, 0)], -1)
    return tfar, orig


@functools.partial(
    jax.jit, static_argnames=("tile_r", "sort", "interpret")
)
def occluded_clustered_pallas(
    cp: ClusteredPrims,
    p: Vec3,
    d: Vec3,
    tfar: jnp.ndarray,
    tile_r: int = DEFAULT_TILE_R,
    sort: bool = True,
    interpret: bool = False,
) -> jnp.ndarray:
    """Any-hit: True where some prim lies at t in [0, tfar). Lanes with
    tfar <= 0 plan no visits (the renderer masks invalid shadow rays by
    tfar=0, renderer.py shadow-trace contract)."""
    num_rays = p.x.shape[0]
    visit, entry, nvis, rp = _plan_visits(cp.lo, cp.hi, p, d, tfar, tile_r, sort)
    t_tiles = rp // tile_r
    c, k = cp.num_clusters, cp.cluster_size
    valid = (tfar > 0.0).astype(jnp.float32)
    ray_in = _ray_cols(
        [(p.x, 1e30), (p.y, 1e30), (p.z, 1e30), (d.x, 1.0), (d.y, 1.0),
         (d.z, 1.0), (tfar, 0.0), (valid, 0.0)], rp,
    )
    attrs = _tables(cp)
    n_attr = len(attrs)
    smem_row = lambda w: pl.BlockSpec(
        (8, w), lambda i: (i // 8, 0), memory_space=pltpu.SMEM
    )
    col = pl.BlockSpec((tile_r, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    table = pl.BlockSpec((c, k), lambda i: (0, 0), memory_space=pltpu.VMEM)
    occ = pl.pallas_call(
        _make_shadow_kernel(cp.kind),
        grid=(t_tiles,),
        in_specs=[smem_row(1), smem_row(c), smem_row(c)] + [col] * 8
        + [table] * n_attr,
        out_specs=pl.BlockSpec((tile_r, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rp, 1), jnp.int32),
        scratch_shapes=[pltpu.SMEM((1, 1), jnp.float32)],
        interpret=interpret,
    )(nvis, visit, entry, *ray_in, *attrs)
    return occ[:num_rays, 0] > 0


# ---------------------------------------------------------------------------
# Alive-compaction wrapper: sort rays alive-first so dead lanes condense
# into tiles that plan zero visits (tile-granular stream compaction,
# Renderer.hpp:357-404/431 semantics without per-bounce scatters of the
# full path state).
# ---------------------------------------------------------------------------
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


def _gather_vec3(v: Vec3, idx) -> Vec3:
    return Vec3(v.x[idx], v.y[idx], v.z[idx])


def intersect_clustered_pallas_compact(
    cp, p, d, alive, tfar0=None, tile_r: int = DEFAULT_TILE_R,
    sort: bool = True, interpret: bool = False,
):
    order, inv = compact_order(alive)
    tfar, prim = intersect_clustered_pallas(
        cp, _gather_vec3(p, order), _gather_vec3(d, order),
        tfar0=None if tfar0 is None else tfar0[order],
        alive=alive[order], tile_r=tile_r, sort=sort, interpret=interpret,
    )
    return tfar[inv], prim[inv]


def occluded_clustered_pallas_compact(
    cp, p, d, tfar, tile_r: int = DEFAULT_TILE_R, sort: bool = True,
    interpret: bool = False,
):
    order, inv = compact_order(tfar > 0.0)
    occ = occluded_clustered_pallas(
        cp, _gather_vec3(p, order), _gather_vec3(d, order), tfar[order],
        tile_r=tile_r, sort=sort, interpret=interpret,
    )
    return occ[inv]
