"""Pallas TPU kernel for the ray-sphere battery.

Replaces the reference's AVX2 inner loop (/root/reference/BVH.hpp:242-268)
with a VMEM-tiled kernel: rays are tiled along the first grid axis, prims
along the second (revisited-output accumulation), so the [TILE_R x TILE_P]
candidate-distance block and its argmin reduction happen entirely on-chip
and the O(R*P) distance matrix never touches HBM (the pure-jnp fallback in
ops/intersect.py materializes it per prim-chunk).

Round-5 layout note: 1-D f32 operands of length >= 1024 get XLA layout
T(1024), so the RAY block is pinned at 1024 lanes; the prim axis is what
tiles (grid axis 1, min/OR accumulation into the revisited output
block). Prim tables are passed as a [n_blocks, TILE_P] 2-D view loaded
whole into VMEM (tens of KB) and row-sliced per grid step — a
(1, TILE_P) block fails the sublane-divisibility rule and the 1-D form
hits the T(1024) pin. First-occurrence argmin tie-break is preserved
across prim blocks because blocks are visited in index order and the
cross-block combine is strict-less-than.

MEASURED VERDICT (round 5, benchmarks/diag_battery4.py on v5e at the
config-2 shape 262k x 1024, bit-equal asserted): the kernel LOSES to
XLA's own fusion of the same math at every schedule tried — closest
4.46 ms (TILE_P=1024) / 14.25 ms (TILE_P=256) vs XLA 2.26 ms; occluded
3.36 / 7.57 vs 2.33. ARCHITECTURE.md's round-1 "XLA within ~20%" note
is superseded: with the round-5 vreduce epilogue the XLA battery is 2x
FASTER than this kernel's best schedule. The kernel stays in-tree as
the documented experiment + interpret-mode reference; production keeps
ops/intersect.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ...core.vec import Vec3

try:  # pragma: no cover - import guard
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAVE_PALLAS = True
except Exception:  # pragma: no cover
    _HAVE_PALLAS = False

FLT_MAX = 3.4028235e38  # plain float: jnp constants would be captured consts in the kernel
TILE_R = 1024  # rays per grid step (1-D f32 layout T(1024) pins this)
TILE_P = 1024  # prims per grid step; measured 3.2x faster than 256 at
# P=1024 (fewer output revisits; [1024 x 1024] f32 intermediates fit
# VMEM once the i1-select is gone) — diag_battery4 TPU A/B


def available() -> bool:
    return _HAVE_PALLAS


def _candidates(px, py, pz, dx, dy, dz, cx, cy, cz, rsq):
    """[TILE_R, TILE_P] candidate distances; +inf for misses
    (BVH.hpp:250-268)."""
    tx = cx[None, :] - px[:, None]
    ty = cy[None, :] - py[:, None]
    tz = cz[None, :] - pz[:, None]
    b = dx[:, None] * tx + dy[:, None] * ty + dz[:, None] * tz
    disc = rsq[None, :] - (tx * tx + ty * ty + tz * tz) + b * b
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t_near = b - sq
    t = jnp.where(t_near < 0.0, b + sq, t_near)
    return jnp.where((disc >= 0.0) & (t >= 0.0), t, FLT_MAX)


def _closest_kernel(px, py, pz, dx, dy, dz, cx, cy, cz, rsq,
                    tfar_out, prim_out):
    j = pl.program_id(1)
    t = _candidates(px[:], py[:], pz[:], dx[:], dy[:], dz[:],
                    cx[j, :], cy[j, :], cz[j, :], rsq[j, :])
    best = jnp.min(t, axis=1)
    # in-block argmin is first-occurrence; global ids offset by the block
    arg = (jnp.argmin(t, axis=1).astype(jnp.int32)
           + j * jnp.int32(TILE_P))

    @pl.when(j == 0)
    def _init():
        tfar_out[:] = best
        prim_out[:] = jnp.where(best < FLT_MAX, arg, -1)

    @pl.when(j > 0)
    def _combine():
        prev = tfar_out[:]
        # strict < keeps the earlier block's id on ties (first occurrence);
        # best < prev also implies best < FLT_MAX, so arg is a real hit
        better = best < prev
        tfar_out[:] = jnp.where(better, best, prev)
        prim_out[:] = jnp.where(better, arg, prim_out[:])


def _occluded_kernel(px, py, pz, dx, dy, dz, tfar, cx, cy, cz, rsq, occ_out):
    # sqrt-free any-hit predicate (ops/intersect.py::_sphere_occluded_pairs)
    j = pl.program_id(1)
    tx = cx[j, :][None, :] - px[:][:, None]
    ty = cy[j, :][None, :] - py[:][:, None]
    tz = cz[j, :][None, :] - pz[:][:, None]
    b = dx[:][:, None] * tx + dy[:][:, None] * ty + dz[:][:, None] * tz
    disc = rsq[j, :][None, :] - (tx * tx + ty * ty + tz * tz) + b * b
    bb = b * b
    e = b - tfar[:][:, None]
    q = e * e
    near_ge0 = (b >= 0.0) & (bb >= disc)
    hit_near = (e < 0.0) | (q < disc)
    far_ge0 = (b >= 0.0) | (bb <= disc)
    hit_far = (e < 0.0) & (disc < q)
    # boolean-algebra select: jnp.where on i1 operands lowers through an
    # i8 select + trunci that Mosaic rejects ("Unsupported target bitwidth
    # for truncation") — same class as the i1-select bug the golden gate
    # caught in round 2
    occ = (disc >= 0.0) & ((near_ge0 & hit_near)
                           | (~near_ge0 & far_ge0 & hit_far))
    block_any = jnp.any(occ, axis=1)

    @pl.when(j == 0)
    def _init():
        occ_out[:] = block_any

    @pl.when(j > 0)
    def _combine():
        occ_out[:] = occ_out[:] | block_any


def _pad_rays(arr, n_pad):
    if n_pad == 0:
        return arr
    return jnp.pad(arr, (0, n_pad))


def _prim_blocks(center: Vec3, radius_sq):
    """Pad prim tables to a TILE_P multiple and reshape to
    [n_blocks, TILE_P] (2-D so the block layout is the (8,128)-tile form,
    not the 1-D T(1024) pin). Padding spheres get rsq = -1 -> disc < 0 ->
    guaranteed miss, so results are unaffected."""
    p_count = radius_sq.shape[0]
    padded = -(-p_count // TILE_P) * TILE_P
    n_pad = padded - p_count
    def pad(a, fill):
        if n_pad:
            a = jnp.pad(a, (0, n_pad), constant_values=fill)
        return a.reshape(padded // TILE_P, TILE_P)
    return (pad(center.x, 0.0), pad(center.y, 0.0), pad(center.z, 0.0),
            pad(radius_sq, -1.0), padded // TILE_P)


@functools.partial(jax.jit, static_argnames=("interpret",))
def intersect_spheres_pallas(p: Vec3, d: Vec3, center: Vec3, radius_sq,
                             interpret: bool = False):
    """Closest-hit: returns (tfar [R], prim_id [R]); prim_id = -1 on miss.
    interpret=True runs the kernel in the Pallas interpreter (CPU CI)."""
    num_rays = p.x.shape[0]
    padded = -(-num_rays // TILE_R) * TILE_R
    n_pad = padded - num_rays
    ray_in = [
        _pad_rays(a, n_pad) for a in (p.x, p.y, p.z, d.x, d.y, d.z)
    ]
    cx, cy, cz, rsq, p_blocks = _prim_blocks(center, radius_sq)
    grid = (padded // TILE_R, p_blocks)
    ray_spec = pl.BlockSpec((TILE_R,), lambda i, j: (i,),
                            memory_space=pltpu.VMEM)
    # whole prim table resident (P x 4 f32 = tens of KB); the kernel
    # slices row j — a (1, TILE_P) block fails the sublane-divisibility
    # rule, and the table is too small to be worth streaming anyway
    prim_spec = pl.BlockSpec((p_blocks, TILE_P), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((TILE_R,), lambda i, j: (i,),
                            memory_space=pltpu.VMEM)
    tfar, prim = pl.pallas_call(
        _closest_kernel,
        grid=grid,
        in_specs=[ray_spec] * 6 + [prim_spec] * 4,
        out_specs=[out_spec, out_spec],
        out_shape=[
            jax.ShapeDtypeStruct((padded,), jnp.float32),
            jax.ShapeDtypeStruct((padded,), jnp.int32),
        ],
        interpret=interpret,
    )(*ray_in, cx, cy, cz, rsq)
    return tfar[:num_rays], prim[:num_rays]


@functools.partial(jax.jit, static_argnames=("interpret",))
def occluded_spheres_pallas(p: Vec3, d: Vec3, tfar, center: Vec3, radius_sq,
                            interpret: bool = False):
    num_rays = p.x.shape[0]
    padded = -(-num_rays // TILE_R) * TILE_R
    n_pad = padded - num_rays
    ray_in = [
        _pad_rays(a, n_pad) for a in (p.x, p.y, p.z, d.x, d.y, d.z)
    ]
    tfar_in = _pad_rays(tfar, n_pad)
    cx, cy, cz, rsq, p_blocks = _prim_blocks(center, radius_sq)
    grid = (padded // TILE_R, p_blocks)
    ray_spec = pl.BlockSpec((TILE_R,), lambda i, j: (i,),
                            memory_space=pltpu.VMEM)
    # whole prim table resident (P x 4 f32 = tens of KB); the kernel
    # slices row j — a (1, TILE_P) block fails the sublane-divisibility
    # rule, and the table is too small to be worth streaming anyway
    prim_spec = pl.BlockSpec((p_blocks, TILE_P), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM)
    occ = pl.pallas_call(
        _occluded_kernel,
        grid=grid,
        in_specs=[ray_spec] * 6 + [ray_spec] + [prim_spec] * 4,
        out_specs=pl.BlockSpec((TILE_R,), lambda i, j: (i,),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((padded,), jnp.bool_),
        interpret=interpret,
    )(*ray_in, tfar_in, cx, cy, cz, rsq)
    return occ[:num_rays]
