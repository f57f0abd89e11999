"""Pallas TPU kernel for the ray-sphere battery.

Replaces the reference's AVX2 inner loop (/root/reference/BVH.hpp:242-268)
with a VMEM-tiled kernel: rays are tiled along the grid, the full sphere
table is broadcast into VMEM once per tile, and the [TILE_R x P] candidate
distances + argmin reduction happen entirely on-chip, so the O(R*P) distance
matrix never touches HBM (the pure-jnp fallback in ops/intersect.py
materializes it per prim-chunk).
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
TILE_R = 1024  # rays per grid step; [TILE_R, P<=2048] f32 fits VMEM easily


def available() -> bool:
    return _HAVE_PALLAS


def _candidates(px, py, pz, dx, dy, dz, cx, cy, cz, rsq):
    """[TILE_R, P] candidate distances; +inf for misses (BVH.hpp:250-268)."""
    tx = cx[None, :] - px[:, None]
    ty = cy[None, :] - py[:, None]
    tz = cz[None, :] - pz[:, None]
    b = dx[:, None] * tx + dy[:, None] * ty + dz[:, None] * tz
    disc = rsq[None, :] - (tx * tx + ty * ty + tz * tz) + b * b
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t_near = b - sq
    t = jnp.where(t_near < 0.0, b + sq, t_near)
    return jnp.where((disc >= 0.0) & (t >= 0.0), t, FLT_MAX)


def _closest_kernel(px, py, pz, dx, dy, dz, cx, cy, cz, rsq, tfar_out, prim_out):
    t = _candidates(
        px[:], py[:], pz[:], dx[:], dy[:], dz[:], cx[:], cy[:], cz[:], rsq[:]
    )
    best = jnp.min(t, axis=1)
    arg = jnp.argmin(t, axis=1).astype(jnp.int32)
    tfar_out[:] = best
    prim_out[:] = jnp.where(best < FLT_MAX, arg, -1)


def _occluded_kernel(px, py, pz, dx, dy, dz, tfar, cx, cy, cz, rsq, occ_out):
    # sqrt-free any-hit predicate (ops/intersect.py::_sphere_occluded_pairs)
    tx = cx[:][None, :] - px[:][:, None]
    ty = cy[:][None, :] - py[:][:, None]
    tz = cz[:][None, :] - pz[:][:, None]
    b = dx[:][:, None] * tx + dy[:][:, None] * ty + dz[:][:, None] * tz
    disc = rsq[:][None, :] - (tx * tx + ty * ty + tz * tz) + b * b
    bb = b * b
    e = b - tfar[:][:, None]
    q = e * e
    near_ge0 = (b >= 0.0) & (bb >= disc)
    hit_near = (e < 0.0) | (q < disc)
    far_ge0 = (b >= 0.0) | (bb <= disc)
    hit_far = (e < 0.0) & (disc < q)
    occ = (disc >= 0.0) & jnp.where(near_ge0, hit_near, far_ge0 & hit_far)
    occ_out[:] = jnp.any(occ, axis=1)


def _pad_rays(arr, n_pad):
    if n_pad == 0:
        return arr
    return jnp.pad(arr, (0, n_pad))


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
    grid = (padded // TILE_R,)
    ray_spec = pl.BlockSpec((TILE_R,), lambda i: (i,), memory_space=pltpu.VMEM)
    prim_spec = pl.BlockSpec(
        (radius_sq.shape[0],), lambda i: (0,), memory_space=pltpu.VMEM
    )
    tfar, prim = pl.pallas_call(
        _closest_kernel,
        grid=grid,
        in_specs=[ray_spec] * 6 + [prim_spec] * 4,
        out_specs=[ray_spec, ray_spec],
        out_shape=[
            jax.ShapeDtypeStruct((padded,), jnp.float32),
            jax.ShapeDtypeStruct((padded,), jnp.int32),
        ],
        interpret=interpret,
    )(*ray_in, center.x, center.y, center.z, radius_sq)
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
    grid = (padded // TILE_R,)
    ray_spec = pl.BlockSpec((TILE_R,), lambda i: (i,), memory_space=pltpu.VMEM)
    prim_spec = pl.BlockSpec(
        (radius_sq.shape[0],), lambda i: (0,), memory_space=pltpu.VMEM
    )
    occ = pl.pallas_call(
        _occluded_kernel,
        grid=grid,
        in_specs=[ray_spec] * 6 + [ray_spec] + [prim_spec] * 4,
        out_specs=pl.BlockSpec((TILE_R,), lambda i: (i,), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((padded,), jnp.bool_),
        interpret=interpret,
    )(*ray_in, tfar_in, center.x, center.y, center.z, radius_sq)
    return occ[:num_rays]
