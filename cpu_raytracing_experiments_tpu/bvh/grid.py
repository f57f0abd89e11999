"""Uniform-grid acceleration with 3D-DDA stepping — the TPU-friendly
alternative to pointer-chasing BVH traversal for mid/large scenes.

Rationale (no reference equivalent — the reference ships brute force and a
partially-built BVH, BVH.hpp:307): on TPU, per-step cost is dominated by
gathers and the lockstep worst-ray iteration count. A uniform grid has
  * arithmetic-only topology: the next cell comes from integer DDA math,
    no node gathers at all;
  * a hard step bound of O(3*G) for a G^3 grid (vs hundreds-to-thousands
    of BVH node visits for the worst ray);
  * one [K]-slot masked prim-row loop per step (cell table gathers),
    exactly like BVH leaf visits.
Cells store up to K primitive ids (host-built, overflow spills to a global
"residual" list tested brute-force — keeps correctness exact).
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.vec import Vec3

FLT_MAX = jnp.float32(3.4028235e38)


def _pytree_dataclass(cls, meta=()):
    cls = dataclasses.dataclass(cls)
    fields = [f.name for f in dataclasses.fields(cls) if f.name not in meta]
    jax.tree_util.register_dataclass(cls, data_fields=fields, meta_fields=list(meta))
    return cls


@lambda cls: _pytree_dataclass(cls, meta=("res", "max_per_cell"))
class UniformGrid:
    origin: jnp.ndarray  # [3] f32 world-space min corner
    inv_cell: jnp.ndarray  # [3] f32 1/cell_size
    cell_size: jnp.ndarray  # [3] f32
    cells: jnp.ndarray  # [G^3, K] int32 prim ids, -1 padded
    cell_count: jnp.ndarray  # [G^3] int32
    residual: jnp.ndarray  # [Rr] int32 prim ids that overflowed (brute-forced)
    res: int = 32
    max_per_cell: int = 16


def build_grid(
    mins: np.ndarray, maxs: np.ndarray, res: int = 32, max_per_cell: int = 16
) -> UniformGrid:
    """Host-side grid build from primitive AABBs (cold path, like the BVH
    build). Prims overlapping many cells are replicated; per-cell overflow
    beyond max_per_cell goes to the residual brute-force list."""
    mins = np.asarray(mins, np.float64)
    maxs = np.asarray(maxs, np.float64)
    lo = mins.min(axis=0) - 1e-4
    hi = maxs.max(axis=0) + 1e-4
    size = np.maximum(hi - lo, 1e-6)
    cell = size / res
    inv = 1.0 / cell
    n = mins.shape[0]
    cells = [[] for _ in range(res**3)]
    residual = set()
    c0 = np.clip(((mins - lo) * inv).astype(np.int64), 0, res - 1)
    c1 = np.clip(((maxs - lo) * inv).astype(np.int64), 0, res - 1)
    span = (c1 - c0 + 1).prod(axis=1)
    for i in range(n):
        if span[i] > res * res:  # giant prim: brute-force it
            residual.add(i)
            continue
        x0, y0, z0 = c0[i]
        x1, y1, z1 = c1[i]
        for cx in range(x0, x1 + 1):
            for cy in range(y0, y1 + 1):
                for cz in range(z0, z1 + 1):
                    idx = (cx * res + cy) * res + cz
                    if len(cells[idx]) < max_per_cell:
                        cells[idx].append(i)
                    else:
                        residual.add(i)
    table = np.full((res**3, max_per_cell), -1, np.int32)
    count = np.zeros(res**3, np.int32)
    for idx, lst in enumerate(cells):
        count[idx] = len(lst)
        table[idx, : len(lst)] = lst
    residual = np.asarray(sorted(residual), np.int32)
    return UniformGrid(
        origin=jnp.asarray(lo, jnp.float32),
        inv_cell=jnp.asarray(inv, jnp.float32),
        cell_size=jnp.asarray(cell, jnp.float32),
        cells=jnp.asarray(table),
        cell_count=jnp.asarray(count),
        residual=jnp.asarray(residual),
        res=res,
        max_per_cell=max_per_cell,
    )


def traverse_grid_closest(
    grid: UniformGrid,
    p: Vec3,
    d: Vec3,
    leaf_rows: jnp.ndarray,
    leaf_row_test: Callable,
    tfar0=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Amanatides-Woo 3D-DDA over the grid, lockstep across rays.
    Returns (tfar, prim_id)."""
    num_rays = p.x.shape[0]
    res = grid.res
    tfar = jnp.full((num_rays,), FLT_MAX) if tfar0 is None else tfar0
    prim_id = jnp.full((num_rays,), -1, jnp.int32)

    ox, oy, oz = grid.origin[0], grid.origin[1], grid.origin[2]
    inv = grid.inv_cell
    csize = grid.cell_size

    # clip ray to the grid's AABB to find the entry point
    def axis_range(po, do, lo, hi):
        dinv = 1.0 / do
        t0 = (lo - po) * dinv
        t1 = (hi - po) * dinv
        return jnp.minimum(t0, t1), jnp.maximum(t0, t1)

    gx1 = ox + csize[0] * res
    gy1 = oy + csize[1] * res
    gz1 = oz + csize[2] * res
    t0x, t1x = axis_range(p.x, d.x, ox, gx1)
    t0y, t1y = axis_range(p.y, d.y, oy, gy1)
    t0z, t1z = axis_range(p.z, d.z, oz, gz1)
    t_enter = jnp.maximum(jnp.maximum(t0x, t0y), jnp.maximum(t0z, 0.0))
    t_exit = jnp.minimum(jnp.minimum(t1x, t1y), t1z)
    inside = t_enter <= t_exit

    start = t_enter + 1e-5
    px = p.x + d.x * start
    py = p.y + d.y * start
    pz = p.z + d.z * start
    cx = jnp.clip(((px - ox) * inv[0]).astype(jnp.int32), 0, res - 1)
    cy = jnp.clip(((py - oy) * inv[1]).astype(jnp.int32), 0, res - 1)
    cz = jnp.clip(((pz - oz) * inv[2]).astype(jnp.int32), 0, res - 1)

    step_x = jnp.where(d.x >= 0, 1, -1)
    step_y = jnp.where(d.y >= 0, 1, -1)
    step_z = jnp.where(d.z >= 0, 1, -1)
    # t of the next cell boundary along each axis
    nbx = ox + (cx + (step_x > 0)).astype(jnp.float32) * csize[0]
    nby = oy + (cy + (step_y > 0)).astype(jnp.float32) * csize[1]
    nbz = oz + (cz + (step_z > 0)).astype(jnp.float32) * csize[2]
    big = jnp.float32(1e30)
    tmax_x = jnp.where(d.x != 0, (nbx - p.x) / d.x, big)
    tmax_y = jnp.where(d.y != 0, (nby - p.y) / d.y, big)
    tmax_z = jnp.where(d.z != 0, (nbz - p.z) / d.z, big)
    tdelta_x = jnp.where(d.x != 0, jnp.abs(csize[0] / d.x), big)
    tdelta_y = jnp.where(d.y != 0, jnp.abs(csize[1] / d.y), big)
    tdelta_z = jnp.where(d.z != 0, jnp.abs(csize[2] / d.z), big)

    active = inside

    def cond(s):
        return jnp.any(s[0])

    def body(s):
        (active, cx, cy, cz, tmax_x, tmax_y, tmax_z, tfar, prim_id) = s
        cell = (cx * res + cy) * res + cz
        cell = jnp.clip(cell, 0, res**3 - 1)
        ids = grid.cells[cell]  # [R, K]
        count = grid.cell_count[cell]
        for k in range(grid.max_per_cell):
            prim = ids[:, k]
            valid = active & (k < count) & (prim >= 0)
            rows = leaf_rows[jnp.maximum(prim, 0)]
            t, ok = leaf_row_test(rows, p, d)
            closer = valid & ok & (t < tfar)
            tfar = jnp.where(closer, t, tfar)
            prim_id = jnp.where(closer, prim, prim_id)
        # the cell's exit t: if the best hit is before it, this ray is done
        t_cell_exit = jnp.minimum(jnp.minimum(tmax_x, tmax_y), tmax_z)
        done_hit = prim_id >= 0
        done_hit = done_hit & (tfar <= t_cell_exit + 1e-6)
        # DDA step to the next cell
        use_x = (tmax_x <= tmax_y) & (tmax_x <= tmax_z)
        use_y = (~use_x) & (tmax_y <= tmax_z)
        use_z = (~use_x) & (~use_y)
        cx = jnp.where(active & use_x, cx + step_x, cx)
        cy = jnp.where(active & use_y, cy + step_y, cy)
        cz = jnp.where(active & use_z, cz + step_z, cz)
        tmax_x = jnp.where(active & use_x, tmax_x + tdelta_x, tmax_x)
        tmax_y = jnp.where(active & use_y, tmax_y + tdelta_y, tmax_y)
        tmax_z = jnp.where(active & use_z, tmax_z + tdelta_z, tmax_z)
        out = (cx < 0) | (cx >= res) | (cy < 0) | (cy >= res) | (cz < 0) | (cz >= res)
        active = active & ~out & ~done_hit
        return (active, cx, cy, cz, tmax_x, tmax_y, tmax_z, tfar, prim_id)

    state = (active, cx, cy, cz, tmax_x, tmax_y, tmax_z, tfar, prim_id)
    state = jax.lax.while_loop(cond, body, state)
    tfar, prim_id = state[-2], state[-1]

    # residual (overflow/giant) prims: vectorized chunked battery over the
    # residual rows (NOT a per-prim loop — meshes can overflow thousands of
    # prims when cells saturate)
    nres = int(grid.residual.shape[0])
    if nres > 0:
        res_rows = leaf_rows[grid.residual]
        t_res, idx_res = _battery_closest(res_rows, p, d, leaf_row_test)
        closer = (idx_res >= 0) & (t_res < tfar)
        tfar = jnp.where(closer, t_res, tfar)
        prim_id = jnp.where(
            closer, grid.residual[jnp.maximum(idx_res, 0)], prim_id
        )
    return tfar, prim_id


def _battery_closest(rows: jnp.ndarray, p: Vec3, d: Vec3, leaf_row_test,
                     prim_chunk: int = 512):
    """Dense closest-hit battery over packed prim rows [K, F]: returns
    (t [R], local index [R] or -1). Uses the same candidate formulas as
    ops/intersect via the row layout (sphere F=4, triangle F=9)."""
    from ..ops import intersect as _i

    num_rays = p.x.shape[0]
    k = rows.shape[0]
    best_t = jnp.full((num_rays,), FLT_MAX)
    best_i = jnp.full((num_rays,), -1, jnp.int32)
    for start in range(0, k, prim_chunk):
        end = min(start + prim_chunk, k)
        sl = rows[start:end]
        if rows.shape[1] == 4:  # spheres
            t = _i._sphere_candidates(p, d, sl[:, 0], sl[:, 1], sl[:, 2], sl[:, 3])
        else:  # triangles
            t = _i._triangle_candidates(
                p, d,
                Vec3(sl[:, 0], sl[:, 1], sl[:, 2]),
                Vec3(sl[:, 3], sl[:, 4], sl[:, 5]),
                Vec3(sl[:, 6], sl[:, 7], sl[:, 8]),
            )
        cb = jnp.min(t, axis=1)
        ca = jnp.argmin(t, axis=1).astype(jnp.int32) + start
        closer = cb < best_t
        best_t = jnp.where(closer, cb, best_t)
        best_i = jnp.where(closer, ca, best_i)
    return best_t, jnp.where(best_t < FLT_MAX, best_i, -1)


def traverse_grid_shadow(
    grid: UniformGrid,
    p: Vec3,
    d: Vec3,
    tfar: jnp.ndarray,
    leaf_rows: jnp.ndarray,
    leaf_row_test: Callable,
) -> jnp.ndarray:
    """Any-hit DDA: returns occluded [R] (any prim with t in [0, tfar))."""
    num_rays = p.x.shape[0]
    res = grid.res
    occluded = jnp.zeros((num_rays,), bool)

    # residual prims first (vectorized; cheap early kill)
    nres = int(grid.residual.shape[0])
    if nres > 0:
        t_res, idx_res = _battery_closest(leaf_rows[grid.residual], p, d, leaf_row_test)
        occluded = occluded | ((idx_res >= 0) & (t_res < tfar) & (t_res >= 0.0))

    ox, oy, oz = grid.origin[0], grid.origin[1], grid.origin[2]
    inv = grid.inv_cell
    csize = grid.cell_size

    def axis_range(po, do, lo, hi):
        dinv = 1.0 / do
        t0 = (lo - po) * dinv
        t1 = (hi - po) * dinv
        return jnp.minimum(t0, t1), jnp.maximum(t0, t1)

    gx1 = ox + csize[0] * res
    gy1 = oy + csize[1] * res
    gz1 = oz + csize[2] * res
    t0x, t1x = axis_range(p.x, d.x, ox, gx1)
    t0y, t1y = axis_range(p.y, d.y, oy, gy1)
    t0z, t1z = axis_range(p.z, d.z, oz, gz1)
    t_enter = jnp.maximum(jnp.maximum(t0x, t0y), jnp.maximum(t0z, 0.0))
    t_exit = jnp.minimum(jnp.minimum(jnp.minimum(t1x, t1y), t1z), tfar)
    inside = (t_enter <= t_exit) & (tfar > 0.0)

    start = t_enter + 1e-5
    cx = jnp.clip(((p.x + d.x * start - ox) * inv[0]).astype(jnp.int32), 0, res - 1)
    cy = jnp.clip(((p.y + d.y * start - oy) * inv[1]).astype(jnp.int32), 0, res - 1)
    cz = jnp.clip(((p.z + d.z * start - oz) * inv[2]).astype(jnp.int32), 0, res - 1)
    step_x = jnp.where(d.x >= 0, 1, -1)
    step_y = jnp.where(d.y >= 0, 1, -1)
    step_z = jnp.where(d.z >= 0, 1, -1)
    nbx = ox + (cx + (step_x > 0)).astype(jnp.float32) * csize[0]
    nby = oy + (cy + (step_y > 0)).astype(jnp.float32) * csize[1]
    nbz = oz + (cz + (step_z > 0)).astype(jnp.float32) * csize[2]
    big = jnp.float32(1e30)
    tmax_x = jnp.where(d.x != 0, (nbx - p.x) / d.x, big)
    tmax_y = jnp.where(d.y != 0, (nby - p.y) / d.y, big)
    tmax_z = jnp.where(d.z != 0, (nbz - p.z) / d.z, big)
    tdelta_x = jnp.where(d.x != 0, jnp.abs(csize[0] / d.x), big)
    tdelta_y = jnp.where(d.y != 0, jnp.abs(csize[1] / d.y), big)
    tdelta_z = jnp.where(d.z != 0, jnp.abs(csize[2] / d.z), big)
    active = inside & ~occluded

    def cond(s):
        return jnp.any(s[0])

    def body(s):
        (active, cx, cy, cz, tmax_x, tmax_y, tmax_z, occluded) = s
        cell = jnp.clip((cx * res + cy) * res + cz, 0, res**3 - 1)
        ids = grid.cells[cell]
        count = grid.cell_count[cell]
        found = jnp.zeros_like(occluded)
        for k in range(grid.max_per_cell):
            prim = ids[:, k]
            valid = active & (k < count) & (prim >= 0)
            rows = leaf_rows[jnp.maximum(prim, 0)]
            t, ok = leaf_row_test(rows, p, d)
            found = found | (valid & ok & (t < tfar) & (t >= 0.0))
        occluded = occluded | found
        # step
        use_x = (tmax_x <= tmax_y) & (tmax_x <= tmax_z)
        use_y = (~use_x) & (tmax_y <= tmax_z)
        use_z = (~use_x) & (~use_y)
        past_far = jnp.minimum(jnp.minimum(tmax_x, tmax_y), tmax_z) > tfar
        cx = jnp.where(active & use_x, cx + step_x, cx)
        cy = jnp.where(active & use_y, cy + step_y, cy)
        cz = jnp.where(active & use_z, cz + step_z, cz)
        tmax_x = jnp.where(active & use_x, tmax_x + tdelta_x, tmax_x)
        tmax_y = jnp.where(active & use_y, tmax_y + tdelta_y, tmax_y)
        tmax_z = jnp.where(active & use_z, tmax_z + tdelta_z, tmax_z)
        out = (cx < 0) | (cx >= res) | (cy < 0) | (cy >= res) | (cz < 0) | (cz >= res)
        active = active & ~out & ~found & ~past_far
        return (active, cx, cy, cz, tmax_x, tmax_y, tmax_z, occluded)

    state = (active, cx, cy, cz, tmax_x, tmax_y, tmax_z, occluded)
    state = jax.lax.while_loop(cond, body, state)
    return state[-1]
