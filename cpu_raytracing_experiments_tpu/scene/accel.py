"""Scene acceleration: attach BVHs to a scene.

The reference rebuilds its BVH whenever geometry changes
(Application.cpp:508 -> BVH.hpp:90-206). Here `with_bvh` is that rebuild
hook: host-side SAH build (native C++ when available), primitive arrays
reordered so leaves index directly, and the NEE light list remapped to the
new primitive order.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from ..bvh import builder, grid as grid_mod
from ..core.vec import Vec3
from .scene import Scene, SphereGeometry, TriangleGeometry


def _reorder_vec3(v: Vec3, order: np.ndarray) -> Vec3:
    idx = jnp.asarray(order.astype(np.int32))
    return Vec3(v.x[idx], v.y[idx], v.z[idx])


def with_bvh(scene: Scene, leaf_size: int = 4) -> Scene:
    """Return a scene with sphere (and triangle) BVHs attached and primitives
    reordered to leaf order."""
    centers = np.stack(
        [np.asarray(scene.spheres.center.x), np.asarray(scene.spheres.center.y),
         np.asarray(scene.spheres.center.z)], axis=1,
    )
    radii = np.sqrt(np.asarray(scene.spheres.radius_sq))
    mins, maxs = builder.sphere_bounds(centers, radii)
    sphere_bvh, order = builder.build_bvh(mins, maxs, leaf_size=leaf_size)
    idx = jnp.asarray(order.astype(np.int32))
    spheres = SphereGeometry(
        center=_reorder_vec3(scene.spheres.center, order),
        radius_sq=scene.spheres.radius_sq[idx],
        material_id=scene.spheres.material_id[idx],
    )
    # remap light list (old prim index -> new position)
    inv = np.empty_like(order)
    inv[order] = np.arange(order.shape[0], dtype=order.dtype)
    lights = jnp.asarray(inv.astype(np.int32))[scene.lights]

    tri_bvh = None
    triangles = scene.triangles
    tri_lights = scene.tri_lights
    if triangles is not None:
        v0 = np.stack([np.asarray(triangles.v0.x), np.asarray(triangles.v0.y),
                       np.asarray(triangles.v0.z)], axis=1)
        e1 = np.stack([np.asarray(triangles.e1.x), np.asarray(triangles.e1.y),
                       np.asarray(triangles.e1.z)], axis=1)
        e2 = np.stack([np.asarray(triangles.e2.x), np.asarray(triangles.e2.y),
                       np.asarray(triangles.e2.z)], axis=1)
        tmins, tmaxs = builder.triangle_bounds(v0, v0 + e1, v0 + e2)
        tri_bvh, torder = builder.build_bvh(tmins, tmaxs, leaf_size=leaf_size)
        tidx = jnp.asarray(torder.astype(np.int32))
        triangles = TriangleGeometry(
            v0=_reorder_vec3(triangles.v0, torder),
            e1=_reorder_vec3(triangles.e1, torder),
            e2=_reorder_vec3(triangles.e2, torder),
            normal=_reorder_vec3(triangles.normal, torder),
            material_id=triangles.material_id[tidx],
            area=triangles.area[tidx],
        )
        if tri_lights is not None:
            tinv = np.empty_like(torder)
            tinv[torder] = np.arange(torder.shape[0], dtype=torder.dtype)
            tri_lights = jnp.asarray(tinv.astype(np.int32))[scene.tri_lights]

    return dataclasses.replace(
        scene,
        spheres=spheres,
        lights=lights,
        triangles=triangles,
        tri_lights=tri_lights,
        sphere_bvh=sphere_bvh,
        tri_bvh=tri_bvh,
    )


def with_grid(scene: Scene, res: int = 32, max_per_cell: int = 16) -> Scene:
    """Attach uniform DDA grids (bvh/grid.py) — no primitive reorder needed
    (cells store primitive ids directly), so light lists stay valid."""
    centers = np.stack(
        [np.asarray(scene.spheres.center.x), np.asarray(scene.spheres.center.y),
         np.asarray(scene.spheres.center.z)], axis=1,
    )
    radii = np.sqrt(np.asarray(scene.spheres.radius_sq))
    mins, maxs = builder.sphere_bounds(centers, radii)
    sphere_grid = grid_mod.build_grid(mins, maxs, res=res, max_per_cell=max_per_cell)
    tri_grid = None
    if scene.triangles is not None:
        tri = scene.triangles
        v0 = np.stack([np.asarray(tri.v0.x), np.asarray(tri.v0.y), np.asarray(tri.v0.z)], 1)
        e1 = np.stack([np.asarray(tri.e1.x), np.asarray(tri.e1.y), np.asarray(tri.e1.z)], 1)
        e2 = np.stack([np.asarray(tri.e2.x), np.asarray(tri.e2.y), np.asarray(tri.e2.z)], 1)
        tmins, tmaxs = builder.triangle_bounds(v0, v0 + e1, v0 + e2)
        tri_grid = grid_mod.build_grid(tmins, tmaxs, res=res, max_per_cell=max_per_cell)
    return dataclasses.replace(scene, sphere_grid=sphere_grid, tri_grid=tri_grid)


def with_pallas_clusters(
    scene: Scene, cluster_size="auto", method: str = "sah",
    fill_window: int = 1, group_boxes: bool = False,
) -> Scene:
    """Attach clusters sized for the Pallas traversal kernel (accel='pallas',
    ops/pallas/traverse_kernel.py): K is a multiple of the VPU lane width so
    one cluster battery is a whole number of full-width op streams.
    method='sah' (default) cuts a binned-SAH tree into maximal <=K-prim
    leaves (tight boxes, partial fill); method='morton' is the fixed-size
    morton chop. cluster_size='auto' picks the measured sweet spot by prim
    count (benchmarks/mesh_ab.py K-sweeps with floor-proof x48-64-pass
    timing — the round-2 sweep at 5 fused passes carried 10-26 ms/pass of
    dispatch-floor inflation that favored big K): 20k tris peak at K=64
    (11.9 vs 8.9 Mrays/s at the old K=256 pick), 100k at K=128 (9.4 vs 6.6
    at K=512). Finer clusters cull more precisely — the battery volume
    drop beats the extra visits once per-visit fixed cost is paid
    honestly. 200k+ stays at K=256: K=128 at 328k tris makes ~3.7k
    clusters, brushing the traversal kernel's SMEM visit-list ceiling."""
    if cluster_size == "auto":
        p = scene.spheres.count
        if scene.triangles is not None:
            p = max(p, scene.triangles.count)
        cluster_size = 64 if p < 50_000 else (128 if p < 200_000 else 256)
    if method == "sah":
        return _with_sah_clusters(scene, cluster_size, fill_window,
                                  group_boxes)
    n_sph = -(-scene.spheres.count // cluster_size)
    sc = with_clusters(scene, num_clusters=n_sph)
    if scene.triangles is not None:
        n_tri = -(-scene.triangles.count // cluster_size)
        if n_tri != n_sph:
            # rebuild just the triangle clusters at their own count
            sc2 = with_clusters(scene, num_clusters=n_tri)
            sc = dataclasses.replace(sc, tri_clusters=sc2.tri_clusters)
    return sc


def _with_sah_clusters(scene: Scene, cluster_size: int,
                       fill_window: int = 1,
                       group_boxes: bool = False) -> Scene:
    import numpy as _np

    from ..ops import clustered

    centers = _np.stack(
        [_np.asarray(scene.spheres.center.x), _np.asarray(scene.spheres.center.y),
         _np.asarray(scene.spheres.center.z)], axis=1,
    )
    radii = _np.sqrt(_np.asarray(scene.spheres.radius_sq))
    mins, maxs = builder.sphere_bounds(centers, radii)
    rows = _np.concatenate(
        [centers, _np.asarray(scene.spheres.radius_sq)[:, None]], axis=1
    )
    sphere_clusters = clustered.build_clusters_sah(
        mins, maxs, rows, cluster_size=cluster_size, kind="sphere",
        fill_window=fill_window, group_boxes=group_boxes,
    )
    tri_clusters = None
    if scene.triangles is not None:
        tri = scene.triangles
        v0 = _np.stack([_np.asarray(tri.v0.x), _np.asarray(tri.v0.y), _np.asarray(tri.v0.z)], 1)
        e1 = _np.stack([_np.asarray(tri.e1.x), _np.asarray(tri.e1.y), _np.asarray(tri.e1.z)], 1)
        e2 = _np.stack([_np.asarray(tri.e2.x), _np.asarray(tri.e2.y), _np.asarray(tri.e2.z)], 1)
        tmins, tmaxs = builder.triangle_bounds(v0, v0 + e1, v0 + e2)
        trows = _np.concatenate([v0, e1, e2], axis=1)
        tri_clusters = clustered.build_clusters_sah(
            tmins, tmaxs, trows, cluster_size=cluster_size, kind="triangle",
            fill_window=fill_window, group_boxes=group_boxes,
        )
    return dataclasses.replace(
        scene, sphere_clusters=sphere_clusters, tri_clusters=tri_clusters
    )


def with_clusters(scene: Scene, num_clusters: int = 64) -> Scene:
    """Attach morton-clustered battery tables (ops/clustered.py) — the
    large-scene backend. No primitive reorder (cluster tables carry original
    ids), so light lists stay valid."""
    import numpy as _np

    from ..ops import clustered

    centers = _np.stack(
        [_np.asarray(scene.spheres.center.x), _np.asarray(scene.spheres.center.y),
         _np.asarray(scene.spheres.center.z)], axis=1,
    )
    radii = _np.sqrt(_np.asarray(scene.spheres.radius_sq))
    mins, maxs = builder.sphere_bounds(centers, radii)
    rows = _np.concatenate([centers, _np.asarray(scene.spheres.radius_sq)[:, None]], axis=1)
    sphere_clusters = clustered.build_clusters(
        mins, maxs, rows, num_clusters=num_clusters, kind="sphere"
    )
    tri_clusters = None
    if scene.triangles is not None:
        tri = scene.triangles
        v0 = _np.stack([_np.asarray(tri.v0.x), _np.asarray(tri.v0.y), _np.asarray(tri.v0.z)], 1)
        e1 = _np.stack([_np.asarray(tri.e1.x), _np.asarray(tri.e1.y), _np.asarray(tri.e1.z)], 1)
        e2 = _np.stack([_np.asarray(tri.e2.x), _np.asarray(tri.e2.y), _np.asarray(tri.e2.z)], 1)
        tmins, tmaxs = builder.triangle_bounds(v0, v0 + e1, v0 + e2)
        trows = _np.concatenate([v0, e1, e2], axis=1)
        tri_clusters = clustered.build_clusters(
            tmins, tmaxs, trows, num_clusters=num_clusters, kind="triangle"
        )
    return dataclasses.replace(
        scene, sphere_clusters=sphere_clusters, tri_clusters=tri_clusters
    )
