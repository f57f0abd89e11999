"""Batched ray-primitive intersection.

TPU-native replacement for the reference's 8-wide AVX2 sphere battery
(/root/reference/BVH.hpp:237-305). The CPU code loops prims outer / 8-ray
SIMD groups inner with masked stores; here the whole [rays x prims] battery
is one broadcasted computation reduced with argmin — XLA vectorizes it onto
full VPU width and fuses the distance formula, the validity masks and the
running-min into one pass. Prim chunking bounds the materialized [R, C]
working set. A Pallas kernel variant lives in ops/pallas/sphere_kernel.py.

Root-selection semantics match BVH.hpp:250-287 exactly:
    b    = dot(dir, C - p)
    disc = r^2 - |C - p|^2 + b^2
    t    = b - sqrt(disc), or b + sqrt(disc) if the near root is negative
    hit  = disc >= 0 and t >= 0 and t < tfar
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.vec import Vec3
from .pallas import sphere_kernel as _pk
from .pallas import traverse_kernel as _tk

FLT_MAX = jnp.float32(3.4028235e38)


PALLAS_MIN_PRIMS = 192  # below this, the dense [R x P] brute battery beats
# the clustered kernel's fixed cost (a zero-work traversal invocation
# measures ~6 ms in-jit at 147k rays: plan battery + grid overheads); the
# mesh scenes' 2-sphere geometry was paying that twice per bounce


PALLAS_STREAM_BYTES = 48 << 20  # tables above this stay in HBM and stream
# per-visit (pallas_stream='auto'); below it residency is cheaper and the
# remaining VMEM comfortably holds ray columns + double buffers


def _tile_for(kw: dict, cp) -> dict:
    """Resolve tile_r='auto' and stream='auto' per cluster pack: small packs
    (few clusters) amortize fixed per-tile planning cost better at 128
    rays/tile; large packs want the wider 256-ray tile (measured,
    benchmarks/mesh_ab.py). Packs whose attribute tables exceed the VMEM
    streaming threshold traverse via the HBM-streaming kernel, which has its
    own visit schedule (mxu/fuse/unroll/trav_block drop per-pack)."""
    if kw.get("tile_r") == "auto":
        # 128 up to ~2k clusters (clean 48-pass A/B: 100k tris C=1130
        # tile=128 beats 256 — the round-2 "large packs want 256" call was
        # dispatch-floor inflation); past that the planner's per-tile
        # [TILE_R x C] battery and [T, C] entry matrix favor fewer tiles
        kw = dict(kw, tile_r=128 if cp.num_clusters < 2048 else 256)
    if kw.get("fuse") == "auto":
        # fused-visit width by cluster size (measured, benchmarks/
        # RESULTS.md): K<=256 takes quad trips (20k mesh 7.04 -> 7.40
        # Mrays/s), the wide K=512 batteries already amortize the epilogue
        # and prefer pairs (100k 4.86 -> 5.17; fuse=4 measured 5.11).
        # trav_block=8 composes (both bit-exact).
        kw = dict(kw, fuse=4 if cp.cluster_size <= 256 else 2,
                  trav_block=8 if kw.get("trav_block") == 1 else
                  kw.get("trav_block"))
    if kw.get("plan") == "auto":
        # 'super' measured slower at every tested C (RESULTS.md round-3
        # supercluster A/B); auto resolves to the flat per-ray battery
        kw = dict(kw, plan="ray")
    if kw.get("stream") == "auto":
        kw = dict(kw, stream=_tk.table_bytes(cp) > PALLAS_STREAM_BYTES)
    if cp.cluster_size < 128:
        # lane-packed sub-128 clusters use lane-tiled tables the streaming
        # DMA and MXU batteries don't support — and such packs are tiny, so
        # residency is free; clamp rather than assert so a global
        # pallas_stream/pallas_mxu policy composes with mixed pack sizes
        kw = dict(kw, stream=False, mxu=False)
    if kw.get("stream"):
        kw = dict(kw, mxu=False, fuse=False, unroll=1, trav_block=1,
                  prefetch=False)
    return kw


def _pallas_kw(policy) -> dict:
    """pallas_* knobs from a RendererPolicy (defaults when policy is None)."""
    if policy is None:
        return {"tile_r": _tk.DEFAULT_TILE_R, "sort": True,
                "sort_impl": "kernel", "compact": False,
                "interpret": False, "mxu": False, "plan": "ray",
                "plan_block": 8, "unroll": 1, "fuse": "auto", "trav_block": 1,
                "stream": "auto", "exit_refresh": 8, "prefetch": False}
    return {
        "tile_r": policy.pallas_tile_rays,
        "sort": policy.pallas_sort_visits,
        "sort_impl": policy.pallas_sort_impl,
        "compact": policy.pallas_compact,
        "interpret": policy.pallas_interpret,
        "mxu": policy.pallas_mxu,
        "plan": policy.pallas_plan,
        "plan_block": policy.pallas_plan_block,
        "unroll": policy.pallas_unroll,
        "fuse": policy.pallas_fuse,
        "trav_block": policy.pallas_trav_block,
        "stream": policy.pallas_stream,
        "exit_refresh": policy.pallas_exit_refresh,
        "prefetch": policy.pallas_prefetch,
    }


def _closest_epilogue(t):
    """One-pass closest-hit reduce: (min t [R], first index achieving it).

    The candidate matrix feeds ONE variadic lax.reduce instead of the
    min + iota-compare re-reduce it replaced — with two reduces XLA either
    materializes [R, C] or recomputes the battery math per reduce. Measured
    at exactly config-2 shape (262144 rays x 1024 prims, TPU v5e): 2.29 ms
    vs 4.158 ms for the two-reduce form, bit-equal including the
    first-occurrence tie-break (benchmarks/diag_battery3.py, r4g.log).
    NOTE: inside Pallas/Mosaic the tradeoff INVERTS — the (f32,i32)
    tuple-reduce lowers poorly on the VPU there, so the traversal kernels
    keep min-iota (traverse_kernel.py:738)."""
    iota = jax.lax.broadcasted_iota(jnp.int32, t.shape, 1)

    def comp(a, b):
        at, ai = a
        bt, bi = b
        pick_b = (bt < at) | ((bt == at) & (bi < ai))
        return (jnp.where(pick_b, bt, at), jnp.where(pick_b, bi, ai))

    return jax.lax.reduce(
        (t, iota), (FLT_MAX, jnp.int32(1 << 30)), comp, (1,))


def _sphere_candidates(p: Vec3, d: Vec3, cx, cy, cz, r_sq):
    """Per-(ray, prim) candidate distances. p,d: [R]; c*,r_sq: [C].
    Returns t [R, C] with invalid entries = +inf."""
    tx = cx[None, :] - p.x[:, None]
    ty = cy[None, :] - p.y[:, None]
    tz = cz[None, :] - p.z[:, None]
    b = d.x[:, None] * tx + d.y[:, None] * ty + d.z[:, None] * tz
    disc = r_sq[None, :] - (tx * tx + ty * ty + tz * tz) + b * b
    valid = disc >= 0.0
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t_near = b - sq
    t = jnp.where(t_near < 0.0, b + sq, t_near)
    valid = valid & (t >= 0.0)
    return jnp.where(valid, t, FLT_MAX)


def intersect_spheres(
    p: Vec3,
    d: Vec3,
    center: Vec3,
    radius_sq: jnp.ndarray,
    tfar: Optional[jnp.ndarray] = None,
    prim_chunk: int = 512,
    prim_id_offset: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Closest-hit over all spheres. Returns (tfar [R], prim_id [R]),
    prim_id = -1 for miss. `tfar` seeds the search (closer hits only)."""
    num_rays = p.x.shape[0]
    num_prims = radius_sq.shape[0]
    best_t = jnp.full((num_rays,), FLT_MAX) if tfar is None else tfar
    best_id = jnp.full((num_rays,), -1, jnp.int32)
    for start in range(0, num_prims, prim_chunk):
        end = min(start + prim_chunk, num_prims)
        t = _sphere_candidates(
            p, d, center.x[start:end], center.y[start:end], center.z[start:end],
            radius_sq[start:end],
        )
        chunk_best, first = _closest_epilogue(t)
        chunk_arg = first + (start + prim_id_offset)
        closer = chunk_best < best_t
        best_id = jnp.where(closer, chunk_arg, best_id)
        best_t = jnp.where(closer, chunk_best, best_t)
    return best_t, best_id


def _sphere_occluded_pairs(p: Vec3, d: Vec3, tfar, cx, cy, cz, r_sq):
    """Per-(ray, prim) occlusion bits — the reference's selected-root-in-
    [0, tfar) predicate (BVH.hpp:291-305) rewritten sqrt-free. With
    s = sqrt(disc), near = b - s, far = b + s, every root comparison is a
    sign test plus a square comparison:
        near >= 0  <=>  b >= 0  and  b^2 >= disc
        near < tf  <=>  b - tf < 0  or  (b - tf)^2 < disc
        far  >= 0  <=>  b >= 0  or   b^2 <= disc
        far  < tf  <=>  b - tf < 0  and disc < (b - tf)^2
    so the any-hit battery needs no sqrt, no root select and no FLT_MAX
    select — ~25% fewer VPU slots per pair than reusing the closest-hit
    candidates. Boundary rays within ~1 ulp of tangency may round
    differently than the sqrt form; lanes with tfar <= 0 can never occlude
    (e = b there, and both branches reject), preserving the renderer's
    masked-shadow-lane contract."""
    tx = cx[None, :] - p.x[:, None]
    ty = cy[None, :] - p.y[:, None]
    tz = cz[None, :] - p.z[:, None]
    b = d.x[:, None] * tx + d.y[:, None] * ty + d.z[:, None] * tz
    disc = r_sq[None, :] - (tx * tx + ty * ty + tz * tz) + b * b
    bb = b * b
    e = b - tfar[:, None]
    q = e * e
    near_ge0 = (b >= 0.0) & (bb >= disc)
    hit_near = (e < 0.0) | (q < disc)  # near < tfar
    far_ge0 = (b >= 0.0) | (bb <= disc)
    hit_far = (e < 0.0) & (disc < q)  # far < tfar
    return (disc >= 0.0) & jnp.where(near_ge0, hit_near, far_ge0 & hit_far)


def occluded_spheres(
    p: Vec3,
    d: Vec3,
    tfar: jnp.ndarray,
    center: Vec3,
    radius_sq: jnp.ndarray,
    prim_chunk: int = 512,
) -> jnp.ndarray:
    """Any-hit shadow test (BVH.hpp:291-305): True where any prim lies at
    t in [0, tfar) along the ray."""
    num_rays = p.x.shape[0]
    num_prims = radius_sq.shape[0]
    occluded = jnp.zeros((num_rays,), bool)
    for start in range(0, num_prims, prim_chunk):
        end = min(start + prim_chunk, num_prims)
        occ = _sphere_occluded_pairs(
            p, d, tfar, center.x[start:end], center.y[start:end],
            center.z[start:end], radius_sq[start:end],
        )
        occluded = occluded | jnp.any(occ, axis=1)
    return occluded


# ---------------------------------------------------------------------------
# Triangles (Moller-Trumbore) — not in the reference (sphere-only); needed
# for the Cornell-box and mesh benchmark configs.
# ---------------------------------------------------------------------------
def _triangle_candidates(p: Vec3, d: Vec3, v0: Vec3, e1: Vec3, e2: Vec3):
    """Per-(ray, tri) distances, +inf when missed. All tri arrays [C].

    Baldwin-Weber precomputed-plane form: the per-pair cross products of
    Moller-Trumbore become per-TRIANGLE constants (n = e1 x e2; u/v dual
    rows f1 = (e2 x n)/|n|^2, f2 = -(e1 x n)/|n|^2), cutting the [R x C]
    inner math from ~57 to ~40 VPU ops/pair. The constants are
    loop-invariant, so XLA hoists them out of the bounce loop. Degenerate
    triangles give n = 0 -> |den| mask rejects. Same u/v (e1/e2
    barycentric) semantics and epsilons as Moller-Trumbore."""

    def bx(a):  # broadcast prim -> [1, C]
        return a[None, :]

    def br(a):  # broadcast ray -> [R, 1]
        return a[:, None]

    # per-triangle constants ([C]-sized; hoisted by XLA)
    nx = e1.y * e2.z - e1.z * e2.y
    ny = e1.z * e2.x - e1.x * e2.z
    nz = e1.x * e2.y - e1.y * e2.x
    nn = nx * nx + ny * ny + nz * nz
    inv_nn = jnp.where(nn > 0.0, 1.0 / jnp.maximum(nn, 1e-38), 0.0)
    f1x = (e2.y * nz - e2.z * ny) * inv_nn
    f1y = (e2.z * nx - e2.x * nz) * inv_nn
    f1z = (e2.x * ny - e2.y * nx) * inv_nn
    f2x = -(e1.y * nz - e1.z * ny) * inv_nn
    f2y = -(e1.z * nx - e1.x * nz) * inv_nn
    f2z = -(e1.x * ny - e1.y * nx) * inv_nn
    d0 = nx * v0.x + ny * v0.y + nz * v0.z
    g1 = -(f1x * v0.x + f1y * v0.y + f1z * v0.z)
    g2 = -(f2x * v0.x + f2y * v0.y + f2z * v0.z)

    # per-pair test
    den = br(d.x) * bx(nx) + br(d.y) * bx(ny) + br(d.z) * bx(nz)
    num = bx(d0) - (br(p.x) * bx(nx) + br(p.y) * bx(ny) + br(p.z) * bx(nz))
    t = num / den
    qx = br(p.x) + t * br(d.x)
    qy = br(p.y) + t * br(d.y)
    qz = br(p.z) + t * br(d.z)
    u = qx * bx(f1x) + qy * bx(f1y) + qz * bx(f1z) + bx(g1)
    v = qx * bx(f2x) + qy * bx(f2y) + qz * bx(f2z) + bx(g2)
    valid = (
        (jnp.abs(den) > 1e-12)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > 1e-6)
    )
    return jnp.where(valid, t, FLT_MAX)


def intersect_triangles(
    p: Vec3,
    d: Vec3,
    v0: Vec3,
    e1: Vec3,
    e2: Vec3,
    tfar: Optional[jnp.ndarray] = None,
    prim_chunk: int = 512,
    prim_id_offset: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    num_rays = p.x.shape[0]
    num_prims = v0.x.shape[0]
    best_t = jnp.full((num_rays,), FLT_MAX) if tfar is None else tfar
    best_id = jnp.full((num_rays,), -1, jnp.int32)
    sl = lambda vec, a, b: Vec3(vec.x[a:b], vec.y[a:b], vec.z[a:b])
    for start in range(0, num_prims, prim_chunk):
        end = min(start + prim_chunk, num_prims)
        t = _triangle_candidates(p, d, sl(v0, start, end), sl(e1, start, end), sl(e2, start, end))
        chunk_best, first = _closest_epilogue(t)
        chunk_arg = first + (start + prim_id_offset)
        closer = chunk_best < best_t
        best_id = jnp.where(closer, chunk_arg, best_id)
        best_t = jnp.where(closer, chunk_best, best_t)
    return best_t, best_id


def occluded_triangles(
    p: Vec3, d: Vec3, tfar: jnp.ndarray, v0: Vec3, e1: Vec3, e2: Vec3,
    prim_chunk: int = 512,
) -> jnp.ndarray:
    num_rays = p.x.shape[0]
    num_prims = v0.x.shape[0]
    occluded = jnp.zeros((num_rays,), bool)
    sl = lambda vec, a, b: Vec3(vec.x[a:b], vec.y[a:b], vec.z[a:b])
    for start in range(0, num_prims, prim_chunk):
        end = min(start + prim_chunk, num_prims)
        t = _triangle_candidates(p, d, sl(v0, start, end), sl(e1, start, end), sl(e2, start, end))
        occluded = occluded | jnp.any(t < tfar[:, None], axis=1)
    return occluded


# ---------------------------------------------------------------------------
# Scene-level dispatch: spheres + optional triangles, optional Pallas kernel.
# ---------------------------------------------------------------------------
def intersect_scene(
    scene, p: Vec3, d: Vec3, use_pallas: bool = False, use_bvh: bool = False,
    accel: str = None, alive=None, policy=None,
):
    """Closest hit over all scene geometry.

    Returns (tfar [R], prim_id [R], is_triangle [R] bool). prim_id indexes
    into spheres or triangles depending on is_triangle; -1 = miss.

    use_bvh selects the stackless threaded-BVH traversal (requires
    scene.accel.with_bvh); the default brute-force battery matches the
    reference's shipped USEBVH=false configuration (BVH.hpp:307).
    accel='pallas' runs the clustered-traversal kernel
    (ops/pallas/traverse_kernel.py); `alive` masks dead wavefront lanes so
    the kernel can skip them (they return miss), and `policy` carries the
    pallas_* knobs.
    """
    accel = accel or ("bvh" if use_bvh else "brute")
    if accel == "pallas" and scene.sphere_clusters is not None and _tk.available():
        kw = _pallas_kw(policy)
        compact = kw.pop("compact")
        if compact and alive is not None:
            run = partial(_tk.intersect_clustered_pallas_compact, alive=alive)
        else:
            run = partial(_tk.intersect_clustered_pallas, alive=alive)
        if scene.spheres.count < PALLAS_MIN_PRIMS:
            tfar, prim_id = intersect_spheres(
                p, d, scene.spheres.center, scene.spheres.radius_sq
            )
        else:
            cp = scene.sphere_clusters
            tfar, prim_id = run(cp, p, d, **_tile_for(kw, cp))
        is_tri = jnp.zeros_like(prim_id, bool)
        if scene.triangles is not None:
            if scene.triangles.count < PALLAS_MIN_PRIMS or scene.tri_clusters is None:
                tri = scene.triangles
                t2, id2 = intersect_triangles(
                    p, d, tri.v0, tri.e1, tri.e2, tfar=tfar
                )
            else:
                cp = scene.tri_clusters
                t2, id2 = run(cp, p, d, tfar0=tfar, **_tile_for(kw, cp))
            hit_tri = id2 >= 0
            prim_id = jnp.where(hit_tri, id2, prim_id)
            tfar = jnp.where(hit_tri, t2, tfar)
            is_tri = hit_tri
        return tfar, prim_id, is_tri
    if accel == "clustered" and scene.sphere_clusters is not None:
        from . import clustered as _cl

        tfar, prim_id = _cl.intersect_clustered(scene.sphere_clusters, p, d)
        is_tri = jnp.zeros_like(prim_id, bool)
        if scene.triangles is not None and scene.tri_clusters is not None:
            t2, id2 = _cl.intersect_clustered(scene.tri_clusters, p, d, tfar0=tfar)
            hit_tri = id2 >= 0
            prim_id = jnp.where(hit_tri, id2, prim_id)
            tfar = jnp.where(hit_tri, t2, tfar)
            is_tri = hit_tri
        return tfar, prim_id, is_tri
    if accel == "grid" and scene.sphere_grid is not None:
        from ..bvh import grid as grid_mod, traverse

        tfar, prim_id = grid_mod.traverse_grid_closest(
            scene.sphere_grid, p, d,
            traverse.pack_spheres(scene.spheres.center, scene.spheres.radius_sq),
            traverse.sphere_row_test,
        )
        is_tri = jnp.zeros_like(prim_id, bool)
        if scene.triangles is not None and scene.tri_grid is not None:
            tri = scene.triangles
            t2, id2 = grid_mod.traverse_grid_closest(
                scene.tri_grid, p, d,
                traverse.pack_triangles(tri.v0, tri.e1, tri.e2),
                traverse.triangle_row_test,
                tfar0=tfar,
            )
            hit_tri = id2 >= 0
            prim_id = jnp.where(hit_tri, id2, prim_id)
            tfar = jnp.where(hit_tri, t2, tfar)
            is_tri = hit_tri
        return tfar, prim_id, is_tri
    if accel == "bvh" and scene.sphere_bvh is not None:
        from ..bvh import traverse

        tfar, prim_id = traverse.traverse_closest_packed(
            scene.sphere_bvh, p, d,
            traverse.pack_spheres(scene.spheres.center, scene.spheres.radius_sq),
            traverse.sphere_row_test,
        )
        is_tri = jnp.zeros_like(prim_id, bool)
        if scene.triangles is not None and scene.tri_bvh is not None:
            tri = scene.triangles
            t2, id2 = traverse.traverse_closest_packed(
                scene.tri_bvh, p, d,
                traverse.pack_triangles(tri.v0, tri.e1, tri.e2),
                traverse.triangle_row_test,
                tfar0=tfar,
            )
            hit_tri = id2 >= 0
            prim_id = jnp.where(hit_tri, id2, prim_id)
            tfar = jnp.where(hit_tri, t2, tfar)
            is_tri = hit_tri
        return tfar, prim_id, is_tri
    if use_pallas and _pk.available() and scene.triangles is None:
        tfar, prim_id = _pk.intersect_spheres_pallas(
            p, d, scene.spheres.center, scene.spheres.radius_sq
        )
        return tfar, prim_id, jnp.zeros_like(prim_id, bool)
    tfar, prim_id = intersect_spheres(
        p, d, scene.spheres.center, scene.spheres.radius_sq
    )
    is_tri = jnp.zeros_like(prim_id, bool)
    if scene.triangles is not None:
        tri = scene.triangles
        t2, id2 = intersect_triangles(p, d, tri.v0, tri.e1, tri.e2, tfar=tfar)
        hit_tri = id2 >= 0
        prim_id = jnp.where(hit_tri, id2, prim_id)
        tfar = jnp.where(hit_tri, t2, tfar)
        is_tri = hit_tri
    return tfar, prim_id, is_tri


def occluded_scene(
    scene, p: Vec3, d: Vec3, tfar: jnp.ndarray,
    use_pallas: bool = False, use_bvh: bool = False, accel: str = None,
    policy=None,
):
    accel = accel or ("bvh" if use_bvh else "brute")
    if accel == "pallas" and scene.sphere_clusters is not None and _tk.available():
        kw = _pallas_kw(policy)
        compact = kw.pop("compact")
        run = (
            _tk.occluded_clustered_pallas_compact
            if compact
            else _tk.occluded_clustered_pallas
        )
        if scene.spheres.count < PALLAS_MIN_PRIMS:
            occ = occluded_spheres(
                p, d, tfar, scene.spheres.center, scene.spheres.radius_sq
            )
        else:
            cp = scene.sphere_clusters
            occ = run(cp, p, d, tfar, **_tile_for(kw, cp))
        if scene.triangles is not None:
            rest = jnp.where(occ, 0.0, tfar)
            if scene.triangles.count < PALLAS_MIN_PRIMS or scene.tri_clusters is None:
                tri = scene.triangles
                occ = occ | occluded_triangles(p, d, rest, tri.v0, tri.e1, tri.e2)
            else:
                cp = scene.tri_clusters
                occ = occ | run(cp, p, d, rest, **_tile_for(kw, cp))
        return occ
    if accel == "clustered" and scene.sphere_clusters is not None:
        from . import clustered as _cl

        occ = _cl.occluded_clustered(scene.sphere_clusters, p, d, tfar)
        if scene.triangles is not None and scene.tri_clusters is not None:
            occ = occ | _cl.occluded_clustered(
                scene.tri_clusters, p, d, jnp.where(occ, 0.0, tfar)
            )
        return occ
    if accel == "grid" and scene.sphere_grid is not None:
        from ..bvh import grid as grid_mod, traverse

        occ = grid_mod.traverse_grid_shadow(
            scene.sphere_grid, p, d, tfar,
            traverse.pack_spheres(scene.spheres.center, scene.spheres.radius_sq),
            traverse.sphere_row_test,
        )
        if scene.triangles is not None and scene.tri_grid is not None:
            tri = scene.triangles
            occ = occ | grid_mod.traverse_grid_shadow(
                scene.tri_grid, p, d, jnp.where(occ, 0.0, tfar),
                traverse.pack_triangles(tri.v0, tri.e1, tri.e2),
                traverse.triangle_row_test,
            )
        return occ
    if accel == "bvh" and scene.sphere_bvh is not None:
        from ..bvh import traverse

        occ = traverse.traverse_shadow_packed(
            scene.sphere_bvh, p, d, tfar,
            traverse.pack_spheres(scene.spheres.center, scene.spheres.radius_sq),
            traverse.sphere_row_test,
        )
        if scene.triangles is not None and scene.tri_bvh is not None:
            tri = scene.triangles
            occ = occ | traverse.traverse_shadow_packed(
                scene.tri_bvh, p, d, jnp.where(occ, 0.0, tfar),
                traverse.pack_triangles(tri.v0, tri.e1, tri.e2),
                traverse.triangle_row_test,
            )
        return occ
    if use_pallas and _pk.available() and scene.triangles is None:
        return _pk.occluded_spheres_pallas(
            p, d, tfar, scene.spheres.center, scene.spheres.radius_sq
        )
    occ = occluded_spheres(p, d, tfar, scene.spheres.center, scene.spheres.radius_sq)
    if scene.triangles is not None:
        tri = scene.triangles
        occ = occ | occluded_triangles(p, d, tfar, tri.v0, tri.e1, tri.e2)
    return occ
