"""The wavefront path-tracing megakernel.

TPU-native redesign of ``Renderer::Accumulate`` (/root/reference/
Renderer.hpp:73-434). The reference fights CPU cache limits with 16x16-pixel
tiles owning 256-ray SoA streams that are material-sorted and *compacted*
every bounce; on TPU the idiomatic form is a flat ray SoA over the whole
pixel grid, stepped by a ``lax.while_loop`` over bounces with **mask-based
termination** — lanes are divergence-free, so the counting sort
(DataStreams.hpp:221-253) and the dense rewrite at output_index
(Renderer.hpp:357-404) are unnecessary; the while_loop's early exit when
every lane is dead recovers the work savings of compaction at tile
granularity.

Structure of one bounce (stage names and order follow Renderer.hpp):
  intersect -> closest-hit shade -> NEE + MIS -> shadow trace -> emissive-hit
  MIS -> BRDF sample + Russian roulette -> miss/sky -> accumulate.

RNG is bit-parity with the reference's counter scheme (see core/rng.py);
renders with the same policy knobs sample exactly the same decision points.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import functools
import math

import jax
import numpy as np
import jax.numpy as jnp

from ..core import rng, sampling
from ..core.vec import Quat, Vec3
from ..ops import closures, intersect
from ..ops import gather as fast_gather
from ..scene.scene import Scene
from ..utils.config import RendererPolicy

FLT_MAX = jnp.float32(3.4028235e38)
FLT_EPSILON = jnp.float32(1.1920929e-7)


class PathState(NamedTuple):
    """Per-ray SoA wavefront state — the TPU analog of RayStream's
    double-buffered Buffer (DataStreams.hpp:74-105). No double buffering is
    needed: the functional update IS the swap."""

    bounce: jnp.ndarray  # i32 scalar
    p: Vec3  # [R] ray origin
    d: Vec3  # [R] ray direction
    throughput: Vec3  # [R]
    radiance: Vec3  # [R]
    prev_pdf: jnp.ndarray  # [R] BRDF pdf of the previous bounce (for MIS)
    prev_delta: jnp.ndarray  # [R] bool: previous bounce sampled a delta lobe
    alive: jnp.ndarray  # [R] bool
    ray_count: jnp.ndarray  # u32 scalar: useful rays traced (closest-hit +
    # valid shadow rays) — the Mrays/s numerator; dead-code-eliminated by XLA
    # whenever the caller ignores it


def path_index_from_pixel(
    i: jnp.ndarray, width: int, policy: RendererPolicy
) -> jnp.ndarray:
    """Tile-ordered path index (tile_index * TileSize + intra_tile_id) under
    the reference's 16x16 tile decomposition of the (padded) grid
    (Renderer.hpp:85-88, 107)."""
    tr = policy.tile_root
    h_tiles = -(-width // tr)
    x = i % jnp.uint32(width)
    y = i // jnp.uint32(width)
    launch = (y // tr) * jnp.uint32(h_tiles) + (x // tr)
    tid = (y % tr) * jnp.uint32(tr) + (x % tr)
    return launch * jnp.uint32(policy.tile_size) + tid


def pixel_seeds_from_index(
    i: jnp.ndarray, width: int, policy: RendererPolicy, sample: jnp.ndarray = None
) -> jnp.ndarray:
    """Per-path base seed, bit-equal to Renderer.hpp:107's schedule at
    spp=1: seed = path_index * (2*max_bounces + 1). With
    policy.samples_per_pixel > 1 (which the reference declares but never
    implements, Renderer.hpp:21), the stream index is
    path_index * spp + sample — it degenerates to the reference schedule at
    spp=1."""
    path = path_index_from_pixel(i, width, policy)
    spp = policy.samples_per_pixel
    if spp > 1:
        stream = path * jnp.uint32(spp) + (
            jnp.uint32(0) if sample is None else sample
        )
    else:
        stream = path
    return stream * jnp.uint32(2 * policy.max_bounces + 1)


def pixel_seeds(width: int, height: int, policy: RendererPolicy) -> jnp.ndarray:
    return pixel_seeds_from_index(
        jnp.arange(width * height, dtype=jnp.uint32), width, policy
    )


def _site_state(accumulation, counter, policy):
    """RNG site state (Renderer.hpp:117/255/362), optionally avalanche-
    scrambled (policy.rng_scramble) to break hash_2d's lattice structure."""
    state = rng.hash_2d(accumulation, counter)
    if policy.rng_scramble:
        state = rng.hash_u32(state)
    return state


def generate_camera_rays(
    camera, x, y, accumulation, seeds, enable_dof: bool, policy=None
) -> Tuple[Vec3, Vec3]:
    """Primary ray generation (Camera.hpp:80-88 + Renderer.hpp:113-127).

    With `enable_dof`, implements the thin-lens model the reference declares
    but never wires up (Camera.hpp:17-26 vs 80-88): sample the aperture
    disk, retarget through the focus plane.
    """
    state = rng.hash_2d(accumulation, seeds)
    if policy is not None and policy.rng_scramble:
        state = rng.hash_u32(state)
    n_draws = 4 if enable_dof else 2
    state, ds = rng.draws(state, n_draws)
    if policy is not None and policy.stratify_camera:
        # van der Corput in base 2 over the accumulation index (the
        # bitreverse the reference computes but never uses,
        # Renderer.hpp:80), golden-ratio second dimension, rotated per
        # pixel (Cranley-Patterson) by hashed-pixel offsets.
        vdc = rng.make_unit_float(rng.bitreverse32(accumulation))
        gr = jnp.mod(
            accumulation.astype(jnp.float32) * jnp.float32(0.6180339887498949), 1.0
        )
        ox = rng.make_unit_float(rng.hash_u32(seeds))
        oy = rng.make_unit_float(rng.hash_u32(seeds ^ jnp.uint32(0x9E3779B9)))
        ds = [jnp.mod(vdc + ox, 1.0), jnp.mod(gr + oy, 1.0)] + list(ds[2:])
    vx = x.astype(jnp.float32) + ds[0] - camera.half_width
    vy = y.astype(jnp.float32) + ds[1] - camera.half_height
    vz = jnp.broadcast_to(camera.z, vx.shape)
    view_dir = Vec3(vx, vy, vz)
    origin = Vec3(
        jnp.broadcast_to(camera.pos.x, vx.shape),
        jnp.broadcast_to(camera.pos.y, vx.shape),
        jnp.broadcast_to(camera.pos.z, vx.shape),
    )
    if enable_dof:
        # focus plane lies at view-space depth focus_distance along -Z
        scale = camera.focus_distance / jnp.maximum(-camera.z, 1e-6)
        focal_pt = view_dir * scale
        lx, ly = sampling.disk(ds[3], ds[2])
        lens = Vec3(lx * camera.aperture_radius, ly * camera.aperture_radius,
                    jnp.zeros_like(lx))
        local_dir = (focal_pt - lens).normalize()
        world_dir = camera.orient.rotate(local_dir)
        world_lens = camera.orient.rotate(lens)
        return origin + world_lens, world_dir
    direction = camera.orient.rotate(view_dir.normalize())
    return origin, direction


def _closest_hit_frame(scene: Scene, state: PathState, tfar, prim_id, is_tri):
    """Closest-hit shading inputs (Renderer.hpp:169-214): hit point,
    backface-flipped normal, tangent quat, local view vector, offset origin.

    All per-prim attributes ride ONE packed-table gather per geometry kind
    (ops/gather.py): separate SoA column gathers cost ~2-3 ms each inside
    the bounce loop on v5e and dominated the pass. The extras the emissive-
    MIS stage needs (radius_sq / area) are fetched here for free and
    returned in `prim_extra`."""
    safe_sphere = jnp.maximum(jnp.where(is_tri, 0, prim_id), 0)
    hit_pt = state.p + state.d * tfar
    sp = scene.spheres
    scx, scy, scz, s_rsq, s_mid = fast_gather.gather_cols(
        safe_sphere, sp.center.x, sp.center.y, sp.center.z, sp.radius_sq,
        sp.material_id,
    )
    n_sphere = (hit_pt - Vec3(scx, scy, scz)).normalize()
    mat_id = s_mid.astype(jnp.int32)
    prim_extra = {"radius_sq": s_rsq}
    if scene.triangles is not None:
        safe_tri = jnp.maximum(jnp.where(is_tri, prim_id, 0), 0)
        tg = scene.triangles
        tnx, tny, tnz, t_mid, t_area = fast_gather.gather_cols(
            safe_tri, tg.normal.x, tg.normal.y, tg.normal.z, tg.material_id,
            tg.area,
        )
        n = Vec3(tnx, tny, tnz).where(is_tri, n_sphere)
        mat_id = jnp.where(is_tri, t_mid.astype(jnp.int32), mat_id)
        prim_extra["area"] = t_area
    else:
        n = n_sphere
    backface = n.dot(state.d) >= 0.0
    n = (-n).where(backface, n)
    t = sampling.tangent_space(n)
    v_local = sampling.to_local(t, -state.d)
    # Normal offset against self-intersection. The reference uses a fixed
    # 1e-4 (Renderer.hpp:190-192), which is only ~13 float32 ulps at
    # coordinate magnitude 100 and produces severe shadow acne in its own
    # BVH_test-scale scenes; we scale with the hit point's magnitude.
    eps = jnp.maximum(
        1e-4,
        3e-5
        * jnp.maximum(
            jnp.abs(hit_pt.x), jnp.maximum(jnp.abs(hit_pt.y), jnp.abs(hit_pt.z))
        ),
    )
    p_offset = hit_pt + n * eps
    return p_offset, n, t, v_local, mat_id, backface, hit_pt, prim_extra


def _closure_eval(policy, mat, l_local, v_local):
    if policy.brdf == "lambertian":
        return closures.lambert_eval(mat["albedo"], l_local, v_local)
    if policy.brdf == "ggx":
        return closures.ggx_eval(
            mat["f0"], mat["alpha"], l_local, v_local, mat.get("f80")
        )
    return closures.principled_eval(
        mat["albedo"], mat["f0"], mat["transmission"], mat["alpha"],
        l_local, v_local, mat.get("f80"),
    )


def _closure_pdf(policy, mat, l_local, v_local):
    if policy.brdf == "lambertian":
        return closures.lambert_pdf(l_local)
    if policy.brdf == "ggx":
        return closures.ggx_pdf(mat["alpha"], l_local, v_local)
    return closures.principled_pdf(
        mat["albedo"], mat["f0"], mat["transmission"], mat["alpha"],
        l_local, v_local,
    )


def _light_selection_weights(scene: Scene, point: Vec3):
    """[R, L] unnormalized selection weights for power-proportional NEE
    (policy.light_sampling='power'): max emission x approximate subtended
    solid angle from `point`. Sphere lights first, then triangle lights."""
    cols = []
    if int(scene.lights.shape[0]) > 0:
        lc = scene.spheres.center.gather(scene.lights)  # [L]
        lr_sq = scene.spheres.radius_sq[scene.lights]
        em = scene.materials.emission.gather(
            scene.spheres.material_id[scene.lights]
        ).max_component()
        dx = lc.x[None, :] - point.x[:, None]
        dy = lc.y[None, :] - point.y[:, None]
        dz = lc.z[None, :] - point.z[:, None]
        d2 = dx * dx + dy * dy + dz * dz
        cols.append(em[None, :] * lr_sq[None, :] / jnp.maximum(d2, lr_sq[None, :]))
    if scene.tri_lights is not None and int(scene.tri_lights.shape[0]) > 0:
        tri = scene.triangles
        # triangle centroid = v0 + (e1 + e2)/3
        cx = tri.v0.x[scene.tri_lights] + (
            tri.e1.x[scene.tri_lights] + tri.e2.x[scene.tri_lights]
        ) / 3.0
        cy = tri.v0.y[scene.tri_lights] + (
            tri.e1.y[scene.tri_lights] + tri.e2.y[scene.tri_lights]
        ) / 3.0
        cz = tri.v0.z[scene.tri_lights] + (
            tri.e1.z[scene.tri_lights] + tri.e2.z[scene.tri_lights]
        ) / 3.0
        area = tri.area[scene.tri_lights]
        em = scene.materials.emission.gather(
            tri.material_id[scene.tri_lights]
        ).max_component()
        dx = cx[None, :] - point.x[:, None]
        dy = cy[None, :] - point.y[:, None]
        dz = cz[None, :] - point.z[:, None]
        d2 = dx * dx + dy * dy + dz * dz
        cols.append(em[None, :] * area[None, :] / jnp.maximum(d2, area[None, :]))
    return jnp.concatenate(cols, axis=1)


def _select_light(scene: Scene, policy: RendererPolicy, point: Vec3, f, light_count):
    """Select a light from one unit draw `f`. Returns (selected [R] int32,
    selection_pdf [R]). Uniform mode is bit-identical to the reference's
    rand_bounded_int (Random.hpp:31-34)."""
    if policy.light_sampling == "uniform" or light_count == 1:
        sel = jnp.minimum(
            jnp.uint32(light_count - 1),
            (f * jnp.float32(light_count)).astype(jnp.uint32),
        ).astype(jnp.int32)
        return sel, jnp.full_like(f, 1.0 / light_count)
    if policy.light_sampling == "alias" and scene.light_alias is not None:
        # O(1) in L: one alias-row gather picks the light AND its pdf (the
        # table packs the alias bin's pdf beside its own). Static power
        # weights (emission x size, no distance term) — the scalable mode
        # for many-light scenes where 'power''s per-ray [R, L] matrix is
        # the wall.
        la = scene.light_alias
        u = f * jnp.float32(light_count)
        b = jnp.minimum(u.astype(jnp.int32), light_count - 1)
        frac = u - b.astype(jnp.float32)
        row = fast_gather.gather_rows(la.table, b)  # [R, 4]
        take_bin = frac < row[:, 0]
        sel = jnp.where(take_bin, b, row[:, 1].astype(jnp.int32))
        return sel, jnp.where(take_bin, row[:, 2], row[:, 3])
    w = _light_selection_weights(scene, point)  # [R, L]
    total = jnp.sum(w, axis=1)
    ok = total > 0.0
    cdf = jnp.cumsum(w, axis=1)
    target = f * total
    sel = jnp.sum((cdf <= target[:, None]).astype(jnp.int32), axis=1)
    sel = jnp.clip(sel, 0, light_count - 1)
    p_sel = jnp.take_along_axis(w, sel[:, None], axis=1)[:, 0] / jnp.maximum(
        total, 1e-30
    )
    # degenerate all-zero weights: uniform fallback
    sel_u = jnp.minimum(
        jnp.uint32(light_count - 1), (f * jnp.float32(light_count)).astype(jnp.uint32)
    ).astype(jnp.int32)
    return (
        jnp.where(ok, sel, sel_u),
        jnp.where(ok, p_sel, 1.0 / light_count),
    )


def _hit_light_selection_pdf(scene, policy, state, prim_id, is_tri, light_count):
    """Selection pdf the PREVIOUS shading point (the ray origin, state.p)
    would have used for the light we just hit — needed for emissive-hit MIS
    under power-proportional selection."""
    if policy.light_sampling == "uniform" or light_count == 1:
        return 1.0 / light_count
    if policy.light_sampling == "alias" and scene.light_alias is not None:
        # position-independent selection pdf -> one per-prim gather (the
        # LightAlias tables store each prim's pdf directly, 0 = not a
        # light; non-light hits are masked by is_emissive upstream, so the
        # uniform fallback value is never observable)
        la = scene.light_alias
        safe = jnp.maximum(prim_id, 0)
        n_sp = int(la.sphere_pdf.shape[0])
        p = la.sphere_pdf[jnp.minimum(safe, n_sp - 1)]
        if la.tri_pdf is not None:
            n_tp = int(la.tri_pdf.shape[0])
            p = jnp.where(
                is_tri, la.tri_pdf[jnp.minimum(safe, n_tp - 1)], p
            )
        return jnp.where(p > 0.0, p, 1.0 / light_count)
    w = _light_selection_weights(scene, state.p)  # [R, L]
    total = jnp.maximum(jnp.sum(w, axis=1), 1e-30)
    # locate the hit prim in the light lists
    n_s = int(scene.lights.shape[0])
    idx = jnp.zeros_like(prim_id)
    found = jnp.zeros_like(is_tri)
    if n_s > 0:
        match_s = (~is_tri)[:, None] & (prim_id[:, None] == scene.lights[None, :])
        idx = jnp.where(match_s.any(axis=1), jnp.argmax(match_s, axis=1), idx)
        found = found | match_s.any(axis=1)
    if scene.tri_lights is not None and int(scene.tri_lights.shape[0]) > 0:
        match_t = is_tri[:, None] & (prim_id[:, None] == scene.tri_lights[None, :])
        idx = jnp.where(
            match_t.any(axis=1), n_s + jnp.argmax(match_t, axis=1), idx
        )
        found = found | match_t.any(axis=1)
    p = jnp.take_along_axis(w, idx[:, None], axis=1)[:, 0] / total
    return jnp.where(found, p, 1.0 / light_count)


RIS_CANDIDATES = 4  # M for light_sampling='ris'


def _select_light_ris(scene, policy, point: Vec3, site, light_count):
    """Resampled importance sampling over lights (the reference's dormant
    RIS/ReSTIR hook, Sampling.hpp:25-73, wired into NEE): M uniform
    candidates re-weighted by the unshadowed-contribution estimate
    (emission x subtended-solid-angle proxy), one reservoir survivor per
    ray. Returns (site, selected [R] i32, W [R]) where W is the unbiased
    contribution weight replacing 1/p_select."""
    w_table = _light_selection_weights(scene, point)  # [R, L] p_hat per light
    shape = point.x.shape
    sel = jnp.full(shape, -1, jnp.int32)
    wsum = jnp.zeros(shape, jnp.float32)
    for _ in range(RIS_CANDIDATES):
        site, u_cand = rng.rand_unit_float(site)
        cand = jnp.minimum(
            jnp.uint32(light_count - 1),
            (u_cand * jnp.float32(light_count)).astype(jnp.uint32),
        ).astype(jnp.int32)
        p_hat = jnp.take_along_axis(w_table, cand[:, None], axis=1)[:, 0]
        w = p_hat * jnp.float32(light_count)  # p_hat / p_src, p_src = 1/L
        wsum = wsum + w
        site, u_res = rng.rand_unit_float(site)
        take = u_res < (w / jnp.maximum(wsum, 1e-30))
        sel = jnp.where(take, cand, sel)
    ok = sel >= 0
    safe = jnp.maximum(sel, 0)
    p_hat_sel = jnp.take_along_axis(w_table, safe[:, None], axis=1)[:, 0]
    big_w = jnp.where(
        ok & (p_hat_sel > 0.0),
        wsum / (RIS_CANDIDATES * jnp.maximum(p_hat_sel, 1e-30)),
        0.0,
    )
    return site, jnp.where(ok, sel, 0), big_w


def _select_light_restir(scene, policy, point: Vec3, site, light_count,
                         res_in, guides=None, xy=None, geom=None):
    """ReSTIR-style light selection: a fresh M-candidate RIS reservoir is
    merged with the pixel's temporal reservoir (previous accumulation pass)
    and `restir_spatial` neighbor reservoirs, all re-weighted by the target
    p_hat AT THE CURRENT shading point (CombineReservoirs semantics,
    /root/reference/Sampling.hpp:56-73 — the reference ships the building
    block but never calls it). Unbiased for the unshadowed target because
    the final contribution weight W = wsum / (count * p_hat(sel)) is
    computed against the current point's p_hat; visibility is resolved by
    the per-pass shadow ray as usual.

    Spatial neighbors (round 3): when `xy` (per-lane LOCAL pixel coords)
    and `geom` (order, width, tile_edge, spp — static) are given, each
    spatial candidate is a true 2-D screen-space neighbor (dx, dy) drawn
    uniformly from the restir_radius box: the neighbor's lane is recovered
    arithmetically from the ray-order key (raster: y*W+x; tile:
    tile-major + in-tile raster), and SELF-VERIFIED by comparing the
    gathered lane's stored coords — a mismatch (chunk boundary, partial
    edge tile, off-image clamp) rejects the candidate, so the arithmetic
    shortcut can never alias a wrong pixel. `guides` = (normal Vec3,
    hit distance [R]) adds the standard geometry-similarity rejection
    (dot(n, n_nb) >= 0.906, |t - t_nb| <= 0.1*max) behind
    policy.restir_reject, suppressing reuse across depth/orientation
    discontinuities. Without xy/geom, falls back to the round-2 1-D
    lane-offset neighborhood.

    res_in/res_out: (sample [R] i32 (-1=empty), W [R] f32, count [R] f32),
    aligned to the CURRENT ray-array order.
    Returns (site, selected, W_sel, res_out)."""
    w_table = _light_selection_weights(scene, point)  # [R, L] p_hat, current pt
    shape = point.x.shape
    m = jnp.float32(RIS_CANDIDATES)

    def p_hat(cand):
        return jnp.take_along_axis(
            w_table, jnp.maximum(cand, 0)[:, None], axis=1
        )[:, 0]

    # fresh RIS reservoir: streaming weights w = p_hat / p_src = p_hat * L
    sel = jnp.full(shape, -1, jnp.int32)
    wsum = jnp.zeros(shape, jnp.float32)
    for _ in range(RIS_CANDIDATES):
        site, u_cand = rng.rand_unit_float(site)
        cand = jnp.minimum(
            jnp.uint32(light_count - 1),
            (u_cand * jnp.float32(light_count)).astype(jnp.uint32),
        ).astype(jnp.int32)
        w = p_hat(cand) * jnp.float32(light_count)
        wsum = wsum + w
        site, u_res = rng.rand_unit_float(site)
        sel = jnp.where(u_res < (w / jnp.maximum(wsum, 1e-30)), cand, sel)
    cnt = jnp.full(shape, m)

    # candidate reservoirs: temporal (same lane) + spatial neighbors
    s_in, w_in, c_in = res_in
    cands = [(s_in, w_in, c_in, None)]
    num = s_in.shape[0]
    lane = jnp.arange(num, dtype=jnp.int32)
    radius = jnp.int32(policy.restir_radius)
    use_2d = xy is not None and geom is not None
    if use_2d:
        order, width, edge, spp = geom
        x_i = xy[0].astype(jnp.int32)
        y_i = xy[1].astype(jnp.int32)
        if order == "tile":
            tiles_x = -(-width // edge)

            def key_fn(px_, py_):
                return (
                    ((py_ // edge) * tiles_x + (px_ // edge)) * (edge * edge)
                    + (py_ % edge) * edge + (px_ % edge)
                )
        else:

            def key_fn(px_, py_):
                return py_ * width + px_

        key_self = key_fn(x_i, y_i)
        # one packed row per lane -> ONE row-gather per candidate instead
        # of up to 9 flat gathers (the measured ~1 ms/gather tax at 147k+)
        cols = [s_in.astype(jnp.float32), w_in, c_in,
                x_i.astype(jnp.float32), y_i.astype(jnp.float32)]
        reject = guides is not None and policy.restir_reject
        if reject:
            n_g, d_g = guides
            cols += [n_g.x, n_g.y, n_g.z, d_g]
        nb_tbl = fast_gather.pack_table(*cols)
    for _ in range(policy.restir_spatial):
        if not use_2d:
            site, u_off = rng.rand_unit_float(site)
            off = (u_off * (2.0 * radius + 1.0)).astype(jnp.int32) - radius
            idx = jnp.clip(lane + off, 0, num - 1)
            cands.append((s_in[idx], w_in[idx], c_in[idx], None))
            continue
        site, u_dx = rng.rand_unit_float(site)
        site, u_dy = rng.rand_unit_float(site)
        rf = 2.0 * radius.astype(jnp.float32) + 1.0
        dx = (u_dx * rf).astype(jnp.int32) - radius
        dy = (u_dy * rf).astype(jnp.int32) - radius
        nx = jnp.clip(x_i + dx, 0, width - 1)
        ny = jnp.maximum(y_i + dy, 0)  # top clamp; bottom via coord verify
        idx = jnp.clip(
            lane + (key_fn(nx, ny) - key_self) * spp, 0, num - 1
        )
        row = fast_gather.gather_rows(nb_tbl, idx)
        s_q = row[:, 0].astype(jnp.int32)
        w_q, c_q = row[:, 1], row[:, 2]
        ok2 = (row[:, 3].astype(jnp.int32) == nx) & (
            row[:, 4].astype(jnp.int32) == ny
        )
        if reject:
            ndot = n_g.x * row[:, 5] + n_g.y * row[:, 6] + n_g.z * row[:, 7]
            d_nb = row[:, 8]
            ok2 = ok2 & (ndot >= 0.906) & (
                jnp.abs(d_g - d_nb) <= 0.1 * jnp.maximum(d_g, d_nb)
            )
        cands.append((s_q, w_q, c_q, ok2))

    cap = m * jnp.float32(policy.restir_temporal_cap)
    for s_q, w_q, c_q, extra_ok in cands:
        c_q = jnp.minimum(c_q, cap)
        ok_q = s_q >= 0
        if extra_ok is not None:
            ok_q = ok_q & extra_ok
        w = jnp.where(ok_q, p_hat(s_q) * w_q * c_q, 0.0)
        wsum = wsum + w
        site, u_res = rng.rand_unit_float(site)
        sel = jnp.where(
            (u_res < (w / jnp.maximum(wsum, 1e-30))) & ok_q, s_q, sel
        )
        cnt = cnt + jnp.where(ok_q, c_q, 0.0)

    ok = sel >= 0
    p_sel = p_hat(sel)
    big_w = jnp.where(
        ok & (p_sel > 0.0), wsum / (cnt * jnp.maximum(p_sel, 1e-30)), 0.0
    )
    res_out = (
        jnp.where(ok, sel, -1),
        big_w,
        jnp.minimum(cnt, cap),
    )
    return site, jnp.where(ok, sel, 0), big_w, res_out


def _next_event_estimation(
    scene: Scene,
    policy: RendererPolicy,
    state: PathState,
    accumulation,
    seeds,
    hit,
    prim_id,
    is_tri,
    p_offset: Vec3,
    t_quat: Quat,
    v_local: Vec3,
    mat: dict,
    restir_in=None,
    restir_xy=None,
    restir_geom=None,
    restir_guides=None,
):
    """NEE with MIS (Renderer.hpp:247-314): pick one light uniformly,
    cone-sample sphere lights / area-sample triangle lights, trace a shadow
    ray, add the power-heuristic-weighted contribution.

    The reference's early-continue rejections (self-hit, inside-sphere,
    cone-below-horizon, sample-below-hemisphere, zero radiance) become masks
    on the shadow radiance."""
    n_sphere_lights = int(scene.lights.shape[0])
    n_tri_lights = 0 if scene.tri_lights is None else int(scene.tri_lights.shape[0])
    light_count = n_sphere_lights + n_tri_lights
    if light_count == 0:
        return Vec3.zeros(state.p.x.shape), jnp.zeros_like(hit), None
    site = _site_state(
        accumulation,
        seeds + jnp.uint32(2) * state.bounce.astype(jnp.uint32),
        policy,
    )
    site, (t_draw, s_draw) = rng.draws(site, 2)
    restir_out = None
    if (
        policy.light_sampling == "restir"
        and restir_in is not None
        and light_count > 1
    ):
        site, selected, ris_w, restir_out = _select_light_restir(
            scene, policy, p_offset, site, light_count, restir_in,
            guides=restir_guides, xy=restir_xy, geom=restir_geom,
        )
        light_selection_pdf = None
    elif policy.light_sampling in ("ris", "restir") and light_count > 1:
        site, selected, ris_w = _select_light_ris(
            scene, policy, p_offset, site, light_count
        )
        light_selection_pdf = None  # RIS replaces 1/p_sel with ris_w
    else:
        site, sel_draw = rng.rand_unit_float(site)
        selected, light_selection_pdf = _select_light(
            scene, policy, p_offset, sel_draw, light_count
        )
        ris_w = None

    zeros = jnp.zeros_like(state.p.x)
    l_dir = Vec3(zeros, zeros, zeros)
    l_dist = zeros
    l_pdf = zeros
    l_emission = Vec3(zeros, zeros, zeros)
    valid = jnp.zeros_like(hit)

    if n_sphere_lights > 0:
        sel_s = jnp.clip(selected, 0, n_sphere_lights - 1)
        is_sphere_sel = selected < n_sphere_lights
        # packed [L, 8] light table (prim id, center, r^2, emission) — built
        # from loop-invariant scene fields, hoisted out of the bounce loop;
        # ONE gather serves the whole sphere-light NEE stage (ops/gather.py)
        sl = scene.lights
        s_mid = scene.spheres.material_id[sl]
        light_tbl = fast_gather.pack_table(
            sl,
            scene.spheres.center.x[sl],
            scene.spheres.center.y[sl],
            scene.spheres.center.z[sl],
            scene.spheres.radius_sq[sl],
            scene.materials.emission.x[s_mid],
            scene.materials.emission.y[s_mid],
            scene.materials.emission.z[s_mid],
        )
        lrow = fast_gather.gather_rows(light_tbl, sel_s)
        light_prim = lrow[:, 0].astype(jnp.int32)
        lc = Vec3(lrow[:, 1], lrow[:, 2], lrow[:, 3])
        lr_sq = lrow[:, 4]
        em_s = Vec3(lrow[:, 5], lrow[:, 6], lrow[:, 7])
        wc = lc - p_offset
        center_dist2 = wc.dot(wc)
        ok = (
            hit
            & is_sphere_sel
            & ~((~is_tri) & (light_prim == prim_id))  # self (Renderer.hpp:263)
            & (center_dist2 > lr_sq)  # inside sphere (:266)
        )
        center_dist = jnp.sqrt(center_dist2)
        wc = wc * (1.0 / jnp.maximum(center_dist, 1e-20))
        sin_theta_max2 = lr_sq / jnp.maximum(center_dist2, 1e-20)
        # entire cone below hemisphere (:270-273)
        n_dot_w = sampling.to_local(t_quat, wc).z
        ok = ok & ~((n_dot_w < 0.0) & (sin_theta_max2 < n_dot_w * n_dot_w))
        dir_s, dist_s, pdf_s = sampling.sample_direction_to_sphere(
            wc, sin_theta_max2, center_dist, lr_sq, t_draw, s_draw
        )
        l_dir = dir_s.where(ok, l_dir)
        l_dist = jnp.where(ok, dist_s, l_dist)
        l_pdf = jnp.where(ok, pdf_s, l_pdf)
        l_emission = em_s.where(ok, l_emission)
        valid = valid | ok

    if n_tri_lights > 0:
        sel_t = jnp.clip(selected - n_sphere_lights, 0, n_tri_lights - 1)
        is_tri_sel = selected >= n_sphere_lights
        tri = scene.triangles
        # packed [L2, 17] tri-light table (idx, v0, e1, e2, n, area, em) —
        # loop-invariant; one gather replaces 14 column gathers
        tl = scene.tri_lights
        t_mid = tri.material_id[tl]
        tri_tbl = fast_gather.pack_table(
            tl,
            tri.v0.x[tl], tri.v0.y[tl], tri.v0.z[tl],
            tri.e1.x[tl], tri.e1.y[tl], tri.e1.z[tl],
            tri.e2.x[tl], tri.e2.y[tl], tri.e2.z[tl],
            tri.normal.x[tl], tri.normal.y[tl], tri.normal.z[tl],
            tri.area[tl],
            scene.materials.emission.x[t_mid],
            scene.materials.emission.y[t_mid],
            scene.materials.emission.z[t_mid],
        )
        trow = fast_gather.gather_rows(tri_tbl, sel_t)
        light_tri = trow[:, 0].astype(jnp.int32)
        v0 = Vec3(trow[:, 1], trow[:, 2], trow[:, 3])
        e1 = Vec3(trow[:, 4], trow[:, 5], trow[:, 6])
        e2 = Vec3(trow[:, 7], trow[:, 8], trow[:, 9])
        ln = Vec3(trow[:, 10], trow[:, 11], trow[:, 12])
        area = trow[:, 13]
        em_t = Vec3(trow[:, 14], trow[:, 15], trow[:, 16])
        # uniform point on triangle via sqrt warp
        su = jnp.sqrt(jnp.maximum(t_draw, 0.0))
        pt = v0 + e1 * (su * (1.0 - s_draw)) + e2 * (su * s_draw)
        to_light = pt - p_offset
        dist2 = to_light.dot(to_light)
        dist = jnp.sqrt(jnp.maximum(dist2, 1e-20))
        dir_t = to_light * (1.0 / dist)
        cos_light = jnp.abs(dir_t.dot(ln))
        pdf_t = dist2 / jnp.maximum(area * cos_light, 1e-9)
        ok = (
            hit
            & is_tri_sel
            & ~(is_tri & (light_tri == prim_id))
            & (cos_light > 1e-6)
        )
        l_dir = dir_t.where(ok, l_dir)
        l_dist = jnp.where(ok, dist - jnp.maximum(1e-4, dist * 3e-5), l_dist)
        l_pdf = jnp.where(ok, pdf_t, l_pdf)
        l_emission = em_t.where(ok, l_emission)
        valid = valid | ok

    l_local = sampling.to_local(t_quat, l_dir)
    valid = valid & (l_local.z >= 0.0)  # sample below hemisphere (:276)
    shadow_radiance = (
        l_emission
        * state.throughput
        * _closure_eval(policy, mat, l_local, v_local)
    )
    if ris_w is not None:
        # RIS estimator: f / cone_pdf * W; no MIS (NEE carries direct light
        # alone in this mode — see _emissive_hit)
        shadow_radiance = shadow_radiance * (
            ris_w / jnp.maximum(l_pdf, 1e-9)
        )
    else:
        l_pdf = l_pdf * light_selection_pdf  # (:282)
        brdf_pdf = _closure_pdf(policy, mat, l_local, v_local)
        shadow_radiance = shadow_radiance * sampling.power_heuristic_over_f(
            l_pdf, brdf_pdf
        )
    valid = valid & (shadow_radiance.max_component() > 0.0)  # (:285)

    # Shadow trace (Renderer.hpp:302-314). Masked-out lanes get tfar=0 so the
    # any-hit test can never mark them occluded (result unused anyway).
    occluded = intersect.occluded_scene(
        scene, p_offset, l_dir, jnp.where(valid, l_dist, 0.0),
        accel=policy.effective_accel, policy=policy,
    )
    contribution = shadow_radiance.where(valid & ~occluded, Vec3.zeros(zeros.shape))
    return contribution, valid, restir_out


def _emissive_hit(
    scene: Scene,
    policy: RendererPolicy,
    state: PathState,
    hit,
    prim_id,
    is_tri,
    mat_id,
    tfar,
    v_local: Vec3,
    em: Vec3 = None,
    prim_extra: dict = None,
):
    """Emissive-primitive hit with MIS (Renderer.hpp:319-353). Distance to
    the light center is recovered with the law-of-cosines trick (:328-332)
    so the previous ray origin isn't needed. `em` / `prim_extra` carry the
    already-gathered material emission and per-prim radius_sq/area from the
    closest-hit stage (one packed gather serves all stages)."""
    if em is None:
        em = scene.materials.emission.gather(mat_id)
    is_emissive = hit & (em.max_component() > FLT_EPSILON)
    n_sphere_lights = int(scene.lights.shape[0])
    n_tri_lights = 0 if scene.tri_lights is None else int(scene.tri_lights.shape[0])
    light_count = n_sphere_lights + n_tri_lights
    if policy.light_sampling in ("ris", "restir") and light_count > 1:
        # NEE-only direct lighting: BRDF-sampled emission would double-count
        # except where NEE cannot reach (camera hits, delta bounces)
        weight = jnp.where(
            (state.bounce == 0) | state.prev_delta, 1.0, 0.0
        )
    elif not policy.mis or light_count == 0:
        weight = jnp.ones_like(tfar)
    else:
        light_selection_pdf = _hit_light_selection_pdf(
            scene, policy, state, prim_id, is_tri, light_count
        )
        if prim_extra is not None:
            radius2 = prim_extra["radius_sq"]
        else:
            safe_sphere = jnp.maximum(jnp.where(is_tri, 0, prim_id), 0)
            radius2 = scene.spheres.radius_sq[safe_sphere]
        n_dot_v = v_local.z
        center_dist2 = tfar * (tfar + n_dot_v * (2.0 * jnp.sqrt(radius2))) + radius2
        light_pdf = light_selection_pdf * sampling.sphere_pdf(
            radius2, jnp.maximum(center_dist2, 1e-20)
        )
        if n_tri_lights > 0:
            if prim_extra is not None and "area" in prim_extra:
                area = prim_extra["area"]
            else:
                safe_tri = jnp.maximum(jnp.where(is_tri, prim_id, 0), 0)
                area = scene.triangles.area[safe_tri]
            cos_light = jnp.abs(n_dot_v)  # |cos| at the light == local view z
            tri_pdf = light_selection_pdf * (tfar * tfar) / jnp.maximum(
                area * cos_light, 1e-9
            )
            light_pdf = jnp.where(is_tri, tri_pdf, light_pdf)
        mis_weight = sampling.power_heuristic(state.prev_pdf, light_pdf)
        # delta previous bounce: light sampling could never have produced
        # this direction -> no MIS discount
        mis_weight = jnp.where(state.prev_delta, 1.0, mis_weight)
        # bounce 0 was BRDF-blind: add emission unweighted (:344-353)
        weight = jnp.where(state.bounce > 0, mis_weight, 1.0)
    contribution = (state.throughput * em) * weight
    zero = Vec3.zeros(tfar.shape)
    return contribution.where(is_emissive, zero)


def _pvary_to(a, vma_axes):
    """Mark `a` device-varying along any of `vma_axes` it lacks. Freshly
    created constants (jnp.zeros etc.) are replicated under
    shard_map(check_vma=True); mixing them with varying operands trips the
    vma type-check, so shard-local code paths cast them first. No-op
    outside shard_map."""
    if not vma_axes:
        return a
    have = getattr(jax.typeof(a), "vma", frozenset())
    missing = tuple(ax for ax in vma_axes if ax not in have)
    if not missing:
        return a
    if hasattr(jax.lax, "pcast"):
        return jax.lax.pcast(a, missing, to="varying")
    return jax.lax.pvary(a, missing)


def _pack_f32_cols(arrs):
    """Stack same-length 1-D arrays of mixed dtype into one [R, F] f32
    matrix (u32/i32 bitcast, bool widened). TPU moves indexed ROWS at full
    bandwidth but flat 1-D gathers/scatters near one element per cycle —
    packing turns F slow ops into one fast one. Returns (matrix, spec) for
    _unpack_f32_cols."""
    cols, spec = [], []
    for a in arrs:
        if a.dtype == jnp.float32:
            cols.append(a)
            spec.append("f32")
        elif a.dtype == jnp.bool_:
            cols.append(a.astype(jnp.float32))
            spec.append("bool")
        else:
            cols.append(jax.lax.bitcast_convert_type(a, jnp.float32))
            spec.append(a.dtype)
    return jnp.stack(cols, axis=1), spec


def _unpack_f32_cols(mat, spec):
    out = []
    for i, s in enumerate(spec):
        c = mat[:, i]
        if s == "f32":
            out.append(c)
        elif s == "bool":
            out.append(c > 0.5)
        else:
            out.append(jax.lax.bitcast_convert_type(c, s))
    return out


def trace_rays(
    scene: Scene,
    policy: RendererPolicy,
    accumulation,
    seeds,
    p0: Vec3,
    d0: Vec3,
    vma_axes: tuple = (),
    res_in=None,
    alive0=None,
    restir_xy=None,
    restir_geom=None,
) -> Vec3:
    """Run the full bounce loop for a batch of primary rays; returns per-ray
    radiance (plus, when `res_in` reservoirs are given for
    light_sampling='restir', the updated reservoirs). This is the body the
    reference runs per 256-ray tile stream (Renderer.hpp:131-432),
    expressed as one masked while_loop; for ReSTIR the primary bounce is
    peeled out of the loop so reservoir reuse touches only bounce 0."""
    shape = p0.x.shape
    # derive init arrays from the ray inputs so they inherit device-varying
    # status under shard_map (required for while_loop carry type stability)
    zero = p0.x * 0.0
    one = zero + 1.0
    init = PathState(
        bounce=jnp.int32(0),
        p=p0,
        d=d0,
        throughput=Vec3(one, one, one),
        radiance=Vec3(zero, zero, zero),
        prev_pdf=zero,
        prev_delta=zero > 1.0,
        # alive0 masks chunk-padding lanes dead from bounce 0: they cost
        # nothing (the planner and narrowing skip dead lanes) and stay out
        # of the useful-ray counter
        alive=(zero < 1.0) if alive0 is None else alive0 & (zero < 1.0),
        ray_count=jnp.uint32(0),
    )
    if vma_axes:
        # under shard_map the carry must be device-varying from the start
        # (replicated scene constants would otherwise flip the carry type
        # mid-loop); pcast marks each leaf varying along any axes it lacks.
        init = jax.tree.map(lambda a: _pvary_to(a, vma_axes), init)

    # Primary-bounce accel override (policy.primary_accel): camera rays are
    # screen-tile coherent, so tile-culled traversal can win at bounce 0
    # even in scenes whose incoherent bounces favor the dense battery.
    # Peeling one bounce_step out of the while_loop is bit-exact — every
    # accel backend returns identical hits and the RNG schedule is keyed by
    # state.bounce, not loop position.
    pol0 = policy
    if (policy.primary_accel
            and policy.primary_accel != policy.effective_accel):
        import dataclasses as _dc
        pol0 = _dc.replace(policy, accel=policy.primary_accel,
                           use_bvh=False)

    res_out = None
    if res_in is not None and policy.light_sampling == "restir":
        # peel the primary bounce: reservoir merge/reuse happens here only
        init, res_out = bounce_step(
            scene, pol0, accumulation, seeds, init, restir_in=res_in,
            restir_xy=restir_xy, restir_geom=restir_geom,
        )
    elif pol0 is not policy:
        init = bounce_step(scene, pol0, accumulation, seeds, init)

    def cond(state: PathState):
        return (state.bounce < policy.max_bounces) & jnp.any(state.alive)

    def body(state: PathState) -> PathState:
        return bounce_step(scene, policy, accumulation, seeds, state)

    # Narrowing cascade: run full-width masked bounces until the live count
    # fits 1/f of the launch width, then compact alive rays to the front
    # (stable: survivors keep their screen-tile order, so traversal-tile
    # coherence survives) and continue on the narrow array; repeat per
    # stage. The reference compacts EVERY bounce (Renderer.hpp:357-404,
    # 431); here one gather per stage replaces per-bounce scatters.
    caps = []
    nw = policy.narrow_wavefront
    if nw == "auto":
        nprims = int(scene.spheres.center.x.shape[0]) if scene.spheres else 0
        if scene.triangles is not None:
            nprims += int(scene.triangles.v0.x.shape[0])
        # engage only when the per-ray bounce cost is high enough to beat
        # the compaction overhead: measured on v5e, 1k-sphere brute 42->28
        # ms/pass and 20k-tri pallas 184->~90 ms/pass WIN, while the
        # 9-sphere DoF scene at 1080p LOSES 22->110 ms/pass on pure
        # overhead (cumsum/scatter/gather chains per chunk).
        nw = nprims >= 64 or policy.effective_accel == "pallas"
    
    if nw:
        # Under shard_map this runs per shard: `shape` is the LOCAL lane
        # count, the alive sums/cumsums are shard-local, and the compaction
        # scatter/gather never crosses devices — each shard narrows its own
        # wavefront independently (no collectives, so divergent per-shard
        # while_loop trip counts are safe in SPMD).
        num_rays = shape[0]
        for f in policy.narrow_factors:
            cap = -(-(num_rays // f) // 2048) * 2048
            if 0 < cap < (caps[-1] if caps else num_rays):
                caps.append(cap)
    if caps:
        cur, cur_seeds, cur_acc = init, seeds, accumulation
        restores = []
        for cap in caps:
            def cond_s(state: PathState, cap=cap):
                return (state.bounce < policy.max_bounces) & (
                    jnp.sum(state.alive) > cap
                )

            def body_s(state: PathState, s=cur_seeds, a=cur_acc) -> PathState:
                return bounce_step(scene, policy, a, s, state)

            mid = jax.lax.while_loop(cond_s, body_s, cur)
            # Stable compaction rank: alive lanes first, survivors keep
            # their screen-tile order. The whole per-lane state moves in
            # ONE [R, F] row-scatter into the [cap, F] target (out-of-cap
            # rows drop) — flat [R] gathers/scatters on TPU run near one
            # element per cycle, so the previous per-leaf compaction (16
            # flat gathers + an order-building scatter) cost ~10 ms/pass
            # at 147k lanes where this packed form is ~0.5 ms.
            ai = mid.alive.astype(jnp.int32)
            n_alive = jnp.sum(ai)
            inv = jnp.where(
                mid.alive,
                jnp.cumsum(ai) - 1,
                n_alive + jnp.cumsum(1 - ai) - 1,
            ).astype(jnp.int32)
            lanes = [
                mid.p.x, mid.p.y, mid.p.z,
                mid.d.x, mid.d.y, mid.d.z,
                mid.throughput.x, mid.throughput.y, mid.throughput.z,
                mid.radiance.x, mid.radiance.y, mid.radiance.z,
                mid.prev_pdf, mid.prev_delta, mid.alive, cur_seeds,
            ]
            if getattr(cur_acc, "ndim", 0) >= 1:
                # per-lane accumulation indices (render_pass k_passes > 1)
                # narrow together with the lanes they key
                lanes.append(cur_acc)
            mat, spec = _pack_f32_cols(lanes)
            comp = _pvary_to(
                jnp.zeros((cap, mat.shape[1]), jnp.float32), vma_axes
            ).at[inv].set(mat, mode="drop", unique_indices=True)
            vals = _unpack_f32_cols(comp, spec)
            cur = PathState(
                bounce=mid.bounce,
                p=Vec3(*vals[0:3]),
                d=Vec3(*vals[3:6]),
                throughput=Vec3(*vals[6:9]),
                radiance=Vec3(*vals[9:12]),
                prev_pdf=vals[12],
                prev_delta=vals[13],
                alive=vals[14],
                ray_count=mid.ray_count,
            )
            cur_seeds = vals[15]
            if getattr(cur_acc, "ndim", 0) >= 1:
                cur_acc = vals[16]
            restores.append((inv, cap, mid.radiance))

        def body_f(state: PathState) -> PathState:
            return bounce_step(scene, policy, cur_acc, cur_seeds, state)

        fin = jax.lax.while_loop(cond, body_f, cur)
        radiance = fin.radiance
        for inv, cap, prev_rad in reversed(restores):
            # expand back: lane i was compacted to narrow row inv[i] (when
            # inv[i] < cap) — read its final radiance from there with one
            # [R, 3] row-gather; dropped lanes keep their full-width value.
            # Identical to the old prev.at[order[:cap]].set(narrow).
            nmat = jnp.stack([radiance.x, radiance.y, radiance.z], axis=1)
            back = nmat[jnp.minimum(inv, cap - 1)]
            live = inv < cap
            radiance = Vec3(
                jnp.where(live, back[:, 0], prev_rad.x),
                jnp.where(live, back[:, 1], prev_rad.y),
                jnp.where(live, back[:, 2], prev_rad.z),
            )
        if res_in is not None:
            return radiance, fin.ray_count, res_out
        return radiance, fin.ray_count

    final = jax.lax.while_loop(cond, body, init)
    if res_in is not None:
        return final.radiance, final.ray_count, res_out
    return final.radiance, final.ray_count


def bounce_step(scene, policy, accumulation, seeds, state: PathState,
                restir_in=None, restir_xy=None, restir_geom=None):
    """One wavefront bounce — the loop body of Renderer::Accumulate's bounce
    loop (Renderer.hpp:131-432). `state.bounce` may be a scalar (uniform
    wavefront, trace_rays) or a per-lane vector (pooled wavefront with ray
    regeneration, wavefront_pool.py): the RNG site schedule and all masks
    broadcast either way."""
    if True:
        # ---- INTERSECTION (Renderer.hpp:165) ----
        with jax.named_scope("intersect"):
            tfar, prim_id, is_tri = intersect.intersect_scene(
                scene, state.p, state.d, accel=policy.effective_accel,
                alive=state.alive, policy=policy,
            )
        hit = state.alive & (prim_id >= 0)
        miss = state.alive & (prim_id < 0)

        # ---- CLOSEST HIT (:169-214) ----
        with jax.named_scope("closest_hit"):
            p_offset, n, t_quat, v_local, mat_id, backface, hit_pt, prim_extra = (
                _closest_hit_frame(scene, state, tfar, prim_id, is_tri)
            )
        # one packed gather for every material attribute this bounce touches
        # (emission included — _emissive_hit reads it from `mat`)
        mt = scene.materials
        mat_cols = [
            mt.albedo.x, mt.albedo.y, mt.albedo.z,
            mt.f0.x, mt.f0.y, mt.f0.z,
            mt.emission.x, mt.emission.y, mt.emission.z,
            mt.roughness,
        ]
        if policy.brdf == "principled":
            mat_cols += [
                mt.transmission.x, mt.transmission.y, mt.transmission.z,
                mt.ior_minus_one,
            ]
        # F80 grazing color: only the specular closures read it, and only
        # when policy.shade_f80 (the reference declares but never shades it,
        # Primitives.hpp:22 — shade_f80=False reproduces that).
        shade_f80 = policy.shade_f80 and policy.brdf in ("ggx", "principled")
        if shade_f80:
            mat_cols += [mt.f80.x, mt.f80.y, mt.f80.z]
        mv = fast_gather.gather_cols(mat_id, *mat_cols)
        rough = mv[9]
        mat = {
            "albedo": Vec3(mv[0], mv[1], mv[2]),
            "f0": Vec3(mv[3], mv[4], mv[5]),
            "emission": Vec3(mv[6], mv[7], mv[8]),
            "alpha": rough * rough,
        }
        k = 10
        if policy.brdf == "principled":
            mat["transmission"] = Vec3(mv[10], mv[11], mv[12])
            mat["ior"] = mv[13] + 1.0
            k = 14
        if shade_f80:
            mat["f80"] = Vec3(mv[k], mv[k + 1], mv[k + 2])

        radiance = state.radiance

        # ---- NEE + SHADOW (:247-314) ----
        shadow_traced = jnp.zeros_like(hit)
        restir_out = None
        if policy.mis:
            with jax.named_scope("nee_shadow"):
                nee, shadow_traced, restir_out = _next_event_estimation(
                    scene, policy, state, accumulation, seeds, hit, prim_id,
                    is_tri, p_offset, t_quat, v_local, mat,
                    restir_in=restir_in,
                    restir_xy=restir_xy,
                    restir_geom=restir_geom,
                    restir_guides=(
                        (n, tfar) if restir_in is not None else None
                    ),
                )
                radiance = radiance + nee

        # ---- EMISSIVE HIT (:319-353) ----
        with jax.named_scope("emissive_hit"):
            radiance = radiance + _emissive_hit(
                scene, policy, state, hit, prim_id, is_tri, mat_id, tfar,
                v_local, em=mat["emission"], prim_extra=prim_extra,
            )

        # ---- BRDF SAMPLE + RUSSIAN ROULETTE (:357-404) ----
        site = _site_state(
            accumulation,
            seeds + jnp.uint32(2) * state.bounce.astype(jnp.uint32) + jnp.uint32(1),
            policy,
        )
        if policy.brdf == "principled":
            # draw order: lobe, u, v, fresnel, rr
            site, (lobe_draw, u_draw, v_draw, fres_draw, rr_draw) = rng.draws(site, 5)
            psample = closures.principled_sample(
                mat["albedo"], mat["f0"], mat["transmission"], mat["alpha"],
                mat["ior"], ~backface, v_local, lobe_draw, u_draw, v_draw,
                fres_draw, mat.get("f80"),
            )
            bsdf_dir, bsdf_est = psample.direction, psample.estimator
            bsdf_delta = psample.is_delta
        else:
            site, (u_draw, v_draw, rr_draw) = rng.draws(site, 3)
            if policy.brdf == "lambertian":
                bs = closures.lambert_sample(mat["albedo"], v_local, u_draw, v_draw)
            else:
                bs = closures.ggx_sample(
                    mat["f0"], mat["alpha"], v_local, u_draw, v_draw,
                    mat.get("f80"),
                )
            bsdf_dir, bsdf_est = bs.direction, bs.estimator
            bsdf_delta = jnp.zeros_like(hit)
        new_throughput = state.throughput * bsdf_est
        if policy.russian_roulette:
            q = 1.0 - new_throughput.max_component()
            rr_kill = rr_draw < q
            new_throughput = new_throughput * (
                1.0 / jnp.maximum(FLT_EPSILON, 1.0 - q)
            )
        else:
            rr_kill = jnp.zeros_like(hit)
        world_dir = sampling.to_world(t_quat, bsdf_dir)
        # pdf of the sampled direction, stored for next-bounce MIS. The
        # reference evaluates the closure pdf *after* the world transform
        # (Renderer.hpp:386,401) — a frame mixup; we evaluate in local frame.
        next_pdf = _closure_pdf(policy, mat, bsdf_dir, v_local)
        if policy.brdf == "principled":
            # transmitted rays continue BELOW the surface: mirror the
            # (scale-aware) offset to the other side of the surface
            below = bsdf_dir.z < 0.0
            p_below = hit_pt - (p_offset - hit_pt)
            p_next_origin = p_below.where(below, p_offset)
        else:
            p_next_origin = p_offset

        # ---- MISS / SKY (:408-420) ----
        sky = scene.sky.sample(state.d)
        thr = state.throughput
        if policy.sky_bug_compat:
            # reference bug: all channels scaled by throughput.r (:416-418)
            sky_contrib = Vec3(thr.x * sky.x, thr.x * sky.y, thr.x * sky.z)
        else:
            sky_contrib = thr * sky
        sky_on = miss & scene.sky.has_ambient()
        zero3 = Vec3(
            jnp.zeros_like(radiance.x),
            jnp.zeros_like(radiance.y),
            jnp.zeros_like(radiance.z),
        )
        radiance = radiance + sky_contrib.where(sky_on, zero3)

        # per-lane bounce cap (scalar bounce: equivalent to the loop bound)
        alive_next = hit & ~rr_kill & (state.bounce + 1 < policy.max_bounces)
        rays_this_bounce = (
            jnp.sum(state.alive.astype(jnp.uint32))
            + jnp.sum(shadow_traced.astype(jnp.uint32))
        )
        out = PathState(
            bounce=state.bounce + 1,
            p=p_next_origin.where(alive_next, state.p),
            d=world_dir.where(alive_next, state.d),
            throughput=new_throughput.where(alive_next, state.throughput),
            radiance=radiance,
            prev_pdf=jnp.where(alive_next, next_pdf, state.prev_pdf),
            prev_delta=jnp.where(alive_next, bsdf_delta, state.prev_delta),
            alive=alive_next,
            ray_count=state.ray_count + rays_this_bounce,
        )
        if restir_in is not None:
            return out, restir_out
        return out


@functools.lru_cache(maxsize=32)
def _tile_pixel_order_np(width: int, npix: int, tile: int = 16):
    """Static position->pixel permutation visiting 16x16 screen tiles in
    raster order, raster within each tile — the reference's tile
    decomposition (Renderer.hpp:75) as a ray-processing ORDER. Each
    traversal-kernel tile of 256 rays then covers one compact screen block,
    so bounce origins cluster tightly in world space and tile-level culling
    survives past the primary hit. Returns None when the flat range is not
    a whole number of scanlines (odd shard slices fall back to raster)."""
    if npix % width:
        return None
    height = npix // width
    xs = np.arange(npix, dtype=np.int64) % width
    ys = np.arange(npix, dtype=np.int64) // width
    tiles_x = -(-width // tile)
    key = ((ys // tile) * tiles_x + (xs // tile)) * (tile * tile) \
        + (ys % tile) * tile + (xs % tile)
    return np.argsort(key, kind="stable").astype(np.uint32)


def tile_pixel_order(width: int, npix: int, tile: int = 16):
    perm = _tile_pixel_order_np(width, npix, tile)
    return None if perm is None else jnp.asarray(perm)


def render_pass(
    scene: Scene,
    policy: RendererPolicy,
    accumulation,
    width: int,
    height: int,
    pixel_start=0,
    npix: int = None,
    vma_axes: tuple = (),
    restir_in=None,
    k_passes: int = 1,
) -> Vec3:
    """One progressive sample for a contiguous flat-pixel range: returns
    radiance Vec3 with [npix] flat arrays (row 0 = bottom scanline, as in
    the reference's y-up pixel addressing). `pixel_start` may be a traced
    scalar — this is how shard_map gives each device its pixel slice while
    keeping seeds identical to a single-device render.

    Rays are processed in `policy.rays_per_chunk` microbatches via lax.map —
    the HBM-scale analog of the reference's 256-ray L1-resident tiles.

    `restir_in` ([3, npix] f32: light index (-1=empty), W, count — raster
    pixel order) enables ReSTIR temporal/spatial reuse when
    policy.light_sampling='restir'; the return becomes
    (flat, count, restir_out [3, npix]).

    `k_passes > 1` traces k consecutive accumulation passes as ONE wide
    wavefront (lane block i carries accumulation+i); each lane's radiance
    is bit-identical to the sequential pass that would have produced it —
    the counter RNG keys every draw by (accumulation, pixel), so batching
    passes only amortizes fixed per-op XLA overheads on small frames (the
    hero 256x256 frame is 65k lanes, ~6% of a VPU-saturating launch).
    Returns radiance as [k, npix] rows in that case."""
    if npix is None:
        npix = width * height
    spp = policy.samples_per_pixel
    per_pass = npix * spp
    nrays = per_pass * k_passes
    ray = jnp.arange(nrays, dtype=jnp.uint32)
    ray_order = policy.ray_order
    if ray_order == "auto":
        ray_order = (
            "tile"
            if "pallas" in (policy.effective_accel, policy.primary_accel)
            else "raster"
        )
    if ray_order == "tile":
        # pixel-block edge matched to the traversal-kernel tile: one kernel
        # tile of pallas_tile_rays rays covers one square screen block
        tr = policy.pallas_tile_rays
        edge = 16 if tr == "auto" else max(8, int(math.isqrt(max(tr, 64))))
        perm_np = _tile_pixel_order_np(width, npix, edge)
    else:
        perm_np = None
    perm = None if perm_np is None else jnp.asarray(perm_np)
    r_in_pass = ray % jnp.uint32(per_pass) if k_passes > 1 else ray
    pos = r_in_pass // jnp.uint32(spp)
    # NOTE: local stays a device gather (perm[pos]) even though the
    # permutation is static — baking it into a literal lets XLA
    # constant-fold the camera math with different FMA contraction,
    # breaking tile-vs-raster bit-identity (1-ULP radiance diffs, caught
    # by test_ray_order_bit_identical)
    local = perm[pos] if perm is not None else pos
    i = jnp.asarray(pixel_start, jnp.uint32) + local
    sample = r_in_pass % jnp.uint32(spp)
    x = (i % jnp.uint32(width)).astype(jnp.int32)
    y = (i // jnp.uint32(width)).astype(jnp.int32)
    seeds = pixel_seeds_from_index(i, width, policy, sample)
    accumulation = jnp.asarray(accumulation, jnp.uint32)
    acc_lane = (
        accumulation + ray // jnp.uint32(per_pass) if k_passes > 1 else None
    )

    chunk = min(policy.rays_per_chunk, nrays)
    padded = -(-nrays // chunk) * chunk

    def pad(a):
        return jnp.pad(a, (0, padded - nrays))

    use_restir = restir_in is not None and policy.light_sampling == "restir"
    assert not (use_restir and k_passes > 1), (
        "ReSTIR reservoirs chain sequentially across passes; k_passes must "
        "be 1 in restir mode"
    )
    restir_geom = None
    if use_restir:
        # reservoirs per ray position: gather the pixel's reservoir
        res_pos = (
            restir_in[0][local].astype(jnp.int32),
            pad(restir_in[1][local]).reshape(-1, chunk),
            pad(restir_in[2][local]).reshape(-1, chunk),
        )
        res_pos = (
            jnp.pad(res_pos[0], (0, padded - nrays), constant_values=-1
                    ).reshape(-1, chunk),
            res_pos[1],
            res_pos[2],
        )
        # LOCAL pixel coords per lane (shard-local raster decomposition of
        # `local`, matching the order key the 2-D spatial neighborhood
        # inverts — see _select_light_restir)
        loc32 = local.astype(jnp.int32)
        res_pos = res_pos + (
            pad(loc32 % jnp.int32(width)).reshape(-1, chunk),
            pad(loc32 // jnp.int32(width)).reshape(-1, chunk),
        )
        restir_geom = (
            ("tile", width, edge, spp) if perm is not None
            else ("raster", width, 0, spp)
        )
        if not policy.restir_spatial_2d:  # measured A/B: CONVERGENCE.md
            restir_geom = None
    # lane validity: 0 on the chunk-padding tail so padded lanes trace dead
    # (they'd otherwise duplicate pixel 0 at full cost and inflate ray_count)
    lane_ok = pad(jnp.ones((nrays,), jnp.float32)).reshape(-1, chunk)
    xs = (pad(x).reshape(-1, chunk), pad(y).reshape(-1, chunk),
          pad(seeds).reshape(-1, chunk), lane_ok)
    if use_restir:
        xs = xs + res_pos
    if acc_lane is not None:
        xs = xs + (pad(acc_lane).reshape(-1, chunk),)

    def chunk_fn(args):
        cx, cy, cseed, cok = args[:4]
        acc_arg = args[-1] if acc_lane is not None else accumulation
        p0, d0 = generate_camera_rays(
            scene.camera, cx, cy, acc_arg, cseed, policy.enable_dof, policy
        )
        res = tuple(args[4:7]) if use_restir else None
        rxy = (
            (args[7], args[8])
            if use_restir and policy.restir_spatial_2d else None
        )
        return trace_rays(scene, policy, acc_arg, cseed, p0, d0, vma_axes,
                          res_in=res, alive0=cok > 0,
                          restir_xy=rxy, restir_geom=restir_geom)

    res_flat = None
    if padded == chunk:
        out = chunk_fn(tuple(a[0] for a in xs))
        rad, count = out[0], jnp.asarray(out[1])
        flat = Vec3(rad.x[:nrays], rad.y[:nrays], rad.z[:nrays])
        if use_restir:
            res_flat = tuple(a[:nrays] for a in out[2])
    else:
        out = jax.lax.map(chunk_fn, xs)
        rad, counts = out[0], out[1]
        count = jnp.sum(counts)
        flat = Vec3(
            rad.x.reshape(-1)[:nrays],
            rad.y.reshape(-1)[:nrays],
            rad.z.reshape(-1)[:nrays],
        )
        if use_restir:
            res_flat = tuple(a.reshape(-1)[:nrays] for a in out[2])
    if policy.clamp_radiance:
        # live version of the reference's dormant max_radiance knob
        m = jnp.float32(policy.max_radiance)
        flat = Vec3(
            jnp.minimum(flat.x, m), jnp.minimum(flat.y, m), jnp.minimum(flat.z, m)
        )
    if spp > 1:
        # per-pixel sum over the spp samples of this pass; the resolve
        # divides by spp (estimator.resolve)
        flat = Vec3(
            flat.x.reshape(-1, spp).sum(axis=1),
            flat.y.reshape(-1, spp).sum(axis=1),
            flat.z.reshape(-1, spp).sum(axis=1),
        )
    if k_passes > 1:
        # [k, npix] rows, one per accumulation pass
        flat = Vec3(
            flat.x.reshape(k_passes, npix),
            flat.y.reshape(k_passes, npix),
            flat.z.reshape(k_passes, npix),
        )
    inv = None
    if perm is not None:
        # back to raster pixel order — one packed [npix, C] row-gather by
        # the static inverse permutation (three flat [npix] gathers cost
        # ~1 ms each at 147k on TPU; the row form is ~0.1 ms)
        inv = jnp.asarray(np.argsort(perm_np).astype(np.uint32))
        if k_passes > 1:
            m = jnp.concatenate(
                [flat.x.T, flat.y.T, flat.z.T], axis=1
            )[inv]  # [npix, 3k]
            k = k_passes
            flat = Vec3(m[:, :k].T, m[:, k:2 * k].T, m[:, 2 * k:].T)
        else:
            m = jnp.stack([flat.x, flat.y, flat.z], axis=1)[inv]
            flat = Vec3(m[:, 0], m[:, 1], m[:, 2])
    if use_restir:
        # reservoirs back to per-pixel raster order (first sample per pixel)
        rs = [a.reshape(npix, spp)[:, 0] if spp > 1 else a for a in res_flat]
        if inv is not None:
            rs = [a[inv] for a in rs]
        restir_out = jnp.stack(
            [rs[0].astype(jnp.float32), rs[1], rs[2]], axis=0
        )
        return flat, count, restir_out
    return flat, count

def render_pass_pixels(
    scene: Scene,
    policy: RendererPolicy,
    accumulation,
    width: int,
    pixel_ids,
    valid,
    vma_axes: tuple = (),
):
    """One progressive sample for an ARBITRARY pixel subset — the basis of
    per-pixel adaptive sample allocation (the reference always traces every
    pixel every pass, Renderer.hpp:75; here converged pixels can be skipped
    entirely). `pixel_ids` is a static-size [N] int32 list (pad with any id
    and set `valid`=False on padding — padded lanes trace as dead rays and
    contribute nothing). Seeds are keyed by (pixel, accumulation) exactly
    like the dense pass, so a pixel's n-th sample is identical no matter
    which subset schedule delivered it. Returns (radiance Vec3 [N], count).
    """
    ids = pixel_ids.astype(jnp.uint32)
    x = (ids % jnp.uint32(width)).astype(jnp.int32)
    y = (ids // jnp.uint32(width)).astype(jnp.int32)
    seeds = pixel_seeds_from_index(ids, width, policy)
    accumulation = jnp.asarray(accumulation, jnp.uint32)
    p0, d0 = generate_camera_rays(
        scene.camera, x, y, accumulation, seeds, policy.enable_dof, policy
    )
    # dead padding lanes: zero direction-degenerate rays would still
    # intersect; instead mark them dead from the start by moving the origin
    # far away and letting the alive mask kill them
    rad, count = _trace_rays_masked(
        scene, policy, accumulation, seeds, p0, d0, valid, vma_axes
    )
    return rad, count


def _trace_rays_masked(scene, policy, accumulation, seeds, p0, d0, alive0,
                       vma_axes: tuple = ()):
    """trace_rays variant whose initial alive mask can exclude lanes."""
    zero = p0.x * 0.0
    one = zero + 1.0
    init = PathState(
        bounce=jnp.int32(0),
        p=p0,
        d=d0,
        throughput=Vec3(one, one, one),
        radiance=Vec3(zero, zero, zero),
        prev_pdf=zero,
        prev_delta=zero > 1.0,
        alive=alive0 & (zero < 1.0),
        ray_count=jnp.uint32(0),
    )
    if vma_axes:
        # same carry-type alignment as trace_rays: under shard_map the
        # while_loop carry must be device-varying from the start
        def _pv(a):
            have = getattr(jax.typeof(a), "vma", frozenset())
            missing = tuple(ax for ax in vma_axes if ax not in have)
            if not missing:
                return a
            if hasattr(jax.lax, "pcast"):
                return jax.lax.pcast(a, missing, to="varying")
            return jax.lax.pvary(a, missing)

        init = jax.tree.map(_pv, init)

    def cond(state: PathState):
        return (state.bounce < policy.max_bounces) & jnp.any(state.alive)

    def body(state: PathState) -> PathState:
        return bounce_step(scene, policy, accumulation, seeds, state)

    final = jax.lax.while_loop(cond, body, init)
    return final.radiance, final.ray_count
