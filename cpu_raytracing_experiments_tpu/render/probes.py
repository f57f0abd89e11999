"""Interactive probes & AOV (auxiliary output) rendering.

* `autofocus` — the reference's right-click depth-probe autofocus
  (/root/reference/Application.cpp:271-304): trace one centered ray through
  the clicked pixel, set camera.focus_distance to the hit distance (infinity
  on miss), and let the caller reset the accumulator.
* `render_aovs` — first-bounce depth/normal/albedo outputs; the reference
  has this behind `#if false` (Renderer.hpp:218-231); here it is a
  first-class debug/feature render.
"""
from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..core.vec import Vec3
from ..ops import intersect
from ..scene.scene import Scene
from ..utils.config import RendererPolicy
from . import renderer as _renderer


def probe_depth(scene: Scene, x: int, y: int, width: int, height: int):
    """Depth of the closest hit through pixel center (x, y) (y-up, like the
    reference's flipped mouse coordinates). Returns +inf on miss."""
    camera = scene.camera
    if float(camera.half_width) * 2 != width or float(camera.half_height) * 2 != height:
        camera = camera.resized(width, height)
    vx = jnp.asarray([x + 0.5], jnp.float32) - camera.half_width
    vy = jnp.asarray([y + 0.5], jnp.float32) - camera.half_height
    vz = jnp.broadcast_to(camera.z, (1,))
    d = camera.orient.rotate(Vec3(vx, vy, vz).normalize())
    p = Vec3(
        jnp.broadcast_to(camera.pos.x, (1,)),
        jnp.broadcast_to(camera.pos.y, (1,)),
        jnp.broadcast_to(camera.pos.z, (1,)),
    )
    tfar, prim_id, _ = intersect.intersect_scene(scene, p, d)
    hit = int(prim_id[0]) >= 0
    return float(tfar[0]) if hit else float("inf")


def autofocus(scene: Scene, x: int, y: int, width: int, height: int) -> Scene:
    """Set camera.focus_distance from a single-ray depth probe
    (Application.cpp:298). The caller should reset the accumulator, as the
    reference does (:299)."""
    dist = probe_depth(scene, x, y, width, height)
    camera = dataclasses.replace(scene.camera, focus_distance=jnp.float32(dist))
    return dataclasses.replace(scene, camera=camera)


def render_aovs(
    scene: Scene,
    policy: RendererPolicy,
    width: int,
    height: int,
    accumulation: int = 1,
    samples: int = 1,
) -> Dict[str, np.ndarray]:
    """First-bounce AOVs: depth [H,W], normal [H,W,3], albedo [H,W,3],
    prim_id [H,W]. Row 0 = top. With samples > 1, depth/normal/albedo are
    averaged over jittered camera samples (normals renormalized) — smoother
    denoiser guides on antialiased/DoF edges; prim_id/hit come from the
    first sample."""
    npix = width * height
    i = jnp.arange(npix, dtype=jnp.uint32)
    x = (i % jnp.uint32(width)).astype(jnp.int32)
    y = (i // jnp.uint32(width)).astype(jnp.int32)
    seeds = _renderer.pixel_seeds(width, height, policy)

    @jax.jit
    def one(scene, acc):
        p0, d0 = _renderer.generate_camera_rays(
            scene.camera, x, y, acc, seeds, policy.enable_dof, policy,
        )
        tfar, prim_id, is_tri = intersect.intersect_scene(
            scene, p0, d0, accel=policy.effective_accel
        )
        state = _renderer.PathState(
            bounce=jnp.int32(0), p=p0, d=d0,
            throughput=Vec3.ones((npix,)), radiance=Vec3.zeros((npix,)),
            prev_pdf=jnp.zeros((npix,)), prev_delta=jnp.zeros((npix,), bool),
            alive=jnp.ones((npix,), bool), ray_count=jnp.uint32(0),
        )
        _, n, _, _, mat_id, _, _, _ = _renderer._closest_hit_frame(
            scene, state, tfar, prim_id, is_tri
        )
        albedo = scene.materials.albedo.gather(mat_id)
        hit = prim_id >= 0
        depth = jnp.where(hit, tfar, jnp.inf)
        return (
            depth,
            jnp.stack([n.x, n.y, n.z], -1) * hit[:, None],
            jnp.stack([albedo.x, albedo.y, albedo.z], -1) * hit[:, None],
            prim_id,
        )

    depth, normal, albedo, prim_id = one(scene, jnp.uint32(accumulation))
    if samples > 1:
        hit0 = np.asarray(prim_id) >= 0
        d_sum = np.where(np.isfinite(np.asarray(depth)), np.asarray(depth), 0.0)
        d_cnt = np.isfinite(np.asarray(depth)).astype(np.float32)
        n_sum = np.asarray(normal).astype(np.float64)
        a_sum = np.asarray(albedo).astype(np.float64)
        for k in range(1, samples):
            dk, nk, ak, _ = one(scene, jnp.uint32(accumulation + k))
            dk = np.asarray(dk)
            fin = np.isfinite(dk)
            d_sum += np.where(fin, dk, 0.0)
            d_cnt += fin
            n_sum += np.asarray(nk)
            a_sum += np.asarray(ak)
        depth = np.where(d_cnt > 0, d_sum / np.maximum(d_cnt, 1), np.inf)
        norm = np.linalg.norm(n_sum, axis=-1, keepdims=True)
        normal = np.where(norm > 1e-6, n_sum / np.maximum(norm, 1e-6), 0.0)
        albedo = a_sum / samples
    flip = lambda a: np.asarray(a.reshape(height, width, *a.shape[1:]))[::-1]
    return {
        "depth": flip(depth),
        "normal": flip(normal),
        "albedo": flip(albedo),
        "prim_id": flip(prim_id),
    }
