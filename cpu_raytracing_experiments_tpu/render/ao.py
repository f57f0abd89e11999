"""Ambient-occlusion integrator — a second render mode on the same
wavefront machinery (no reference equivalent; its closest analog is the
disabled first-bounce debug output, Renderer.hpp:218-231).

One camera ray per pixel, then K cosine-weighted hemisphere probes with a
finite occlusion radius: AO = 1 - mean(occluded). Uses the same counter RNG
(deterministic), intersection backends, and chunking as the path tracer —
useful as a modeling/preview pass and as a denoiser guide.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core import rng, sampling
from ..core.vec import Vec3
from ..ops import intersect
from ..scene.scene import Scene
from ..utils.config import RendererPolicy
from . import renderer as _renderer


@partial(jax.jit, static_argnames=("policy", "width", "height", "samples"))
def _ao_pass(scene: Scene, policy: RendererPolicy, width: int, height: int,
             samples: int, radius):
    npix = width * height
    i = jnp.arange(npix, dtype=jnp.uint32)
    x = (i % jnp.uint32(width)).astype(jnp.int32)
    y = (i // jnp.uint32(width)).astype(jnp.int32)
    seeds = _renderer.pixel_seeds(width, height, policy)
    p0, d0 = _renderer.generate_camera_rays(
        scene.camera, x, y, jnp.uint32(1), seeds, False, policy
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
    p_off, n, t_quat, _, _, _, _, _ = _renderer._closest_hit_frame(
        scene, state, tfar, prim_id, is_tri
    )
    hit = prim_id >= 0

    def probe(k, acc):
        site = rng.hash_2d(jnp.uint32(2), seeds + jnp.uint32(k))
        site, (u, v) = rng.draws(site, 2)
        local = sampling.cosine_hemisphere(u, v)
        d = sampling.to_world(t_quat, local)
        occ = intersect.occluded_scene(
            scene, p_off, d, jnp.where(hit, radius, 0.0),
            accel=policy.effective_accel,
        )
        return acc + occ.astype(jnp.float32)

    occluded_count = jax.lax.fori_loop(0, samples, probe, jnp.zeros((npix,)))
    ao = jnp.where(hit, 1.0 - occluded_count / samples, 1.0)
    return ao.reshape(height, width)


def render_ao(
    scene: Scene,
    policy: RendererPolicy,
    width: int,
    height: int,
    samples: int = 32,
    radius: float = 1e3,
) -> np.ndarray:
    """AO image [H, W, 3] float32 in [0,1], row 0 = top."""
    ao = _ao_pass(scene, policy, width, height, samples, jnp.float32(radius))
    img = np.asarray(ao)[::-1]
    return np.repeat(img[..., None], 3, axis=-1)
