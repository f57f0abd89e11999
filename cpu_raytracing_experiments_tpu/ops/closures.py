"""BRDF closures: Lambertian diffuse and GGX microfacet.

Vectorized ports of the type-tagged 64-byte closures in
/root/reference/DataStreams.hpp:130-219. On TPU there is no divergence
penalty, so the closure "type dispatch" (the reference's #define BRDF switch,
Renderer.hpp:70) is a static policy choice resolved at trace time; each
function maps elementwise over ray batches in tangent space (normal = +Z).

All directions are in the local tangent frame; `estimator` is
NdotL * brdf / pdf (premultiplied, as in the reference's Sample struct).

Unlike the reference, the GGX pdf is implemented (DataStreams.hpp:196-198 is
a TODO returning 0, which silently disables MIS for GGX there).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..core import sampling
from ..core.vec import Vec3

INV_PI = 1.0 / jnp.pi
FLT_EPSILON = 1.1920929e-7


class BsdfSample(NamedTuple):
    direction: Vec3  # local frame
    estimator: Vec3  # NdotL * brdf / pdf


# ---------------------------------------------------------------------------
# Lambertian (DataStreams.hpp:165-182)
# ---------------------------------------------------------------------------
def lambert_eval(albedo: Vec3, l_local: Vec3, v_local: Vec3) -> Vec3:
    n_dot_l = jnp.maximum(0.0, l_local.z)
    return albedo * (INV_PI * n_dot_l)


def lambert_pdf(l_local: Vec3) -> jnp.ndarray:
    return INV_PI * jnp.maximum(0.0, l_local.z)


def lambert_sample(albedo: Vec3, v_local: Vec3, u, v) -> BsdfSample:
    direction = sampling.cosine_hemisphere(u, v)
    return BsdfSample(direction=direction, estimator=albedo)


# ---------------------------------------------------------------------------
# GGX via VNDF sampling (DataStreams.hpp:184-218)
# ---------------------------------------------------------------------------
def ggx_eval(f0: Vec3, alpha, l_local: Vec3, v_local: Vec3) -> Vec3:
    n_dot_l = jnp.maximum(0.0, l_local.z)
    n_dot_v = jnp.maximum(0.0, v_local.z)
    h = (l_local + v_local).normalize()
    n_dot_h = jnp.maximum(0.0, h.z)
    h_dot_v = jnp.maximum(0.0, h.dot(v_local))
    return sampling.microfacet_brdf(f0, alpha, n_dot_v, n_dot_l, n_dot_h, h_dot_v)


def ggx_pdf(alpha, l_local: Vec3, v_local: Vec3) -> jnp.ndarray:
    n_dot_v = jnp.maximum(1e-6, v_local.z)
    h = (l_local + v_local).normalize()
    n_dot_h = jnp.maximum(0.0, h.z)
    h_dot_v = jnp.maximum(0.0, h.dot(v_local))
    pdf = sampling.ggx_vndf_pdf(alpha, n_dot_v, n_dot_h, h_dot_v)
    return jnp.where(l_local.z > 0.0, pdf, 0.0)


def ggx_sample(f0: Vec3, alpha, v_local: Vec3, u, v) -> BsdfSample:
    n_dot_v = jnp.maximum(0.0, v_local.z)
    # mirror special case at alpha == 0 (DataStreams.hpp:202-208)
    mirror_dir = Vec3(-v_local.x, -v_local.y, v_local.z)
    h = sampling.distribution_visible_normals(v_local, jnp.maximum(alpha, 1e-6), u, v)
    h_dot_v_raw = h.dot(v_local)
    rough_dir = h * (2.0 * h_dot_v_raw) - v_local
    is_mirror = alpha == 0.0
    direction = mirror_dir.where(is_mirror, rough_dir)
    h_dot_v = jnp.where(is_mirror, n_dot_v, jnp.maximum(0.0, h_dot_v_raw))
    n_dot_l = jnp.maximum(0.0, direction.z)
    estimator = sampling.vndf_estimator(f0, alpha, n_dot_v, n_dot_l, h_dot_v)
    return BsdfSample(direction=direction, estimator=estimator)
