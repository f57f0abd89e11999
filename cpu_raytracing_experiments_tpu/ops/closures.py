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
def ggx_eval(
    f0: Vec3, alpha, l_local: Vec3, v_local: Vec3, f80: Vec3 | None = None
) -> Vec3:
    n_dot_l = jnp.maximum(0.0, l_local.z)
    n_dot_v = jnp.maximum(0.0, v_local.z)
    h = (l_local + v_local).normalize()
    n_dot_h = jnp.maximum(0.0, h.z)
    h_dot_v = jnp.maximum(0.0, h.dot(v_local))
    return sampling.microfacet_brdf(
        f0, alpha, n_dot_v, n_dot_l, n_dot_h, h_dot_v, f80
    )


def ggx_pdf(alpha, l_local: Vec3, v_local: Vec3) -> jnp.ndarray:
    n_dot_v = jnp.maximum(1e-6, v_local.z)
    h = (l_local + v_local).normalize()
    n_dot_h = jnp.maximum(0.0, h.z)
    h_dot_v = jnp.maximum(0.0, h.dot(v_local))
    pdf = sampling.ggx_vndf_pdf(alpha, n_dot_v, n_dot_h, h_dot_v)
    return jnp.where(l_local.z > 0.0, pdf, 0.0)


def ggx_sample(
    f0: Vec3, alpha, v_local: Vec3, u, v, f80: Vec3 | None = None
) -> BsdfSample:
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
    estimator = sampling.vndf_estimator(f0, alpha, n_dot_v, n_dot_l, h_dot_v, f80)
    return BsdfSample(direction=direction, estimator=estimator)


# ---------------------------------------------------------------------------
# Principled per-material BSDF: diffuse + GGX specular + refractive
# transmission.
#
# The reference's Material carries albedo/F0/F80/transmission/IOR
# (/root/reference/Primitives.hpp:18-27) and its scenes set them
# (Application.cpp:69-99), but the shipped BRDF=0 shader only reads albedo.
# This closure actually consumes them: per-ray stochastic lobe selection
# (importance-weighted), VNDF specular, Snell refraction with Schlick
# Fresnel and total-internal-reflection handling. Delta lobes (alpha == 0)
# are flagged so the integrator can bypass MIS weighting for them.
# ---------------------------------------------------------------------------
class PrincipledSample(NamedTuple):
    direction: Vec3  # local frame; z < 0 means transmitted below the surface
    estimator: Vec3  # throughput multiplier (premultiplied by 1/p_lobe)
    is_delta: jnp.ndarray  # bool: sampled a delta (mirror/smooth-glass) lobe


def _lobe_weights(albedo: Vec3, f0: Vec3, transmission: Vec3):
    w_d = albedo.max_component()
    w_s = f0.max_component()
    w_t = transmission.max_component()
    total = jnp.maximum(w_d + w_s + w_t, 1e-6)
    return w_d / total, w_s / total, w_t / total


def principled_eval(
    albedo, f0, transmission, alpha, l_local, v_local, f80: Vec3 | None = None
) -> Vec3:
    """Reflection-side eval for NEE: diffuse + rough specular. (Delta and
    transmission lobes never contribute to same-side direct light.)"""
    diff = lambert_eval(albedo, l_local, v_local)
    spec = ggx_eval(f0, alpha, l_local, v_local, f80)
    spec_on = (alpha > 0.0) & (f0.max_component() > 0.0)
    zero = Vec3(jnp.zeros_like(alpha), jnp.zeros_like(alpha), jnp.zeros_like(alpha))
    return diff + spec.where(spec_on, zero)


def principled_pdf(albedo, f0, transmission, alpha, l_local, v_local):
    """Solid-angle pdf of the reflection-side lobes, mixture-weighted."""
    w_d, w_s, _ = _lobe_weights(albedo, f0, transmission)
    pdf = w_d * lambert_pdf(l_local)
    spec_pdf = ggx_pdf(jnp.maximum(alpha, 1e-4), l_local, v_local)
    pdf = pdf + jnp.where(alpha > 0.0, w_s * spec_pdf, 0.0)
    return pdf


def _schlick_f0_from_ior(ior):
    r = (ior - 1.0) / (ior + 1.0)
    return r * r


def principled_sample(
    albedo: Vec3,
    f0: Vec3,
    transmission: Vec3,
    alpha,
    ior,
    entering,
    v_local: Vec3,
    r_lobe,
    u,
    v,
    r_fresnel,
    f80: Vec3 | None = None,
) -> PrincipledSample:
    """Stochastic-lobe sample. Draw order: lobe select, (u, v), fresnel."""
    w_d, w_s, w_t = _lobe_weights(albedo, f0, transmission)
    pick_d = r_lobe < w_d
    pick_s = (~pick_d) & (r_lobe < w_d + w_s)
    pick_t = (~pick_d) & (~pick_s)

    # --- diffuse lobe ---
    d_sample = lambert_sample(albedo, v_local, u, v)
    d_est = d_sample.estimator / jnp.maximum(w_d, 1e-6)

    # --- specular lobe ---
    s_sample = ggx_sample(f0, alpha, v_local, u, v, f80)
    s_est = s_sample.estimator / jnp.maximum(w_s, 1e-6)
    s_delta = alpha == 0.0

    # --- transmission lobe (GGX microfacet refraction) ---
    n_dot_v = jnp.maximum(1e-6, v_local.z)
    h = sampling.distribution_visible_normals(
        v_local, jnp.maximum(alpha, 1e-6), u, v
    )
    up = Vec3(jnp.zeros_like(alpha), jnp.zeros_like(alpha), jnp.ones_like(alpha))
    h = up.where(alpha == 0.0, h)
    c = jnp.maximum(h.dot(v_local), 1e-6)  # cos(H, V)
    eta = jnp.where(entering, 1.0 / ior, ior)
    k = 1.0 - eta * eta * (1.0 - c * c)
    tir = k < 0.0
    f = _schlick_f0_from_ior(ior) + (1.0 - _schlick_f0_from_ior(ior)) * sampling.pow5(
        jnp.clip(1.0 - c, 0.0, 1.0)
    )
    reflect_prob = jnp.where(tir, 1.0, f)
    do_reflect = r_fresnel < reflect_prob
    refl_dir = h * (2.0 * c) - v_local
    sqrt_k = jnp.sqrt(jnp.maximum(k, 0.0))
    refr_dir = Vec3(
        -eta * v_local.x + (eta * c - sqrt_k) * h.x,
        -eta * v_local.y + (eta * c - sqrt_k) * h.y,
        -eta * v_local.z + (eta * c - sqrt_k) * h.z,
    ).normalize()
    t_dir = refl_dir.where(do_reflect, refr_dir)
    # energy: refracted rays tinted by the transmission color; the
    # reflect/refract split is importance-sampled by F so it cancels.
    one = jnp.ones_like(alpha)
    white = Vec3(one, one, one)
    g2g1 = sampling.smith_g2_over_g1(
        alpha * alpha,
        jnp.abs(t_dir.z),
        n_dot_v,
    )
    shadowing = jnp.where(alpha > 0.0, g2g1, 1.0)
    t_base = white.where(do_reflect, transmission)
    t_est = t_base * (shadowing / jnp.maximum(w_t, 1e-6))
    t_delta = alpha == 0.0

    direction = d_sample.direction.where(
        pick_d, s_sample.direction.where(pick_s, t_dir)
    )
    estimator = d_est.where(pick_d, s_est.where(pick_s, t_est))
    is_delta = jnp.where(pick_d, False, jnp.where(pick_s, s_delta, t_delta))
    return PrincipledSample(direction=direction, estimator=estimator, is_delta=is_delta)
