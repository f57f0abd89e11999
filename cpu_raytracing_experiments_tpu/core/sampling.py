"""Sampling & shading math — vectorized ports of /root/reference/Sampling.hpp.

Every function here is a pure elementwise map over full-width arrays, so XLA
vectorizes it directly onto the VPU; there is no per-ray control flow — all
the reference's branches become `jnp.where` selects (which is also how its
own AVX2 paths behaved across SIMD lanes).

Citations refer to /root/reference/Sampling.hpp unless noted.
"""
from __future__ import annotations

import jax.numpy as jnp

from .vec import Vec3, Quat

TWO_PI = 2.0 * jnp.pi
INV_PI = 1.0 / jnp.pi
INV_TWO_PI = 0.5 / jnp.pi


# ---------------------------------------------------------------------------
# Median networks (Sampling.hpp:8-21) — used by the median-of-means resolve.
# ---------------------------------------------------------------------------
def median3(a, b, c):
    return jnp.maximum(jnp.minimum(a, b), jnp.minimum(jnp.maximum(a, b), c))


def median5(a, b, c, d, e):
    return median3(
        jnp.maximum(jnp.minimum(a, b), jnp.minimum(c, d)),
        jnp.minimum(jnp.maximum(a, b), jnp.maximum(c, d)),
        e,
    )


# ---------------------------------------------------------------------------
# Mappings (Sampling.hpp:77-104)
# ---------------------------------------------------------------------------
def spherical_to_cartesian(phi_over_2pi, sin_theta, cos_theta) -> Vec3:
    phi = phi_over_2pi * TWO_PI
    return Vec3(sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta)


def polar_to_cartesian(phi_over_2pi, rho):
    phi = phi_over_2pi * TWO_PI
    return rho * jnp.cos(phi), rho * jnp.sin(phi)


def cosine_hemisphere(t, s) -> Vec3:
    """+Z-oriented cosine-weighted hemisphere (Sampling.hpp:92-94)."""
    return spherical_to_cartesian(s, jnp.sqrt(t), jnp.sqrt(jnp.maximum(0.0, 1.0 - t)))


def uniform_hemisphere(t, s) -> Vec3:
    return spherical_to_cartesian(s, jnp.sqrt(jnp.maximum(0.0, 1.0 - t * t)), t)


def uniform_sphere(t, s) -> Vec3:
    t = 1.0 - 2.0 * t
    return spherical_to_cartesian(s, jnp.sqrt(jnp.maximum(0.0, 1.0 - t * t)), t)


def disk(t, s):
    return polar_to_cartesian(s, jnp.sqrt(t))


# ---------------------------------------------------------------------------
# Tangent space (Sampling.hpp:108-187)
# ---------------------------------------------------------------------------
def orthogonal(v: Vec3) -> Vec3:
    """Non-normalized vector orthogonal to v (Sampling.hpp:112-114)."""
    use_x = jnp.abs(v.x) > jnp.abs(v.z)
    return Vec3(
        jnp.where(use_x, -v.y, 0.0),
        jnp.where(use_x, v.x, -v.z),
        jnp.where(use_x, 0.0, v.y),
    )


def orthonormal_basis(n: Vec3):
    """Branchless Pixar/Duff basis (Sampling.hpp:116-130). n must be unit."""
    sign = jnp.where(jnp.signbit(n.z), -1.0, 1.0).astype(jnp.float32)
    a = -1.0 / (sign + n.z)
    b = n.x * n.y * a
    v2 = Vec3(1.0 + sign * n.x * n.x * a, sign * b, -sign * n.x)
    v3 = Vec3(b, sign + a * n.y * n.y, -n.y)
    return v2, v3


def tangent_space(n: Vec3) -> Quat:
    """Quaternion rotating +Z to N, with q.z == 0 (Sampling.hpp:150-159).

    glm quat ctor order in the reference is {w, x, y, z}; we store (x,y,z,w).
    """
    degenerate = n.z < (-1.0 + 1.1920929e-7)
    s = jnp.sqrt(jnp.maximum(2.0 * (n.z + 1.0), 1e-30))
    invs = 1.0 / s
    return Quat(
        x=jnp.where(degenerate, 0.0, -n.y * invs),
        y=jnp.where(degenerate, 1.0, n.x * invs),
        z=jnp.zeros_like(n.z),
        w=jnp.where(degenerate, 0.0, s * 0.5),
    )


def to_local(t: Quat, v: Vec3) -> Vec3:
    """Rotate by conj(T) assuming T.z == 0 (Sampling.hpp:161-169)."""
    temp = 2.0 * (v.z * t.w + v.x * t.y - t.x * v.y)
    return Vec3(v.x - t.y * temp, v.y + t.x * temp, temp * t.w - v.z)


def to_world(t: Quat, v: Vec3) -> Vec3:
    """Rotate by T assuming T.z == 0 (Sampling.hpp:171-179)."""
    temp = 2.0 * (v.z * t.w - v.x * t.y + t.x * v.y)
    return Vec3(v.x + t.y * temp, v.y - t.x * temp, temp * t.w - v.z)


# ---------------------------------------------------------------------------
# Light sampling (Sampling.hpp:192-247)
# ---------------------------------------------------------------------------
def cone_pdf(cos_theta_max):
    return INV_TWO_PI / jnp.maximum(1e-6, 1.0 - cos_theta_max)


def sphere_pdf(radius_sq, dist_sq):
    sin_theta_max2 = radius_sq / dist_sq
    cos_theta_max = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin_theta_max2))
    return cone_pdf(cos_theta_max)


def sample_direction_to_sphere(wc: Vec3, sin_theta_max2, center_dist, radius_sq, t, s):
    """Cone-sample a direction toward a sphere light (Sampling.hpp:220-239).

    wc: unit vector to the sphere center. Returns (L, distance, pdf).
    Includes the reference's Taylor-series switch for tiny subtended angles
    and the 1e-5 shadow-epsilon pull-back on the distance.
    """
    cos_theta_max = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin_theta_max2))
    pdf = cone_pdf(cos_theta_max)
    small = sin_theta_max2 < 0.00068523
    cos_theta = 1.0 - t * (1.0 - cos_theta_max)
    sin_theta = jnp.sqrt(sin_theta_max2 * t)
    src_blend = jnp.where(small, sin_theta, cos_theta)
    invert = jnp.sqrt(jnp.maximum(0.0, 1.0 - src_blend * src_blend))
    cos_theta = jnp.where(small, invert, cos_theta)
    sin_theta = jnp.where(small, sin_theta, invert)
    temp = center_dist * sin_theta
    raw = center_dist * cos_theta - jnp.sqrt(
        jnp.maximum(0.0, radius_sq - temp * temp)
    )
    # shadow-epsilon pull-back: the reference subtracts a fixed 1e-5
    # (Sampling.hpp:231) which is below one float32 ulp beyond distance ~84
    # and lets the light sphere occlude its own shadow rays; scale-aware.
    distance = raw - jnp.maximum(1e-5, raw * 1e-5)
    l_local = spherical_to_cartesian(s, sin_theta, cos_theta)
    wc_x, wc_y = orthonormal_basis(wc)
    l = Vec3(
        wc_x.x * l_local.x + wc_y.x * l_local.y + wc.x * l_local.z,
        wc_x.y * l_local.x + wc_y.y * l_local.y + wc.y * l_local.z,
        wc_x.z * l_local.x + wc_y.z * l_local.y + wc.z * l_local.z,
    )
    return l, distance, pdf


def sample_direction_within_sphere(rel_center: Vec3, radius_sq, t, s):
    """Area-sample the sphere surface and convert to a solid-angle pdf —
    the reference's alternate (unused-in-render-loop) sphere-light sampler
    (Sampling.hpp:202-217).

    rel_center: light center minus shading point. Picks a uniform point on
    the surface (nudged just outside by the shadow epsilon), forms the
    direction L toward it, and converts the uniform area pdf 1/(4*pi*r^2)
    to solid-angle measure via dist^2 / |cos|. Because the whole surface is
    sampled (back faces included), each direction in the visible cone is
    covered twice: E[1/pdf] = 2 * subtended solid angle, and half the
    samples land on the far hemisphere — which is why the render loop uses
    the cone sampler (sample_direction_to_sphere) instead.
    Returns (L, distance, pdf).
    """
    n = uniform_sphere(t, s)
    radius = jnp.sqrt(radius_sq)
    to_p = rel_center + n * (radius + 1e-4)
    dist_sq = to_p.dot(to_p)
    dist = jnp.sqrt(dist_sq)
    l = to_p * (1.0 / dist)
    area = 2.0 * TWO_PI * radius_sq
    cos_a = jnp.abs(n.dot(l))
    pdf = dist_sq / jnp.maximum(1e-6, area * cos_a)
    return l, dist, pdf


def power_heuristic(f, g):
    f2 = f * f
    return f2 / jnp.maximum(1e-6, f2 + g * g)


def power_heuristic_over_f(f, g):
    return f / jnp.maximum(1e-6, f * f + g * g)


# ---------------------------------------------------------------------------
# Microfacet / GGX math (Sampling.hpp:252-309)
# ---------------------------------------------------------------------------
def distribution_visible_normals(v_local: Vec3, alpha, u, v) -> Vec3:
    """Heitz VNDF sampling of the GGX half-vector (Sampling.hpp:254-270)."""
    vv = Vec3(alpha * v_local.x, alpha * v_local.y, v_local.z).normalize()
    dx, dy = disk(u, v)
    t = 1.0 - dx * dx
    lerp_t = vv.z * 0.5 + 0.5
    dy = jnp.sqrt(jnp.maximum(0.0, t)) * (1.0 - lerp_t) + dy * lerp_t
    x_axis, y_axis = orthonormal_basis(vv)
    hz = jnp.sqrt(jnp.maximum(0.0, t - dy * dy))
    h = x_axis * dx + y_axis * dy + vv * hz
    return Vec3(alpha * h.x, alpha * h.y, jnp.maximum(0.0, h.z)).normalize()


def pow5(x):
    t = x * x
    t = t * t
    return x * t


def fresnel_schlick(f0: Vec3, h_dot_v, f80: Vec3 | None = None) -> Vec3:
    """Schlick Fresnel (Sampling.hpp:272-275), optionally two-point.

    With `f80` the grazing reflectance is the material's F80 color instead of
    white: F(theta) = lerp(f0, f80, (1-cos)^5). The reference declares F80 on
    its Material (/root/reference/Primitives.hpp:22) and its scenes set it,
    but no shader ever reads it; this consumes the field (policy.shade_f80).
    f80=None reproduces the classic single-point Schlick.
    """
    w = pow5(jnp.clip(1.0 - h_dot_v, 0.0, 1.0))
    if f80 is None:
        return f0 * (1.0 - w) + Vec3(w, w, w)
    return f0 * (1.0 - w) + f80 * w


def ggx_d(alpha2, n_dot_h2):
    temp = 1.0 + (alpha2 - 1.0) * n_dot_h2
    return alpha2 / (jnp.pi * temp * temp)


def smith_g2_lagarde(alpha2, n_dot_l, n_dot_v):
    """Height-correlated Smith G2 pre-divided by 4*NdotL*NdotV
    (Sampling.hpp:287-291)."""
    a = n_dot_v * jnp.sqrt(alpha2 + n_dot_l * (n_dot_l - alpha2 * n_dot_l))
    b = n_dot_l * jnp.sqrt(alpha2 + n_dot_v * (n_dot_v - alpha2 * n_dot_v))
    return 0.5 / jnp.maximum(a + b, 1e-20)


def microfacet_brdf(
    f0: Vec3, alpha, n_dot_v, n_dot_l, n_dot_h, h_dot_v, f80: Vec3 | None = None
) -> Vec3:
    """NdotL * F*D*G2/(4 NdotL NdotV) (Sampling.hpp:293-296)."""
    alpha2 = alpha * alpha
    scalar = (
        n_dot_l
        * ggx_d(jnp.maximum(1e-5, alpha2), n_dot_h * n_dot_h)
        * smith_g2_lagarde(alpha2, n_dot_l, n_dot_v)
    )
    return fresnel_schlick(f0, h_dot_v, f80) * scalar


def g1_ggx(alpha2, n_dot_s2):
    return 2.0 / (
        1.0 + jnp.sqrt(((alpha2 * (1.0 - n_dot_s2)) + n_dot_s2) / jnp.maximum(n_dot_s2, 1e-20))
    )


def smith_g2_over_g1(alpha2, n_dot_l, n_dot_v):
    g1v = g1_ggx(alpha2, n_dot_v * n_dot_v)
    g1l = g1_ggx(alpha2, n_dot_l * n_dot_l)
    return g1l / jnp.maximum(g1v + g1l - g1v * g1l, 1e-20)


def vndf_estimator(
    f0: Vec3, alpha, n_dot_v, n_dot_l, h_dot_v, f80: Vec3 | None = None
) -> Vec3:
    """F * G2/G1: the unbiased estimator of the VNDF-sampled GGX lobe
    (Sampling.hpp:307-309)."""
    return fresnel_schlick(f0, h_dot_v, f80) * smith_g2_over_g1(
        alpha * alpha, n_dot_l, n_dot_v
    )


def ggx_vndf_pdf(alpha, n_dot_v, n_dot_h, h_dot_v):
    """pdf of the reflected direction under VNDF sampling:
    D_vis(H)/(4 HdotV) = G1(V) * D(H) / (4 NdotV).

    The reference leaves this as a TODO returning 0
    (/root/reference/DataStreams.hpp:196-198); we implement it correctly so
    GGX participates in MIS.
    """
    alpha2 = alpha * alpha
    g1 = g1_ggx(jnp.maximum(1e-7, alpha2), n_dot_v * n_dot_v)
    d = ggx_d(jnp.maximum(1e-7, alpha2), n_dot_h * n_dot_h)
    return g1 * d / jnp.maximum(4.0 * n_dot_v, 1e-6)
