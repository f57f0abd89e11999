"""Unit tests for core/sampling.py against numpy oracles and analytic
properties (the reference has no tests; SURVEY.md §4 defines this pyramid)."""
import numpy as np
import jax.numpy as jnp

from cpu_raytracing_experiments_tpu.core import sampling
from cpu_raytracing_experiments_tpu.core.vec import Vec3


def _rand(n, seed=0):
    return np.random.default_rng(seed).uniform(0, 1, n).astype(np.float32)


def _rand_unit_vec(n, seed=0):
    g = np.random.default_rng(seed)
    v = g.normal(size=(n, 3)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return Vec3(jnp.asarray(v[:, 0]), jnp.asarray(v[:, 1]), jnp.asarray(v[:, 2]))


def test_median_networks():
    g = np.random.default_rng(1)
    a, b, c, d, e = [g.normal(size=1000).astype(np.float32) for _ in range(5)]
    m3 = np.asarray(sampling.median3(jnp.asarray(a), jnp.asarray(b), jnp.asarray(c)))
    np.testing.assert_allclose(m3, np.median(np.stack([a, b, c]), axis=0))
    m5 = np.asarray(sampling.median5(*[jnp.asarray(x) for x in (a, b, c, d, e)]))
    np.testing.assert_allclose(m5, np.median(np.stack([a, b, c, d, e]), axis=0))


def test_cosine_hemisphere_distribution():
    n = 200000
    t, s = jnp.asarray(_rand(n, 2)), jnp.asarray(_rand(n, 3))
    d = sampling.cosine_hemisphere(t, s)
    norm = np.asarray(d.length())
    np.testing.assert_allclose(norm, 1.0, atol=1e-5)
    z = np.asarray(d.z)
    assert (z >= 0).all()
    # E[cos(theta)] for pdf = cos/pi is 2/3
    assert abs(z.mean() - 2 / 3) < 0.005


def test_uniform_sphere_distribution():
    n = 200000
    d = sampling.uniform_sphere(jnp.asarray(_rand(n, 4)), jnp.asarray(_rand(n, 5)))
    np.testing.assert_allclose(np.asarray(d.length()), 1.0, atol=1e-5)
    assert abs(float(jnp.mean(d.z))) < 0.01
    assert abs(float(jnp.mean(d.x))) < 0.01


def test_disk_mapping():
    n = 100000
    x, y = sampling.disk(jnp.asarray(_rand(n, 6)), jnp.asarray(_rand(n, 7)))
    r2 = np.asarray(x) ** 2 + np.asarray(y) ** 2
    assert r2.max() <= 1.0 + 1e-6
    # uniform on disk: E[r^2] = 1/2
    assert abs(r2.mean() - 0.5) < 0.01


def test_orthonormal_basis():
    n = _rand_unit_vec(1000, 8)
    v2, v3 = sampling.orthonormal_basis(n)
    np.testing.assert_allclose(np.asarray(v2.length()), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(v3.length()), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(v2.dot(n)), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(v3.dot(n)), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(v2.dot(v3)), 0.0, atol=1e-5)


def test_tangent_space_rotates_z_to_n():
    n = _rand_unit_vec(2000, 9)
    t = sampling.tangent_space(n)
    # to_world(T, +Z) == N
    z = Vec3(jnp.zeros_like(n.x), jnp.zeros_like(n.x), jnp.ones_like(n.x))
    w = sampling.to_world(t, z)
    np.testing.assert_allclose(np.asarray(w.x), np.asarray(n.x), atol=1e-5)
    np.testing.assert_allclose(np.asarray(w.y), np.asarray(n.y), atol=1e-5)
    np.testing.assert_allclose(np.asarray(w.z), np.asarray(n.z), atol=1e-5)


def test_to_local_to_world_roundtrip():
    n = _rand_unit_vec(2000, 10)
    v = _rand_unit_vec(2000, 11)
    t = sampling.tangent_space(n)
    rt = sampling.to_world(t, sampling.to_local(t, v))
    np.testing.assert_allclose(np.asarray(rt.x), np.asarray(v.x), atol=5e-4)
    np.testing.assert_allclose(np.asarray(rt.y), np.asarray(v.y), atol=5e-4)
    np.testing.assert_allclose(np.asarray(rt.z), np.asarray(v.z), atol=5e-4)
    # to_local(T, N) == +Z
    ln = sampling.to_local(t, n)
    np.testing.assert_allclose(np.asarray(ln.z), 1.0, atol=1e-5)


def test_power_heuristic():
    f, g = jnp.float32(2.0), jnp.float32(1.0)
    assert abs(float(sampling.power_heuristic(f, g)) - 4 / 5) < 1e-6
    # over_f variant: powerHeuristic(f,g)/f
    assert abs(
        float(sampling.power_heuristic_over_f(f, g)) - (4 / 5) / 2.0
    ) < 1e-6


def test_cone_pdf_integrates_to_one():
    """Integral of cone_pdf over the cone solid angle should be 1."""
    cos_max = 0.8
    pdf = float(sampling.cone_pdf(jnp.float32(cos_max)))
    solid_angle = 2 * np.pi * (1 - cos_max)
    assert abs(pdf * solid_angle - 1.0) < 1e-5


def test_sample_direction_to_sphere():
    """Samples lie inside the cone, distance hits the sphere surface."""
    n = 50000
    center = np.array([0.0, 0.0, 5.0], np.float32)
    radius = 1.0
    wc = Vec3.splat(center / np.linalg.norm(center), (n,))
    cd = float(np.linalg.norm(center))
    sin2 = radius**2 / cd**2
    t, s = jnp.asarray(_rand(n, 12)), jnp.asarray(_rand(n, 13))
    l, dist, pdf = sampling.sample_direction_to_sphere(
        wc, jnp.float32(sin2), jnp.float32(cd), jnp.float32(radius**2), t, s
    )
    # directions must be within the cone
    cos_to_center = np.asarray(l.dot(wc))
    cos_max = np.sqrt(1 - sin2)
    assert (cos_to_center >= cos_max - 1e-4).all()
    # the sampled point p + dist*l must lie on (slightly inside) the sphere
    px = np.asarray(l.x) * np.asarray(dist) - center[0]
    py = np.asarray(l.y) * np.asarray(dist) - center[1]
    pz = np.asarray(l.z) * np.asarray(dist) - center[2]
    r = np.sqrt(px**2 + py**2 + pz**2)
    np.testing.assert_allclose(r, radius, atol=1e-3)
    # pdf matches cone pdf
    expected_pdf = 1 / (2 * np.pi * (1 - cos_max))
    np.testing.assert_allclose(np.asarray(pdf), expected_pdf, rtol=1e-4)


def test_sample_direction_within_sphere():
    """Area-measure alternate sampler (Sampling.hpp:202-217 parity):
    points land on the surface, and the double-cover identity holds —
    E[1/pdf] = 2 * solid angle subtended (every cone direction crosses the
    surface twice when the WHOLE sphere is area-sampled)."""
    n = 200000
    center = np.array([0.0, 0.0, 5.0], np.float32)
    radius = 1.0
    rel = Vec3.splat(center, (n,))
    t, s = jnp.asarray(_rand(n, 14)), jnp.asarray(_rand(n, 15))
    l, dist, pdf = sampling.sample_direction_within_sphere(
        rel, jnp.float32(radius**2), t, s
    )
    # sampled point lies on the (epsilon-inflated) surface
    px = np.asarray(l.x) * np.asarray(dist) - center[0]
    py = np.asarray(l.y) * np.asarray(dist) - center[1]
    pz = np.asarray(l.z) * np.asarray(dist) - center[2]
    r = np.sqrt(px**2 + py**2 + pz**2)
    np.testing.assert_allclose(r, radius + 1e-4, atol=1e-3)
    # directions are unit and pdf positive
    np.testing.assert_allclose(np.asarray(l.length()), 1.0, atol=1e-4)
    assert (np.asarray(pdf) > 0).all()
    cd = float(np.linalg.norm(center))
    omega = 2 * np.pi * (1 - np.sqrt(1 - radius**2 / cd**2))
    est = (1.0 / np.asarray(pdf)).mean()
    np.testing.assert_allclose(est, 2 * omega, rtol=0.02)


def test_ggx_d_normalization():
    """Integral of D(h) * cos(h) over hemisphere == 1."""
    alpha2 = 0.3**2
    n = 400000
    g = np.random.default_rng(20)
    # uniform hemisphere sampling for MC integration
    u, v = g.uniform(size=n), g.uniform(size=n)
    cos_t = u
    d = sampling.ggx_d(jnp.float32(alpha2), jnp.asarray((cos_t**2).astype(np.float32)))
    # pdf of cos_t uniform in [0,1] over hemisphere: p = 1/(2pi)
    integral = float(jnp.mean(d * jnp.asarray(cos_t.astype(np.float32)))) * 2 * np.pi
    assert abs(integral - 1.0) < 0.02


def test_vndf_sampling_valid():
    n = 10000
    v = _rand_unit_vec(n, 21)
    v = Vec3(v.x, v.y, jnp.abs(v.z))  # viewer above horizon
    h = sampling.distribution_visible_normals(v, jnp.float32(0.5), jnp.asarray(_rand(n, 22)), jnp.asarray(_rand(n, 23)))
    np.testing.assert_allclose(np.asarray(h.length()), 1.0, atol=1e-4)
    assert (np.asarray(h.z) >= 0).all()
    assert (np.asarray(h.dot(v)) >= -1e-5).all()


def test_fresnel_schlick_limits():
    f0 = Vec3.splat((0.04, 0.04, 0.04), (1,))
    at0 = sampling.fresnel_schlick(f0, jnp.asarray([1.0], jnp.float32))
    assert abs(float(at0.x[0]) - 0.04) < 1e-6
    grazing = sampling.fresnel_schlick(f0, jnp.asarray([0.0], jnp.float32))
    assert abs(float(grazing.x[0]) - 1.0) < 1e-6


def test_fresnel_two_point_f80():
    """Two-point Schlick (policy.shade_f80): F(0)=f0, F(grazing)=f80, and
    f80=white reduces to the classic single-point form."""
    f0 = Vec3(jnp.float32(0.04), jnp.float32(0.5), jnp.float32(1.0))
    f80 = Vec3(jnp.float32(0.9), jnp.float32(0.2), jnp.float32(0.6))
    white = Vec3(jnp.float32(1.0), jnp.float32(1.0), jnp.float32(1.0))
    # normal incidence: F = f0 regardless of f80
    fn = sampling.fresnel_schlick(f0, jnp.float32(1.0), f80)
    np.testing.assert_allclose(
        [float(fn.x), float(fn.y), float(fn.z)], [0.04, 0.5, 1.0], atol=1e-6
    )
    # grazing: F = f80
    fg = sampling.fresnel_schlick(f0, jnp.float32(0.0), f80)
    np.testing.assert_allclose(
        [float(fg.x), float(fg.y), float(fg.z)], [0.9, 0.2, 0.6], atol=1e-6
    )
    # f80 = white == classic Schlick at an intermediate angle
    for hv in (0.1, 0.3, 0.7):
        a = sampling.fresnel_schlick(f0, jnp.float32(hv), white)
        b = sampling.fresnel_schlick(f0, jnp.float32(hv))
        np.testing.assert_allclose(
            [float(a.x), float(a.y), float(a.z)],
            [float(b.x), float(b.y), float(b.z)], atol=1e-7,
        )
