"""Intersection ops vs numpy oracles (reference semantics: BVH.hpp:237-305)."""
import numpy as np
import jax.numpy as jnp

from cpu_raytracing_experiments_tpu.core.vec import Vec3
from cpu_raytracing_experiments_tpu.ops import intersect


def _rays(n, seed=0):
    g = np.random.default_rng(seed)
    p = g.uniform(-5, 5, (n, 3)).astype(np.float32)
    d = g.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return p, d


def _spheres(m, seed=1):
    g = np.random.default_rng(seed)
    c = g.uniform(-5, 5, (m, 3)).astype(np.float32)
    r = g.uniform(0.2, 1.5, m).astype(np.float32)
    return c, r


def oracle_closest(p, d, c, r):
    """Scalar oracle with the reference's exact root-selection rule."""
    n, m = len(p), len(c)
    tfar = np.full(n, np.float32(3.4028235e38))
    prim = np.full(n, -1, np.int32)
    for i in range(n):
        for j in range(m):
            to_c = c[j] - p[i]
            b = float(np.dot(d[i], to_c))
            disc = float(r[j] ** 2 - np.dot(to_c, to_c) + b * b)
            if disc < 0:
                continue
            sq = np.sqrt(disc)
            t = b - sq
            if t < 0:
                t = b + sq
            if t < 0 or t >= tfar[i]:
                continue
            tfar[i] = t
            prim[i] = j
    return tfar, prim


def test_sphere_intersection_matches_oracle():
    p, d = _rays(200, 3)
    c, r = _spheres(20, 4)
    want_t, want_id = oracle_closest(p, d, c, r)
    got_t, got_id = intersect.intersect_spheres(
        Vec3(*[jnp.asarray(p[:, k]) for k in range(3)]),
        Vec3(*[jnp.asarray(d[:, k]) for k in range(3)]),
        Vec3(*[jnp.asarray(c[:, k]) for k in range(3)]),
        jnp.asarray(r * r),
    )
    got_t, got_id = np.asarray(got_t), np.asarray(got_id)
    hit = want_id >= 0
    np.testing.assert_array_equal(got_id, want_id)
    np.testing.assert_allclose(got_t[hit], want_t[hit], rtol=1e-5)


def test_sphere_prim_chunking_consistent():
    p, d = _rays(100, 5)
    c, r = _spheres(50, 6)
    args = (
        Vec3(*[jnp.asarray(p[:, k]) for k in range(3)]),
        Vec3(*[jnp.asarray(d[:, k]) for k in range(3)]),
        Vec3(*[jnp.asarray(c[:, k]) for k in range(3)]),
        jnp.asarray(r * r),
    )
    t1, i1 = intersect.intersect_spheres(*args, prim_chunk=512)
    t2, i2 = intersect.intersect_spheres(*args, prim_chunk=7)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t2))


def test_closest_epilogue_matches_two_reduce_form():
    """The one-pass variadic-reduce argmin (_closest_epilogue, the round-5
    reduce-phase fix measured 2.29 vs 4.158 ms at 262k x 1024 —
    benchmarks/diag_battery3.py) is BIT-equal to the two-reduce min +
    iota-compare form it replaced, including first-occurrence tie-breaks
    (exact duplicate values) and all-miss rows (+inf everywhere)."""
    import jax

    g = np.random.default_rng(42)
    t = g.uniform(0.1, 9.0, (64, 37)).astype(np.float32)
    t[5] = intersect.FLT_MAX  # all-miss row
    t[7, 3] = t[7, 29] = t[7].min() / 2  # exact duplicate minimum
    t[11, 0] = t[11].min() / 2  # winner at the first lane
    t[13, 36] = t[13].min() / 2  # winner at the last lane
    tj = jnp.asarray(t)

    def two_reduce(t):
        best = jnp.min(t, axis=1)
        iota = jax.lax.broadcasted_iota(jnp.int32, t.shape, 1)
        first = jnp.min(
            jnp.where(t == best[:, None], iota, jnp.int32(1 << 30)), axis=1)
        return best, first

    want_t, want_i = jax.jit(two_reduce)(tj)
    got_t, got_i = jax.jit(intersect._closest_epilogue)(tj)
    np.testing.assert_array_equal(np.asarray(got_t), np.asarray(want_t))
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))


def test_occlusion_matches_closest():
    """occluded <=> some prim hit strictly before tfar."""
    p, d = _rays(300, 7)
    c, r = _spheres(15, 8)
    want_t, want_id = oracle_closest(p, d, c, r)
    pv = Vec3(*[jnp.asarray(p[:, k]) for k in range(3)])
    dv = Vec3(*[jnp.asarray(d[:, k]) for k in range(3)])
    cv = Vec3(*[jnp.asarray(c[:, k]) for k in range(3)])
    rsq = jnp.asarray(r * r)
    maxdist = jnp.full(p.shape[0], 1e30, jnp.float32)
    occ = np.asarray(intersect.occluded_spheres(pv, dv, maxdist, cv, rsq))
    np.testing.assert_array_equal(occ, want_id >= 0)
    # with tfar just below the closest hit, nothing is occluded
    eps_before = jnp.asarray(np.where(want_id >= 0, want_t * 0.999, 1e-3))
    occ2 = np.asarray(intersect.occluded_spheres(pv, dv, eps_before, cv, rsq))
    assert not occ2.any()


def oracle_triangle(p, d, v0, v1, v2):
    n, m = len(p), len(v0)
    tfar = np.full(n, np.float32(3.4028235e38))
    prim = np.full(n, -1, np.int32)
    e1 = v1 - v0
    e2 = v2 - v0
    for i in range(n):
        for j in range(m):
            h = np.cross(d[i], e2[j])
            det = float(np.dot(e1[j], h))
            if abs(det) < 1e-12:
                continue
            inv = 1.0 / det
            s = p[i] - v0[j]
            u = float(np.dot(s, h)) * inv
            if u < 0 or u > 1:
                continue
            q = np.cross(s, e1[j])
            v = float(np.dot(d[i], q)) * inv
            if v < 0 or u + v > 1:
                continue
            t = float(np.dot(e2[j], q)) * inv
            if t <= 1e-6 or t >= tfar[i]:
                continue
            tfar[i] = t
            prim[i] = j
    return tfar, prim


def test_triangle_intersection_matches_oracle():
    g = np.random.default_rng(11)
    m = 12
    v0 = g.uniform(-3, 3, (m, 3)).astype(np.float32)
    v1 = v0 + g.uniform(-2, 2, (m, 3)).astype(np.float32)
    v2 = v0 + g.uniform(-2, 2, (m, 3)).astype(np.float32)
    p, d = _rays(200, 12)
    want_t, want_id = oracle_triangle(p, d, v0, v1, v2)
    got_t, got_id = intersect.intersect_triangles(
        Vec3(*[jnp.asarray(p[:, k]) for k in range(3)]),
        Vec3(*[jnp.asarray(d[:, k]) for k in range(3)]),
        Vec3(*[jnp.asarray(v0[:, k]) for k in range(3)]),
        Vec3(*[jnp.asarray((v1 - v0)[:, k]) for k in range(3)]),
        Vec3(*[jnp.asarray((v2 - v0)[:, k]) for k in range(3)]),
    )
    got_t, got_id = np.asarray(got_t), np.asarray(got_id)
    np.testing.assert_array_equal(got_id, want_id)
    hit = want_id >= 0
    np.testing.assert_allclose(got_t[hit], want_t[hit], rtol=1e-4)
