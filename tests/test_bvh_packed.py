"""Packed-row traversal == scalar-gather traversal (same algorithm, packed
node/prim tables for single-row gathers per step)."""
import numpy as np
import jax.numpy as jnp

from cpu_raytracing_experiments_tpu.bvh import builder, traverse
from cpu_raytracing_experiments_tpu.core.vec import Vec3


def _setup(m=300, seed=7, leaf=4):
    g = np.random.default_rng(seed)
    c = g.uniform(-50, 50, (m, 3)).astype(np.float32)
    r = g.uniform(0.3, 5.0, m).astype(np.float32)
    arrays, order = builder.build_bvh(c - r[:, None], c + r[:, None], leaf_size=leaf)
    c2, r2 = c[order], r[order]
    center = Vec3(*[jnp.asarray(c2[:, k]) for k in range(3)])
    rsq = jnp.asarray(r2 * r2)
    n = 512
    p = Vec3(*[jnp.asarray(g.uniform(-80, 80, n).astype(np.float32)) for _ in range(3)])
    dn = g.normal(size=(n, 3)).astype(np.float32)
    dn /= np.linalg.norm(dn, axis=1, keepdims=True)
    d = Vec3(*[jnp.asarray(dn[:, k]) for k in range(3)])
    return arrays, center, rsq, p, d


def test_pack_nodes_roundtrip():
    arrays, *_ = _setup()
    rows = traverse.pack_nodes(arrays)
    (mnx, mny, mnz, mxx, mxy, mxz, first, count, miss) = traverse._unpack_row(rows)
    np.testing.assert_array_equal(np.asarray(first), np.asarray(arrays.first))
    np.testing.assert_array_equal(np.asarray(count), np.asarray(arrays.count))
    np.testing.assert_array_equal(np.asarray(miss), np.asarray(arrays.miss))
    np.testing.assert_array_equal(np.asarray(mnx), np.asarray(arrays.node_min.x))
    np.testing.assert_array_equal(np.asarray(mxz), np.asarray(arrays.node_max.z))


def test_packed_matches_scalar_closest():
    arrays, center, rsq, p, d = _setup()
    t1, i1 = traverse.traverse_closest(
        arrays, p, d, traverse.sphere_leaf_test(center, rsq)
    )
    rows = traverse.pack_spheres(center, rsq)
    t2, i2 = traverse.traverse_closest_packed(
        arrays, p, d, rows, traverse.sphere_row_test
    )
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t2), rtol=1e-6)


def test_packed_matches_scalar_shadow():
    arrays, center, rsq, p, d = _setup(seed=9)
    tfar = jnp.full((p.x.shape[0],), 60.0)
    o1 = traverse.traverse_shadow(
        arrays, p, d, tfar, traverse.sphere_leaf_test(center, rsq)
    )
    o2 = traverse.traverse_shadow_packed(
        arrays, p, d, tfar,
        traverse.pack_spheres(center, rsq), traverse.sphere_row_test,
    )
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))


def test_packed_triangles():
    g = np.random.default_rng(12)
    m = 80
    v0 = g.uniform(-20, 20, (m, 3)).astype(np.float32)
    v1 = v0 + g.uniform(-4, 4, (m, 3)).astype(np.float32)
    v2 = v0 + g.uniform(-4, 4, (m, 3)).astype(np.float32)
    mins, maxs = builder.triangle_bounds(v0, v1, v2)
    arrays, order = builder.build_bvh(mins, maxs, leaf_size=4)
    v0o, v1o, v2o = v0[order], v1[order], v2[order]
    V0 = Vec3(*[jnp.asarray(v0o[:, k]) for k in range(3)])
    E1 = Vec3(*[jnp.asarray((v1o - v0o)[:, k]) for k in range(3)])
    E2 = Vec3(*[jnp.asarray((v2o - v0o)[:, k]) for k in range(3)])
    n = 400
    p = Vec3(*[jnp.asarray(g.uniform(-40, 40, n).astype(np.float32)) for _ in range(3)])
    dn = g.normal(size=(n, 3)).astype(np.float32)
    dn /= np.linalg.norm(dn, axis=1, keepdims=True)
    d = Vec3(*[jnp.asarray(dn[:, k]) for k in range(3)])
    t1, i1 = traverse.traverse_closest(
        arrays, p, d, traverse.triangle_leaf_test(V0, E1, E2)
    )
    t2, i2 = traverse.traverse_closest_packed(
        arrays, p, d, traverse.pack_triangles(V0, E1, E2), traverse.triangle_row_test
    )
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    hit = np.asarray(i1) >= 0
    np.testing.assert_allclose(np.asarray(t1)[hit], np.asarray(t2)[hit], rtol=1e-5)
