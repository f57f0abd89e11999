"""BVH builder + stackless traversal vs brute-force oracle."""
import dataclasses
import pytest

import numpy as np
import jax.numpy as jnp

from cpu_raytracing_experiments_tpu.bvh import builder, traverse
from cpu_raytracing_experiments_tpu.core.vec import Vec3
from cpu_raytracing_experiments_tpu.ops import intersect
from cpu_raytracing_experiments_tpu.render.api import Renderer
from cpu_raytracing_experiments_tpu.scene import accel, builders as scene_builders
from cpu_raytracing_experiments_tpu.utils import native
from cpu_raytracing_experiments_tpu.utils.config import RendererPolicy


def _spheres(m, seed=1):
    g = np.random.default_rng(seed)
    c = g.uniform(-50, 50, (m, 3)).astype(np.float32)
    r = g.uniform(0.3, 5.0, m).astype(np.float32)
    return c, r


def _rays(n, seed=0):
    g = np.random.default_rng(seed)
    p = g.uniform(-80, 80, (n, 3)).astype(np.float32)
    d = g.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return (
        Vec3(*[jnp.asarray(p[:, k]) for k in range(3)]),
        Vec3(*[jnp.asarray(d[:, k]) for k in range(3)]),
    )


def test_native_builder_available():
    """The C++ builder must be buildable in this environment."""
    assert native.get_lib() is not None


def test_bvh_structure():
    c, r = _spheres(200)
    arrays, order = builder.build_bvh(c - r[:, None], c + r[:, None], leaf_size=4)
    count = np.asarray(arrays.count)
    first = np.asarray(arrays.first)
    miss = np.asarray(arrays.miss)
    n = arrays.num_nodes
    # prim coverage: leaves partition [0, 200)
    leaves = count > 0
    covered = np.zeros(200, bool)
    for f, ct in zip(first[leaves], count[leaves]):
        assert not covered[f : f + ct].any(), "overlapping leaves"
        covered[f : f + ct] = True
    assert covered.all()
    assert sorted(order.tolist()) == list(range(200))
    # miss links are in range and the thread visits every node exactly once
    assert ((miss >= -1) & (miss < n)).all()
    visited = set()
    cur = 0
    while cur != -1:
        assert cur not in visited
        visited.add(cur)
        cur = int(first[cur]) if count[cur] == 0 else int(miss[cur])
    assert len(visited) == n
    # child AABBs contained in parent
    node_min = np.stack([np.asarray(arrays.node_min.x), np.asarray(arrays.node_min.y), np.asarray(arrays.node_min.z)], 1)
    node_max = np.stack([np.asarray(arrays.node_max.x), np.asarray(arrays.node_max.y), np.asarray(arrays.node_max.z)], 1)
    for i in range(n):
        if count[i] == 0:
            for ch in (first[i], first[i] + 1):
                assert (node_min[ch] >= node_min[i] - 1e-4).all()
                assert (node_max[ch] <= node_max[i] + 1e-4).all()


def test_traversal_matches_brute_force():
    c, r = _spheres(300, 7)
    arrays, order = builder.build_bvh(c - r[:, None], c + r[:, None], leaf_size=4)
    c2, r2 = c[order], r[order]
    center = Vec3(*[jnp.asarray(c2[:, k]) for k in range(3)])
    rsq = jnp.asarray(r2 * r2)
    p, d = _rays(500, 8)
    bt, bid = intersect.intersect_spheres(p, d, center, rsq)
    tt, tid = traverse.traverse_closest(
        arrays, p, d, traverse.sphere_leaf_test(center, rsq)
    )
    bt, bid, tt, tid = map(np.asarray, (bt, bid, tt, tid))
    hit = bid >= 0
    np.testing.assert_array_equal(tid >= 0, hit)
    np.testing.assert_allclose(tt[hit], bt[hit], rtol=1e-4)
    # prim ids agree except where two spheres tie within float tolerance
    disagree = (tid != bid) & hit
    assert disagree.mean() < 0.01


def test_shadow_traversal_matches_brute_force():
    c, r = _spheres(150, 9)
    arrays, order = builder.build_bvh(c - r[:, None], c + r[:, None], leaf_size=4)
    c2, r2 = c[order], r[order]
    center = Vec3(*[jnp.asarray(c2[:, k]) for k in range(3)])
    rsq = jnp.asarray(r2 * r2)
    p, d = _rays(400, 10)
    tfar = jnp.full((400,), 100.0)
    want = np.asarray(intersect.occluded_spheres(p, d, tfar, center, rsq))
    got = np.asarray(
        traverse.traverse_shadow(
            arrays, p, d, tfar, traverse.sphere_leaf_test(center, rsq)
        )
    )
    np.testing.assert_array_equal(got, want)


@pytest.mark.slow
def test_bvh_render_matches_brute_force():
    """Full render with BVH on == brute force, up to intersection ties."""
    scene = scene_builders.bvh_test_scene(32, 32)
    pol_bf = RendererPolicy(max_bounces=5, rays_per_chunk=1024)
    pol_bvh = dataclasses.replace(pol_bf, use_bvh=True)
    a = Renderer(scene, pol_bf, 32, 32)
    a.accumulate(5)
    b = Renderer(accel.with_bvh(scene), pol_bvh, 32, 32)
    b.accumulate(5)
    ba = np.asarray(a.state.buckets)
    bb = np.asarray(b.state.buckets)
    # identical except where a t-tie picked a different (equivalent) prim
    mismatch = ~np.isclose(ba, bb, rtol=1e-4, atol=1e-5)
    assert mismatch.mean() < 0.005, mismatch.mean()


def test_triangle_bvh_traversal():
    g = np.random.default_rng(12)
    m = 100
    v0 = g.uniform(-20, 20, (m, 3)).astype(np.float32)
    v1 = v0 + g.uniform(-4, 4, (m, 3)).astype(np.float32)
    v2 = v0 + g.uniform(-4, 4, (m, 3)).astype(np.float32)
    mins, maxs = builder.triangle_bounds(v0, v1, v2)
    arrays, order = builder.build_bvh(mins, maxs, leaf_size=4)
    v0o, v1o, v2o = v0[order], v1[order], v2[order]
    V0 = Vec3(*[jnp.asarray(v0o[:, k]) for k in range(3)])
    E1 = Vec3(*[jnp.asarray((v1o - v0o)[:, k]) for k in range(3)])
    E2 = Vec3(*[jnp.asarray((v2o - v0o)[:, k]) for k in range(3)])
    p, d = _rays(300, 13)
    bt, bid = intersect.intersect_triangles(p, d, V0, E1, E2)
    tt, tid = traverse.traverse_closest(
        arrays, p, d, traverse.triangle_leaf_test(V0, E1, E2)
    )
    bt, bid, tt, tid = map(np.asarray, (bt, bid, tt, tid))
    hit = bid >= 0
    np.testing.assert_array_equal(tid >= 0, hit)
    np.testing.assert_allclose(tt[hit], bt[hit], rtol=1e-4)
