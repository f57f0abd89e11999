"""Cluster-culled battery vs brute-force oracle."""
import dataclasses

import numpy as np
import jax.numpy as jnp

from cpu_raytracing_experiments_tpu.core.vec import Vec3
from cpu_raytracing_experiments_tpu.ops import clustered, intersect
from cpu_raytracing_experiments_tpu.render.api import Renderer
from cpu_raytracing_experiments_tpu.scene import accel, builders
from cpu_raytracing_experiments_tpu.utils.config import RendererPolicy


def _spheres_and_rays(m=700, n=1200, seed=4):
    g = np.random.default_rng(seed)
    c = g.uniform(-60, 60, (m, 3)).astype(np.float32)
    r = g.uniform(0.3, 4.0, m).astype(np.float32)
    p = Vec3(*[jnp.asarray(g.uniform(-90, 90, n).astype(np.float32)) for _ in range(3)])
    dn = g.normal(size=(n, 3)).astype(np.float32)
    dn /= np.linalg.norm(dn, axis=1, keepdims=True)
    d = Vec3(*[jnp.asarray(dn[:, k]) for k in range(3)])
    center = Vec3(*[jnp.asarray(c[:, k]) for k in range(3)])
    rows = np.concatenate([c, (r * r)[:, None]], axis=1)
    return c, r, rows, center, jnp.asarray(r * r), p, d


def test_clustered_matches_brute():
    c, r, rows, center, rsq, p, d = _spheres_and_rays()
    mins, maxs = c - r[:, None], c + r[:, None]
    cp = clustered.build_clusters(mins, maxs, rows, num_clusters=32)
    bt, bid = intersect.intersect_spheres(p, d, center, rsq)
    gt, gid = clustered.intersect_clustered(cp, p, d)
    bt, bid, gt, gid = map(np.asarray, (bt, bid, gt, gid))
    np.testing.assert_array_equal(gid >= 0, bid >= 0)
    hit = bid >= 0
    np.testing.assert_allclose(gt[hit], bt[hit], rtol=1e-4)
    assert (gid[hit] == bid[hit]).mean() > 0.995  # float ties only


def test_clustered_nonuniform_count():
    """Prim count not divisible by cluster count (padding path)."""
    c, r, rows, center, rsq, p, d = _spheres_and_rays(m=701, seed=9)
    cp = clustered.build_clusters(c - r[:, None], c + r[:, None], rows, num_clusters=48)
    assert cp.num_clusters * cp.cluster_size >= 701
    bt, bid = intersect.intersect_spheres(p, d, center, rsq)
    gt, gid = clustered.intersect_clustered(cp, p, d)
    np.testing.assert_array_equal(np.asarray(gid) >= 0, np.asarray(bid) >= 0)
    hit = np.asarray(bid) >= 0
    np.testing.assert_allclose(np.asarray(gt)[hit], np.asarray(bt)[hit], rtol=1e-4)


def test_clustered_shadow_matches_brute():
    c, r, rows, center, rsq, p, d = _spheres_and_rays(seed=11)
    cp = clustered.build_clusters(c - r[:, None], c + r[:, None], rows, num_clusters=32)
    tfar = jnp.full((p.x.shape[0],), 100.0)
    want = np.asarray(intersect.occluded_spheres(p, d, tfar, center, rsq))
    got = np.asarray(clustered.occluded_clustered(cp, p, d, tfar))
    np.testing.assert_array_equal(got, want)


def test_clustered_render_matches_brute():
    scene = builders.bvh_test_scene(32, 32)
    pol_bf = RendererPolicy(max_bounces=5, rays_per_chunk=1024)
    pol_cl = dataclasses.replace(pol_bf, accel="clustered")
    a = Renderer(scene, pol_bf, 32, 32)
    a.accumulate(5)
    b = Renderer(accel.with_clusters(scene, num_clusters=16), pol_cl, 32, 32)
    b.accumulate(5)
    ba = np.asarray(a.state.buckets)
    bb = np.asarray(b.state.buckets)
    mismatch = ~np.isclose(ba, bb, rtol=1e-4, atol=1e-5)
    assert mismatch.mean() < 0.005, mismatch.mean()


def test_clustered_mesh_scene_renders():
    scene = accel.with_clusters(
        builders.mesh_scene(32, 32, subdivisions=4), num_clusters=32
    )
    pol = RendererPolicy(max_bounces=4, rays_per_chunk=1024, accel="clustered")
    img = Renderer(scene, pol, 32, 32).render_spp(5, tonemap=False)
    assert np.isfinite(img).all() and img.max() > 0
