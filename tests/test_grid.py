"""Uniform-grid DDA acceleration vs brute-force oracle."""
import dataclasses
import pytest

import numpy as np
import jax.numpy as jnp

from cpu_raytracing_experiments_tpu.bvh import grid as grid_mod, traverse
from cpu_raytracing_experiments_tpu.core.vec import Vec3
from cpu_raytracing_experiments_tpu.ops import intersect
from cpu_raytracing_experiments_tpu.render.api import Renderer
from cpu_raytracing_experiments_tpu.scene import accel, builders
from cpu_raytracing_experiments_tpu.utils.config import RendererPolicy


def _spheres_and_rays(m=400, n=1500, seed=3):
    g = np.random.default_rng(seed)
    c = g.uniform(-50, 50, (m, 3)).astype(np.float32)
    r = g.uniform(0.3, 4.0, m).astype(np.float32)
    p = Vec3(*[jnp.asarray(g.uniform(-80, 80, n).astype(np.float32)) for _ in range(3)])
    dn = g.normal(size=(n, 3)).astype(np.float32)
    dn /= np.linalg.norm(dn, axis=1, keepdims=True)
    d = Vec3(*[jnp.asarray(dn[:, k]) for k in range(3)])
    center = Vec3(*[jnp.asarray(c[:, k]) for k in range(3)])
    return c, r, center, jnp.asarray(r * r), p, d


def test_grid_closest_matches_brute():
    c, r, center, rsq, p, d = _spheres_and_rays()
    grid = grid_mod.build_grid(c - r[:, None], c + r[:, None], res=16, max_per_cell=24)
    rows = traverse.pack_spheres(center, rsq)
    bt, bid = intersect.intersect_spheres(p, d, center, rsq)
    gt, gid = grid_mod.traverse_grid_closest(grid, p, d, rows, traverse.sphere_row_test)
    bt, bid, gt, gid = map(np.asarray, (bt, bid, gt, gid))
    np.testing.assert_array_equal(gid >= 0, bid >= 0)
    hit = bid >= 0
    np.testing.assert_allclose(gt[hit], bt[hit], rtol=1e-4)
    assert (gid[hit] == bid[hit]).mean() > 0.99  # ties only


def test_grid_with_overflow_residual():
    """Tiny per-cell capacity forces the residual path; still exact."""
    c, r, center, rsq, p, d = _spheres_and_rays(m=200, seed=5)
    grid = grid_mod.build_grid(c - r[:, None], c + r[:, None], res=4, max_per_cell=2)
    assert int(grid.residual.shape[0]) > 0  # overflow happened
    rows = traverse.pack_spheres(center, rsq)
    bt, bid = intersect.intersect_spheres(p, d, center, rsq)
    gt, gid = grid_mod.traverse_grid_closest(grid, p, d, rows, traverse.sphere_row_test)
    np.testing.assert_array_equal(np.asarray(gid) >= 0, np.asarray(bid) >= 0)
    hit = np.asarray(bid) >= 0
    np.testing.assert_allclose(np.asarray(gt)[hit], np.asarray(bt)[hit], rtol=1e-4)


def test_grid_shadow_matches_brute():
    c, r, center, rsq, p, d = _spheres_and_rays(seed=7)
    grid = grid_mod.build_grid(c - r[:, None], c + r[:, None], res=16, max_per_cell=24)
    rows = traverse.pack_spheres(center, rsq)
    tfar = jnp.full((p.x.shape[0],), 80.0)
    want = np.asarray(intersect.occluded_spheres(p, d, tfar, center, rsq))
    got = np.asarray(
        grid_mod.traverse_grid_shadow(grid, p, d, tfar, rows, traverse.sphere_row_test)
    )
    np.testing.assert_array_equal(got, want)


@pytest.mark.slow
def test_grid_render_matches_brute():
    scene = builders.bvh_test_scene(32, 32)
    pol_bf = RendererPolicy(max_bounces=5, rays_per_chunk=1024)
    pol_grid = dataclasses.replace(pol_bf, accel="grid")
    a = Renderer(scene, pol_bf, 32, 32)
    a.accumulate(5)
    b = Renderer(accel.with_grid(scene, res=24), pol_grid, 32, 32)
    b.accumulate(5)
    ba = np.asarray(a.state.buckets)
    bb = np.asarray(b.state.buckets)
    mismatch = ~np.isclose(ba, bb, rtol=1e-4, atol=1e-5)
    assert mismatch.mean() < 0.005, mismatch.mean()


@pytest.mark.slow
def test_grid_mesh_scene_renders():
    scene = accel.with_grid(builders.mesh_scene(32, 32, subdivisions=3), res=24)
    pol = RendererPolicy(max_bounces=4, rays_per_chunk=1024, accel="grid")
    img = Renderer(scene, pol, 32, 32).render_spp(5, tonemap=False)
    assert np.isfinite(img).all() and img.max() > 0
