"""Wavefront narrowing cascade + ray-order permutation: both are pure
execution-schedule changes and must leave the rendered sample values
BIT-IDENTICAL (RNG is keyed by pixel id, not array position)."""
import numpy as np
import pytest

import jax

from cpu_raytracing_experiments_tpu.render import renderer as RR
from cpu_raytracing_experiments_tpu.scene import builders
from cpu_raytracing_experiments_tpu.utils.config import RendererPolicy

W = H = 48


def _pass(pol, scene):
    rad, cnt = jax.jit(
        lambda: RR.render_pass(scene, pol, 3, W, H)
    )()
    return (
        np.stack([np.asarray(rad.x), np.asarray(rad.y), np.asarray(rad.z)]),
        int(cnt),
    )


@pytest.mark.slow
def test_narrowing_bit_identical():
    # 1k-sphere scene so the auto gate would engage; force both branches
    scene = builders.random_spheres_scene(W, H, num_spheres=200)
    base = dict(max_bounces=6, rays_per_chunk=4096)
    img_off, n_off = _pass(
        RendererPolicy(narrow_wavefront=False, **base), scene
    )
    img_on, n_on = _pass(
        RendererPolicy(narrow_wavefront=True, narrow_factors=(2, 8), **base),
        scene,
    )
    np.testing.assert_array_equal(img_off, img_on)
    assert n_off == n_on  # useful-ray counter identical too


def test_ray_order_bit_identical():
    scene = builders.default_scene(W, H)
    base = dict(max_bounces=5, rays_per_chunk=4096)
    img_r, n_r = _pass(RendererPolicy(ray_order="raster", **base), scene)
    img_t, n_t = _pass(RendererPolicy(ray_order="tile", **base), scene)
    np.testing.assert_array_equal(img_r, img_t)
    assert n_r == n_t


def test_narrow_auto_gate():
    """auto narrows only when the battery can pay for the compaction."""
    small = builders.default_scene(W, H)  # 9 spheres
    big = builders.random_spheres_scene(W, H, num_spheres=200)
    pol = RendererPolicy(max_bounces=4, rays_per_chunk=4096)
    # behavioral check: both compile and render finitely under auto
    for scene in (small, big):
        img, _ = _pass(pol, scene)
        assert np.isfinite(img).all()
