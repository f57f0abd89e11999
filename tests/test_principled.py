"""Principled BSDF (diffuse + GGX specular + refractive transmission)."""
import dataclasses

import pytest

import numpy as np
import jax.numpy as jnp

from cpu_raytracing_experiments_tpu.core.vec import Vec3
from cpu_raytracing_experiments_tpu.ops import closures
from cpu_raytracing_experiments_tpu.render.api import Renderer
from cpu_raytracing_experiments_tpu.scene import builders
from cpu_raytracing_experiments_tpu.scene.builders import _SceneBuilder
from cpu_raytracing_experiments_tpu.scene.scene import Camera, Sky
from cpu_raytracing_experiments_tpu.utils.config import RendererPolicy

POL = RendererPolicy(max_bounces=8, rays_per_chunk=4096, brdf="principled")


def _vec(v, n=1):
    return Vec3.splat(v, (n,))


def test_refraction_direction_snells_law():
    """Smooth glass, straight-on and oblique incidence."""
    n = 1
    ior = jnp.asarray([1.5], jnp.float32)
    v = Vec3(jnp.asarray([0.6]), jnp.asarray([0.0]), jnp.asarray([0.8]))
    s = closures.principled_sample(
        albedo=_vec((0, 0, 0)), f0=_vec((0, 0, 0)), transmission=_vec((1, 1, 1)),
        alpha=jnp.asarray([0.0]), ior=ior, entering=jnp.asarray([True]),
        v_local=v, r_lobe=jnp.asarray([0.99]),  # force transmission lobe
        u=jnp.asarray([0.5]), v=jnp.asarray([0.5]),
        r_fresnel=jnp.asarray([0.99]),  # force refraction
    )
    # Snell: sin_t = sin_i / ior (H = +Z for smooth)
    sin_i = 0.6
    sin_t = sin_i / 1.5
    assert abs(abs(float(s.direction.x[0])) - sin_t) < 1e-5
    assert float(s.direction.z[0]) < 0  # transmitted below the surface
    assert bool(s.is_delta[0])


def test_total_internal_reflection():
    """Exiting glass at a grazing angle beyond the critical angle reflects."""
    v = Vec3(jnp.asarray([0.9]), jnp.asarray([0.0]), jnp.asarray([np.sqrt(1 - 0.81)], jnp.float32))
    s = closures.principled_sample(
        albedo=_vec((0, 0, 0)), f0=_vec((0, 0, 0)), transmission=_vec((1, 1, 1)),
        alpha=jnp.asarray([0.0]), ior=jnp.asarray([1.5]),
        entering=jnp.asarray([False]),  # inside -> eta = 1.5, sin_t > 1
        v_local=v, r_lobe=jnp.asarray([0.99]),
        u=jnp.asarray([0.5]), v=jnp.asarray([0.5]),
        r_fresnel=jnp.asarray([0.99]),  # would refract if it could
    )
    # mirror reflection about +Z
    assert float(s.direction.z[0]) > 0
    np.testing.assert_allclose(float(s.direction.x[0]), -0.9, atol=1e-5)


def test_lobe_selection_probabilities():
    """r_lobe partitions by normalized max-component weights."""
    albedo = _vec((0.5, 0.5, 0.5))
    f0 = _vec((0.25, 0.25, 0.25))
    trans = _vec((0.25, 0.25, 0.25))
    # weights: 0.5, 0.25, 0.25 -> diffuse for r<0.5, spec for r<0.75
    for r, expect_z_sign in [(0.1, 1), (0.6, 1), (0.9, 1)]:
        s = closures.principled_sample(
            albedo, f0, trans, jnp.asarray([0.5]), jnp.asarray([1.3]),
            jnp.asarray([True]),
            Vec3(jnp.asarray([0.0]), jnp.asarray([0.0]), jnp.asarray([1.0])),
            jnp.asarray([r], jnp.float32), jnp.asarray([0.3]), jnp.asarray([0.4]),
            jnp.asarray([0.9]),
        )
        assert np.isfinite(
            [float(s.direction.x[0]), float(s.direction.z[0])]
        ).all()


def test_glass_furnace():
    """Lossless smooth glass sphere in a white furnace stays white: every
    path eventually exits carrying throughput 1."""
    b = _SceneBuilder()
    m = b.material(transmission=(1.0, 1.0, 1.0), ior_minus_one=0.5)
    b.sphere((0.0, 0.0, 0.0), 1.0, m)
    cam = Camera.create(eye=(0, 0, 3), forward=(0, 0, -1), width=32, height=32)
    scene = b.build(cam, Sky.constant((1.0, 1.0, 1.0)))
    pol = dataclasses.replace(POL, max_bounces=32)
    img = Renderer(scene, pol, 32, 32).render_spp(20, tonemap=False)
    # paths that exhaust 32 bounces inside the glass die losing energy;
    # allow a small deficit but demand near-unity mean
    assert img.mean() > 0.95, img.mean()
    assert img.max() <= 1.0 + 1e-4


@pytest.mark.slow  # finiteness-only smoke; the furnace/Snell/TIR tests
# above are the strong default-gate checks of the same model
def test_default_scene_principled_renders():
    """The hero scene's glass/metal spheres render finitely with the full
    material model (the reference can't shade these fields at all)."""
    scene = builders.default_scene(48, 48)
    img = Renderer(scene, POL, 48, 48).render_spp(10, tonemap=False)
    assert np.isfinite(img).all()
    assert (img >= 0).all()


def test_principled_white_diffuse_matches_lambertian_furnace():
    """With only albedo set, principled degenerates to lambertian."""
    scene = builders.white_furnace_scene(24, 24)
    img = Renderer(scene, POL, 24, 24).render_spp(5, tonemap=False)
    np.testing.assert_allclose(img, 1.0, atol=1e-5)
