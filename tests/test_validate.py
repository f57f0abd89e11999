"""Numerical sanitizer + scene validation tests."""
import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from cpu_raytracing_experiments_tpu.core.vec import Vec3
from cpu_raytracing_experiments_tpu.render import validate
from cpu_raytracing_experiments_tpu.scene import builders
from cpu_raytracing_experiments_tpu.utils.config import RendererPolicy

POL = RendererPolicy(max_bounces=4, rays_per_chunk=1024)


def test_check_render_passes_clean_scene():
    rad = validate.check_render(builders.default_scene(16, 16), POL, 16, 16)
    assert np.isfinite(np.asarray(rad.x)).all()


def test_check_render_catches_nan():
    """Poison the floor albedo with NaN: throughput goes NaN and reaches
    radiance via emissive hits -> checkify reports it. (Note: NaN *emission*
    alone is silently masked out by the integrator's validity masks — the
    masked wavefront is inherently NaN-robust on that path.)"""
    scene = builders.default_scene(16, 16)
    mats = scene.materials
    bad = mats.albedo.x.at[0].set(jnp.nan)  # material 0 = the floor
    scene = dataclasses.replace(
        scene,
        materials=dataclasses.replace(
            mats, albedo=Vec3(bad, mats.albedo.y, mats.albedo.z)
        ),
    )
    with pytest.raises(Exception, match="non-finite radiance"):
        validate.check_render(scene, POL, 16, 16)


def test_validate_scene():
    scene = builders.default_scene(16, 16)
    assert validate.validate_scene(scene) == []
    # black scene warning
    dark = builders.white_furnace_scene(8, 8)
    from cpu_raytracing_experiments_tpu.scene.scene import Sky

    dark = dataclasses.replace(dark, sky=Sky.constant((0, 0, 0)))
    problems = validate.validate_scene(dark)
    assert any("black" in p for p in problems)
    # bad material id
    broken = dataclasses.replace(
        scene,
        spheres=dataclasses.replace(
            scene.spheres, material_id=scene.spheres.material_id.at[0].set(99)
        ),
    )
    assert any("out of range" in p for p in validate.validate_scene(broken))
