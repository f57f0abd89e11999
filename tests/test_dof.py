"""Thin-lens depth-of-field tests (enable_dof — the capability the
reference declares but never wires into ray generation, Camera.hpp:17-26 vs
80-88)."""
import dataclasses

import numpy as np
import jax.numpy as jnp

from cpu_raytracing_experiments_tpu.render.api import Renderer
from cpu_raytracing_experiments_tpu.scene.builders import _SceneBuilder
from cpu_raytracing_experiments_tpu.scene.scene import Camera, Sky
from cpu_raytracing_experiments_tpu.utils.config import RendererPolicy


def _emitter_scene(width, height, focus_distance, aperture):
    b = _SceneBuilder()
    m = b.material(emission=(50.0, 50.0, 50.0), albedo=(1, 1, 1))
    b.sphere((0.0, 0.0, -4.0), 0.05, m)  # emitter 4 units away
    cam = Camera.create(
        eye=(0, 0, 0), forward=(0, 0, -1), width=width, height=height,
        focus_distance=focus_distance, aperture_world_radius=aperture,
    )
    return b.build(cam, Sky.constant((0.0, 0.0, 0.0)))


POL_DOF = RendererPolicy(max_bounces=2, rays_per_chunk=4096, enable_dof=True)
POL_PIN = RendererPolicy(max_bounces=2, rays_per_chunk=4096)


def _spot_stats(img):
    lum = img.sum(-1)
    total = lum.sum()
    return total, lum.max(), (lum > lum.max() * 0.1).sum()


def test_in_focus_matches_pinhole_spot_size():
    """Focused at the emitter's distance, the image ~= pinhole render."""
    scene = _emitter_scene(64, 64, focus_distance=4.0, aperture=0.02)
    img_f = Renderer(scene, POL_DOF, 64, 64).render_spp(20, tonemap=False)
    img_p = Renderer(scene, POL_PIN, 64, 64).render_spp(20, tonemap=False)
    _, _, area_f = _spot_stats(img_f)
    _, _, area_p = _spot_stats(img_p)
    assert area_f <= area_p * 2.0  # focused: comparable spot size


def test_defocus_spreads_the_spot():
    """Focused far from the emitter, its image blurs: larger area, lower
    peak, roughly conserved energy."""
    near = _emitter_scene(64, 64, focus_distance=4.0, aperture=0.06)
    far = _emitter_scene(64, 64, focus_distance=1.0, aperture=0.06)
    img_sharp = Renderer(near, POL_DOF, 64, 64).render_spp(40, tonemap=False)
    img_blur = Renderer(far, POL_DOF, 64, 64).render_spp(40, tonemap=False)
    tot_s, peak_s, area_s = _spot_stats(img_sharp)
    tot_b, peak_b, area_b = _spot_stats(img_blur)
    assert area_b > area_s * 2.5, (area_s, area_b)
    assert peak_b < peak_s * 0.5, (peak_s, peak_b)
    assert abs(tot_b - tot_s) < 0.5 * tot_s  # energy roughly conserved


def test_zero_aperture_equals_pinhole():
    """aperture = 0 degenerates to the pinhole camera (same pixels hit)."""
    scene = _emitter_scene(48, 48, focus_distance=2.0, aperture=0.0)
    img_dof = Renderer(scene, POL_DOF, 48, 48).render_spp(10, tonemap=False)
    img_pin = Renderer(scene, POL_PIN, 48, 48).render_spp(10, tonemap=False)
    # jitter RNG draw order differs (4 draws vs 2), so compare support not values
    np.testing.assert_array_equal(img_dof.sum(-1) > 0, img_pin.sum(-1) > 0)
