"""End-to-end megakernel vs independent scalar oracle.

Both implementations share nothing but the algorithm spec and the RNG
schedule; per-pixel radiance must agree path-by-path (same draws -> same
light picks, same RR decisions, same directions) to float tolerance.
This is the SURVEY.md §7 milestone check ("matches a CPU oracle
implementation of the same math").
"""
import numpy as np
import jax.numpy as jnp

import oracle
from cpu_raytracing_experiments_tpu.render import renderer as prod
from cpu_raytracing_experiments_tpu.scene import builders
from cpu_raytracing_experiments_tpu.utils.config import RendererPolicy

W = H = 32
MAX_BOUNCES = 6
POL = RendererPolicy(max_bounces=MAX_BOUNCES, rays_per_chunk=1024)


def _scene_to_np(scene):
    return {
        "centers": np.stack(
            [np.asarray(scene.spheres.center.x), np.asarray(scene.spheres.center.y),
             np.asarray(scene.spheres.center.z)], axis=1,
        ).astype(np.float64),
        "radius_sq": np.asarray(scene.spheres.radius_sq, np.float64),
        "mat_id": np.asarray(scene.spheres.material_id),
        "albedo": np.stack(
            [np.asarray(scene.materials.albedo.x), np.asarray(scene.materials.albedo.y),
             np.asarray(scene.materials.albedo.z)], axis=1,
        ).astype(np.float64),
        "emission": np.stack(
            [np.asarray(scene.materials.emission.x), np.asarray(scene.materials.emission.y),
             np.asarray(scene.materials.emission.z)], axis=1,
        ).astype(np.float64),
        "f0": np.stack(
            [np.asarray(scene.materials.f0.x), np.asarray(scene.materials.f0.y),
             np.asarray(scene.materials.f0.z)], axis=1,
        ).astype(np.float64),
        "f80": np.stack(
            [np.asarray(scene.materials.f80.x), np.asarray(scene.materials.f80.y),
             np.asarray(scene.materials.f80.z)], axis=1,
        ).astype(np.float64),
        "roughness": np.asarray(scene.materials.roughness, np.float64),
        "lights": np.asarray(scene.lights),
        "ambient": np.array(
            [float(scene.sky.ambient.x), float(scene.sky.ambient.y),
             float(scene.sky.ambient.z)], np.float64,
        ),
    }


def _camera_to_np(scene):
    return {
        "half_w": float(scene.camera.half_width),
        "half_h": float(scene.camera.half_height),
        "z": float(scene.camera.z),
        "orient": [float(scene.camera.orient.x), float(scene.camera.orient.y),
                   float(scene.camera.orient.z), float(scene.camera.orient.w)],
        "pos": [float(scene.camera.pos.x), float(scene.camera.pos.y),
                float(scene.camera.pos.z)],
    }


def _compare(scene, accumulation, pixels, rtol=2e-3, atol=2e-3):
    scene_np = _scene_to_np(scene)
    cam = _camera_to_np(scene)
    rad, _ = prod.render_pass(scene, POL, jnp.uint32(accumulation), W, H)
    got = np.stack([np.asarray(rad.x), np.asarray(rad.y), np.asarray(rad.z)], 1)
    seeds = np.asarray(prod.pixel_seeds(W, H, POL))
    bad = 0
    for px in pixels:
        x, y = px % W, px // W
        want = oracle.trace_pixel(
            scene_np, x, y, accumulation, int(seeds[px]), MAX_BOUNCES, W, H, cam
        )
        if not np.allclose(got[px], want, rtol=rtol, atol=atol):
            bad += 1
            print(f"pixel ({x},{y}): got {got[px]}, oracle {want}")
    return bad


def test_default_scene_matches_oracle():
    scene = builders.default_scene(W, H)
    g = np.random.default_rng(0)
    pixels = g.choice(W * H, 48, replace=False)
    bad = 0
    for accumulation in (1, 2, 7):
        bad += _compare(scene, accumulation, pixels)
    # float32-vs-float64 drift can flip an RR coin or a tfar tie on a rare
    # path; demand near-total agreement rather than absolute
    assert bad <= 2, f"{bad} mismatching pixels"


def test_white_furnace_matches_oracle():
    scene = builders.white_furnace_scene(W, H)
    pixels = np.arange(0, W * H, 37)
    assert _compare(scene, 1, pixels) == 0


def test_ggx_mode_matches_oracle():
    """policy.brdf='ggx' end-to-end vs the oracle's GGX path (VNDF sampling,
    Lagarde G2, correct pdf in the MIS)."""
    import dataclasses

    scene = builders.brdf_test_scene(W, H)
    pol = dataclasses.replace(POL, brdf="ggx")
    scene_np = _scene_to_np(scene)
    cam = _camera_to_np(scene)
    rad, _ = prod.render_pass(scene, pol, jnp.uint32(1), W, H)
    got = np.stack([np.asarray(rad.x), np.asarray(rad.y), np.asarray(rad.z)], 1)
    seeds = np.asarray(prod.pixel_seeds(W, H, pol))
    g = np.random.default_rng(3)
    bad = 0
    for px in g.choice(W * H, 40, replace=False):
        x, y = int(px % W), int(px // W)
        want = oracle.trace_pixel_ggx(
            scene_np, x, y, 1, int(seeds[px]), MAX_BOUNCES, W, H, cam
        )
        if not np.allclose(got[px], want, rtol=3e-3, atol=3e-3):
            bad += 1
            print(f"pixel ({x},{y}): got {got[px]}, oracle {want}")
    assert bad <= 2, bad
