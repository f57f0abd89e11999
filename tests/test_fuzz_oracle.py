"""Fuzz: random sphere scenes, random cameras — megakernel vs scalar oracle.

Broadens test_oracle_parity.py beyond the curated scenes: every fuzz case
builds a random scene (random emitters, albedos, sphere layout, camera) and
demands per-pixel path agreement with the independent oracle.
"""
import numpy as np
import jax.numpy as jnp
import pytest

import oracle
from cpu_raytracing_experiments_tpu.render import renderer as prod
from cpu_raytracing_experiments_tpu.scene import builders
from cpu_raytracing_experiments_tpu.scene.builders import _SceneBuilder
from cpu_raytracing_experiments_tpu.scene.scene import Camera, Sky
from cpu_raytracing_experiments_tpu.utils.config import RendererPolicy
from test_oracle_parity import _camera_to_np, _scene_to_np

W = H = 16
MAX_BOUNCES = 5
POL = RendererPolicy(max_bounces=MAX_BOUNCES, rays_per_chunk=256)


def _random_scene(seed):
    g = np.random.default_rng(seed)
    b = _SceneBuilder()
    n_mats = int(g.integers(2, 6))
    mats = []
    for k in range(n_mats):
        emissive = g.uniform() < 0.3
        mats.append(
            b.material(
                albedo=tuple(g.uniform(0.1, 1.0, 3)),
                emission=tuple(g.uniform(1, 30, 3)) if emissive else (0, 0, 0),
                roughness=1.0,
            )
        )
    for _ in range(int(g.integers(3, 10))):
        b.sphere(
            tuple(g.uniform(-3, 3, 3)),
            float(g.uniform(0.2, 1.2)),
            mats[int(g.integers(0, n_mats))],
        )
    eye = tuple(g.uniform(-1, 1, 3) + np.array([0, 0, 6]))
    fwd = tuple(g.uniform(-0.3, 0.3, 3) + np.array([0, 0, -1]))
    cam = Camera.create(eye=eye, forward=fwd, width=W, height=H,
                        focal_length=float(g.uniform(25, 60)))
    ambient = tuple(g.uniform(0, 1, 3)) if g.uniform() < 0.5 else (0, 0, 0)
    return b.build(cam, Sky.constant(ambient))


# two seeds stay in the default gate for fuzz breadth; the full six-seed
# sweep (3x the wall) runs in ci.sh. bad-pixel budget scales with the
# number of seeds actually traced (fp32-vs-fp64 knife edges only).
@pytest.mark.parametrize(
    "seeds,budget",
    [((0, 1), 1), pytest.param(tuple(range(6)), 3, marks=pytest.mark.slow)],
)
def test_fuzz_random_scenes_match_oracle(seeds, budget):
    total_bad = 0
    for seed in seeds:
        scene = _random_scene(seed)
        if scene.num_lights == 0 and float(scene.sky.ambient.max_component()) == 0:
            continue  # black image either way
        scene_np = _scene_to_np(scene)
        cam = _camera_to_np(scene)
        accumulation = seed + 1
        rad, _ = prod.render_pass(scene, POL, jnp.uint32(accumulation), W, H)
        got = np.stack([np.asarray(rad.x), np.asarray(rad.y), np.asarray(rad.z)], 1)
        seeds = np.asarray(prod.pixel_seeds(W, H, POL))
        g = np.random.default_rng(seed + 100)
        for px in g.choice(W * H, 24, replace=False):
            x, y = int(px % W), int(px // W)
            want = oracle.trace_pixel(
                scene_np, x, y, accumulation, int(seeds[px]), MAX_BOUNCES, W, H, cam
            )
            if not np.allclose(got[px], want, rtol=3e-3, atol=3e-3):
                total_bad += 1
    # fp32-vs-fp64 knife edges (RR flips, occlusion grazing) only
    assert total_bad <= budget, total_bad
