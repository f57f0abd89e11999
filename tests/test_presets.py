"""Render-model presets."""
import numpy as np
import pytest

from cpu_raytracing_experiments_tpu.models import presets
from cpu_raytracing_experiments_tpu.render.api import Renderer
from cpu_raytracing_experiments_tpu.scene import builders


def test_presets_lookup_and_override():
    p = presets.get("production")
    assert p.brdf == "principled" and p.light_sampling == "power"
    q = presets.get("production", max_bounces=6)
    assert q.max_bounces == 6
    assert presets.get("reference_compat").sky_bug_compat


@pytest.mark.slow
def test_every_preset_renders():
    import dataclasses

    scene = builders.default_scene(16, 16)
    for name, pol in presets.PRESETS.items():
        small = dataclasses.replace(pol, rays_per_chunk=256, max_bounces=min(pol.max_bounces, 4))
        img = Renderer(scene, small, 16, 16).render_spp(5, tonemap=False)
        assert np.isfinite(img).all(), name


def test_cli_exposure_flag_wiring():
    import argparse

    from cpu_raytracing_experiments_tpu import cli

    args = argparse.Namespace(
        scene="white_furnace", width=32, height=32, spheres=None, subdiv=None,
        prop=None, hdri=None, sky=None, bvh=False, grid=False, grid_res=32,
        clustered=False, clusters=64, exposure=0.25,
    )
    scene = cli._build_scene(args)
    assert float(scene.camera.exposure) == 0.25
