"""Golden-image regression tests.

Fixed-seed CPU renders compared against checked-in references: any change
to the integrator, RNG schedule, estimator, or sampling math that alters
radiance shows up here immediately. Tolerance is loose enough for
XLA-version fusion/rounding drift but catches real regressions (which move
many pixels by large margins).

Regenerate intentionally with:
  python -c "... see tests/goldens/README ..."
"""
from pathlib import Path

import numpy as np

from cpu_raytracing_experiments_tpu.render.api import Renderer
from cpu_raytracing_experiments_tpu.scene import builders
from cpu_raytracing_experiments_tpu.utils.config import RendererPolicy

GOLDEN_DIR = Path(__file__).parent / "goldens"
POL = RendererPolicy(max_bounces=6, rays_per_chunk=1024)


def _render(scene):
    r = Renderer(scene, POL, 32, 32)
    r.accumulate(10)
    return r.render(tonemap=False)


def _check(name, img):
    want = np.load(GOLDEN_DIR / f"{name}_32x32_10spp.npy")
    close = np.isclose(img, want, rtol=1e-3, atol=1e-4)
    assert close.mean() > 0.995, (
        f"{name}: {100 * (1 - close.mean()):.2f}% of pixels deviate from golden"
    )
    np.testing.assert_allclose(img.mean(), want.mean(), rtol=1e-3)


def test_golden_hero():
    _check("hero", _render(builders.default_scene(32, 32)))


def test_golden_cornell():
    _check("cornell", _render(builders.cornell_box_scene(32, 32)))
