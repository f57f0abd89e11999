"""AOV-guided a-trous denoiser tests."""
import numpy as np

from cpu_raytracing_experiments_tpu.render import denoise
from cpu_raytracing_experiments_tpu.render.api import Renderer
from cpu_raytracing_experiments_tpu.scene import builders
from cpu_raytracing_experiments_tpu.utils.config import RendererPolicy

POL = RendererPolicy(max_bounces=6, rays_per_chunk=4096)


def _hf(img):
    return float(np.abs(np.diff(img, axis=0)).mean() + np.abs(np.diff(img, axis=1)).mean())


def test_denoise_reduces_noise_preserves_mean_and_edges():
    scene = builders.default_scene(96, 96)
    r = Renderer(scene, POL, 96, 96)
    r.accumulate(10)
    noisy = r.render(tonemap=True)
    den = denoise.denoise_render(r)
    assert den.shape == noisy.shape
    # large noise reduction
    assert _hf(den) < 0.4 * _hf(noisy), (_hf(noisy), _hf(den))
    # energy approximately preserved
    assert abs(den.mean() - noisy.mean()) < 0.15 * max(noisy.mean(), 1e-6)
    # geometric edges survive: true sky pixels (depth == inf from the AOV)
    # must not receive bleed from the lit geometry
    from cpu_raytracing_experiments_tpu.render import probes

    aovs = probes.render_aovs(scene, POL, 96, 96)
    sky = ~np.isfinite(aovs["depth"])
    assert sky.sum() > 100
    assert (den[sky].sum(-1) < 0.05).mean() > 0.97


def test_denoise_white_furnace_identity_ish():
    """A constant image stays constant (no hallucinated structure)."""
    scene = builders.white_furnace_scene(48, 48)
    r = Renderer(scene, POL, 48, 48)
    r.accumulate(5)
    den = denoise.denoise_render(r)
    base = r.render(tonemap=True)
    np.testing.assert_allclose(den, base, atol=5e-3)
