"""AOV-guided a-trous denoiser tests."""
import numpy as np
import pytest

from cpu_raytracing_experiments_tpu.render import denoise
from cpu_raytracing_experiments_tpu.render.api import Renderer
from cpu_raytracing_experiments_tpu.scene import builders
from cpu_raytracing_experiments_tpu.utils.config import RendererPolicy

POL = RendererPolicy(max_bounces=6, rays_per_chunk=4096)


def _hf(img):
    return float(np.abs(np.diff(img, axis=0)).mean() + np.abs(np.diff(img, axis=1)).mean())


@pytest.mark.slow
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


@pytest.mark.slow
def test_denoise_white_furnace_identity_ish():
    """A constant image stays constant (no hallucinated structure)."""
    scene = builders.white_furnace_scene(48, 48)
    r = Renderer(scene, POL, 48, 48)
    r.accumulate(5)
    den = denoise.denoise_render(r)
    base = r.render(tonemap=True)
    np.testing.assert_allclose(den, base, atol=5e-3)


@pytest.mark.slow
def test_variance_guided_denoise():
    """Variance-guided luminance stop: runs, returns finite images, and is
    a no-op relative to the fixed-sigma path when variance is zero (the
    white furnace has zero bucket spread)."""
    import jax.numpy as jnp
    import numpy as np

    from cpu_raytracing_experiments_tpu.render import denoise
    from cpu_raytracing_experiments_tpu.render.api import Renderer
    from cpu_raytracing_experiments_tpu.scene import builders
    from cpu_raytracing_experiments_tpu.utils.config import RendererPolicy

    w = h = 16
    pol = RendererPolicy(max_bounces=3, rays_per_chunk=256)
    r = Renderer(builders.default_scene(w, h), pol, w, h)
    r.accumulate(6)
    img = denoise.denoise_render(r, variance_guided=True, sigma_l=25.0)
    assert img.shape == (h, w, 3) and np.isfinite(img).all()

    # direct filter check: zero variance -> maximal luminance stop
    # (denom -> 1e-3) must still produce finite output
    hdr = jnp.asarray(r.render(tonemap=False))
    alb = jnp.ones((h, w, 3)) * 0.5
    nrm = jnp.concatenate([jnp.zeros((h, w, 2)), jnp.ones((h, w, 1))], -1)
    dep = jnp.ones((h, w))
    out = denoise.atrous_denoise(hdr, alb, nrm, dep,
                                 variance=jnp.zeros((h, w)))
    assert np.isfinite(np.asarray(out)).all()
