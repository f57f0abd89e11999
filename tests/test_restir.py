"""ReSTIR light sampling (light_sampling='restir'): temporal + spatial
reservoir reuse on the primary hit (reference's dormant CombineReservoirs
hook, /root/reference/Sampling.hpp:25-73, wired and carried across
accumulation passes)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cpu_raytracing_experiments_tpu.render import checkpoint, estimator
from cpu_raytracing_experiments_tpu.render.api import Renderer
from cpu_raytracing_experiments_tpu.scene import builders
from cpu_raytracing_experiments_tpu.utils.config import RendererPolicy

W = H = 32
SPP = 30


def _mean_render(light_sampling, spp=SPP, scene=None):
    pol = RendererPolicy(max_bounces=4, light_sampling=light_sampling,
                         rays_per_chunk=4096)
    r = Renderer(scene or builders.default_scene(W, H), pol, W, H)
    r.accumulate(spp)
    return r.render(tonemap=False)


def test_restir_state_allocated_and_reset():
    pol = RendererPolicy(light_sampling="restir")
    st = estimator.RenderState.create(W, H, pol)
    assert st.reservoir is not None and st.reservoir.shape == (3, W * H)
    assert float(st.reservoir[0].max()) == -1.0  # empty reservoirs
    st2 = st.reset()
    assert st2.reservoir is not None
    # non-restir policies carry no reservoir
    st3 = estimator.RenderState.create(W, H, RendererPolicy())
    assert st3.reservoir is None


def test_restir_reservoirs_populate():
    pol = RendererPolicy(max_bounces=3, light_sampling="restir",
                         rays_per_chunk=4096)
    r = Renderer(builders.default_scene(W, H), pol, W, H)
    r.accumulate(3)
    res = np.asarray(r.state.reservoir)
    # most pixels hit geometry and see a light -> sample >= 0, count grows
    frac = (res[0] >= 0).mean()
    assert frac > 0.5, frac
    assert res[2].max() > 4  # counts accumulate past one pass's M


@pytest.mark.slow
def test_restir_matches_uniform_mean():
    """Unbiasedness check: ReSTIR must estimate the same image as uniform
    light sampling (statistically, at moderate spp)."""
    ref = _mean_render("uniform", spp=60)
    img = _mean_render("restir", spp=60)
    # compare means over the image; reservoirs reuse the same lights so the
    # estimators agree in expectation
    assert abs(img.mean() - ref.mean()) / max(ref.mean(), 1e-9) < 0.05
    # per-pixel agreement in the smooth (floor) region, loose tolerance
    lo = np.minimum(img, 5.0)
    lr = np.minimum(ref, 5.0)
    assert abs(lo.mean() - lr.mean()) / max(lr.mean(), 1e-9) < 0.05


@pytest.mark.slow
def test_restir_checkpoint_resume_bit_exact(tmp_path):
    pol = RendererPolicy(max_bounces=3, light_sampling="restir",
                         rays_per_chunk=4096)
    scene = builders.default_scene(W, H)
    r1 = Renderer(scene, pol, W, H)
    r1.accumulate(6)

    r2 = Renderer(scene, pol, W, H)
    r2.accumulate(2)
    p = tmp_path / "restir.npz"
    checkpoint.save(p, r2.state, pol, W, H)
    r3 = Renderer(scene, pol, W, H)
    r3.state = checkpoint.load(p, pol, W, H)
    r3.accumulate(4)

    np.testing.assert_array_equal(
        np.asarray(r1.state.buckets), np.asarray(r3.state.buckets)
    )
    np.testing.assert_array_equal(
        np.asarray(r1.state.reservoir), np.asarray(r3.state.reservoir)
    )


@pytest.mark.slow  # non-default knob-combo compile smoke; the default
# restir path is covered by populate/matches-uniform-mean above
def test_restir_spatial_knobs_compile():
    pol = RendererPolicy(max_bounces=2, light_sampling="restir",
                         restir_spatial=0, restir_temporal_cap=4,
                         rays_per_chunk=4096)
    r = Renderer(builders.default_scene(W, H), pol, W, H)
    r.accumulate(2)
    assert np.isfinite(np.asarray(r.state.buckets)).all()
