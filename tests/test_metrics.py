"""Metrics/observability tests."""
import json
import pytest

import numpy as np

from cpu_raytracing_experiments_tpu.utils import metrics


def test_ewma_matches_reference_alpha():
    """alpha = 2/(N+1) with N=64 (Application.cpp:310-311)."""
    e = metrics.Ewma(64)
    assert abs(e.alpha - 2.0 / 65.0) < 1e-12
    assert e.update(10.0) == 10.0
    v = e.update(20.0)
    assert abs(v - (10.0 + (2 / 65) * 10.0)) < 1e-9


def test_bucket_variance_estimate():
    """For iid N(mu, sigma^2) samples split into B buckets, the estimator
    approximates sigma^2 / n_total."""
    g = np.random.default_rng(0)
    b, per_bucket, npix = 5, 200, 64
    sigma = 2.0
    samples = g.normal(5.0, sigma, (b, per_bucket, 3, npix))
    buckets = samples.sum(axis=1)  # [B, 3, npix] sums
    est = metrics.bucket_variance_estimate(buckets, accumulations=b * per_bucket)
    want = sigma**2 / (b * per_bucket)
    assert abs(est - want) < 0.3 * want


def test_jsonl_logging(tmp_path):
    p = tmp_path / "m.jsonl"
    log = metrics.MetricsLogger(p, quiet=True)
    log.log_step(spp=5, step_wall=0.5, width=64, height=64, rays=100000)
    log.log(event="done", foo=1)
    lines = [json.loads(x) for x in p.read_text().splitlines()]
    assert len(lines) == 2
    assert lines[0]["event"] == "step"
    assert lines[0]["Mrays_per_s"] == 0.2
    assert lines[0]["Msamples_per_s"] == round(64 * 64 / 0.5 / 1e6, 3)
    assert lines[1] == {"event": "done", "foo": 1}


@pytest.mark.slow
def test_stage_shares_smoke():
    """Profiling ablation utility runs and returns sane components."""
    from cpu_raytracing_experiments_tpu.scene import builders
    from cpu_raytracing_experiments_tpu.utils.config import RendererPolicy
    from cpu_raytracing_experiments_tpu.utils.profiling import stage_shares

    scene = builders.default_scene(16, 16)
    pol = RendererPolicy(max_bounces=3, rays_per_chunk=256)
    shares = stage_shares(scene, pol, 16, 16, repeats=2)
    assert shares["full_s"] > 0
    assert 0 <= shares["nee_shadow_s"] <= shares["full_s"]
    # generous margin: wall-clock ratios on a loaded 1-core CI box are noisy
    # (first_bounce times a 1-bounce variant vs the 3-bounce full loop; a
    # compile-cache miss or co-running job can invert them). full_s at this
    # 16x16 size is single-digit ms, so a pure ratio bound still flaked
    # under suite load (round-5 ci run) — the +50 ms absolute grace absorbs
    # one scheduler hiccup while keeping the sanity check meaningful
    assert shares["first_bounce_s"] <= shares["full_s"] * 4.0 + 0.05


def test_pixel_variance_map_and_adaptive_stop():
    """variance_map: zero on the deterministic white furnace, positive on the
    noisy hero scene; render_to_tolerance stops early when converged."""
    from cpu_raytracing_experiments_tpu.render.api import Renderer
    from cpu_raytracing_experiments_tpu.scene import builders
    from cpu_raytracing_experiments_tpu.utils.config import RendererPolicy

    pol = RendererPolicy(max_bounces=4, rays_per_chunk=1024)
    # white furnace: every sample is exactly 1.0 -> zero bucket spread ->
    # tolerance met at the first check
    furnace = Renderer(builders.white_furnace_scene(16, 16), pol, 16, 16)
    img = furnace.render_to_tolerance(tol=1e-4, max_spp=100, tonemap=False)
    assert int(furnace.state.accumulations) == 25  # one 5*B chunk, then stop
    np.testing.assert_allclose(img, 1.0, atol=1e-5)
    assert furnace.variance_map().max() < 1e-10
    # hero scene is noisy: variance positive, a tight tolerance runs to cap
    hero = Renderer(builders.default_scene(16, 16), pol, 16, 16)
    hero.render_to_tolerance(tol=1e-12, max_spp=50, tonemap=False)
    assert int(hero.state.accumulations) == 50
    v = hero.variance_map()
    assert v.shape == (16, 16)
    assert v.max() > 0
