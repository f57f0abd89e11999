"""Integrator semantic tests: white furnace, determinism, resume-equivalence
(SURVEY.md §4: the reference's only correctness scaffolding is the
White_Furnace scene; we add statistical and invariance tests around it)."""
import numpy as np
import pytest
import jax.numpy as jnp

from cpu_raytracing_experiments_tpu.render import estimator
from cpu_raytracing_experiments_tpu.render.api import Renderer
from cpu_raytracing_experiments_tpu.scene import builders
from cpu_raytracing_experiments_tpu.utils.config import RendererPolicy

POL = RendererPolicy(max_bounces=8, rays_per_chunk=4096)


def test_white_furnace_energy_conservation():
    """Unit albedo sphere in unit sky: every pixel must be exactly 1.0
    (Application.cpp:218-223)."""
    scene = builders.white_furnace_scene(64, 64)
    r = Renderer(scene, POL, 64, 64)
    img = r.render_spp(5, tonemap=False)
    np.testing.assert_allclose(img, 1.0, atol=1e-5)


def test_grey_furnace_unbiased():
    """albedo-0.5 furnace: sphere pixels average to 0.5 (RR keeps the
    estimator unbiased), sky pixels are exactly 1."""
    import dataclasses

    scene = builders.white_furnace_scene(64, 64)
    mats = scene.materials
    albedo = dataclasses.replace(scene)  # noqa: F841 (structure check)
    half = jnp.full_like(mats.albedo.x, 0.5)
    from cpu_raytracing_experiments_tpu.core.vec import Vec3

    scene = dataclasses.replace(
        scene, materials=dataclasses.replace(mats, albedo=Vec3(half, half, half))
    )
    r = Renderer(scene, POL, 64, 64)
    img = r.render_spp(100, tonemap=False)
    sky_mask = np.isclose(img, 1.0, atol=1e-6).all(axis=-1)
    sphere_pixels = img[~sky_mask]
    assert sphere_pixels.size > 100  # the sphere is visible now
    assert abs(sphere_pixels.mean() - 0.5) < 0.03


def test_determinism():
    scene = builders.default_scene(64, 64)
    a = Renderer(scene, POL, 64, 64)
    a.accumulate(5)
    b = Renderer(scene, POL, 64, 64)
    b.accumulate(5)
    np.testing.assert_array_equal(
        np.asarray(a.state.buckets), np.asarray(b.state.buckets)
    )


@pytest.mark.slow
def test_resume_equivalence():
    """Counter-based RNG: 10 passes in one call == 5 + 5 across two calls,
    bit-exactly (the checkpoint/resume invariant, SURVEY.md §5)."""
    scene = builders.default_scene(32, 32)
    a = Renderer(scene, POL, 32, 32)
    a.accumulate(10)
    b = Renderer(scene, POL, 32, 32)
    b.accumulate(5)
    b.accumulate(5)
    np.testing.assert_array_equal(
        np.asarray(a.state.buckets), np.asarray(b.state.buckets)
    )
    assert int(a.state.accumulations) == int(b.state.accumulations) == 10


def test_default_scene_sane():
    scene = builders.default_scene(64, 64)
    r = Renderer(scene, POL, 64, 64)
    img = r.render_spp(5, tonemap=False)
    assert np.isfinite(img).all()
    assert (img >= 0).all()
    assert img.max() > 0  # lights visible


def test_tonemapped_output_in_range():
    scene = builders.default_scene(64, 64)
    img = Renderer(scene, POL, 64, 64).render_spp(5, tonemap=True)
    assert img.min() >= 0.0 and img.max() <= 1.0


@pytest.mark.slow
def test_variance_decays_with_spp():
    """Monte Carlo convergence: bucket disagreement shrinks ~1/N."""
    scene = builders.default_scene(32, 32)
    r = Renderer(scene, POL, 32, 32)
    r.accumulate(5)
    early = np.asarray(r.state.buckets).std(axis=0).mean() / 1.0
    r.accumulate(45)
    late = np.asarray(r.state.buckets).std(axis=0).mean() / 10.0
    assert late < early * 0.6


def test_sky_bug_compat_flag():
    """The reference scales all three sky channels by throughput.r
    (Renderer.hpp:416-418); compat mode must reproduce that, default must
    not. Visible whenever throughput is colored."""
    import dataclasses
    from cpu_raytracing_experiments_tpu.core.vec import Vec3

    scene = builders.white_furnace_scene(48, 48)
    mats = scene.materials
    colored = dataclasses.replace(
        mats,
        albedo=Vec3(
            jnp.full_like(mats.albedo.x, 0.9),
            jnp.full_like(mats.albedo.x, 0.2),
            jnp.full_like(mats.albedo.x, 0.2),
        ),
    )
    scene = dataclasses.replace(scene, materials=colored)
    fixed = Renderer(scene, POL, 48, 48)
    fixed.accumulate(5)
    buggy_pol = RendererPolicy(max_bounces=8, rays_per_chunk=4096, sky_bug_compat=True)
    buggy = Renderer(scene, buggy_pol, 48, 48)
    buggy.accumulate(5)
    a = np.asarray(fixed.state.buckets)
    bb = np.asarray(buggy.state.buckets)
    assert not np.array_equal(a, bb)
    # red channel identical (throughput.r * sky.r either way)
    np.testing.assert_array_equal(a[:, 0], bb[:, 0])
    # buggy green channel uses red throughput -> strictly more green energy here
    assert bb[:, 1].sum() > a[:, 1].sum()


@pytest.mark.slow
def test_no_mis_mode_converges_to_same_image():
    """MIS on/off are both unbiased: long-run means agree (loose tol)."""
    scene = builders.default_scene(32, 32)
    mis = Renderer(scene, POL, 32, 32)
    mis.accumulate(200)
    no_mis_pol = RendererPolicy(max_bounces=8, rays_per_chunk=4096, mis=False)
    plain = Renderer(scene, no_mis_pol, 32, 32)
    plain.accumulate(200)
    a = np.asarray(mis.state.buckets).sum(axis=0) / 200
    b = np.asarray(plain.state.buckets).sum(axis=0) / 200
    # compare means of the (smooth) lit regions
    assert abs(a.mean() - b.mean()) < 0.15 * max(a.mean(), 1e-3)


def test_cornell_scene_renders():
    scene = builders.cornell_box_scene(48, 48)
    r = Renderer(scene, POL, 48, 48)
    img = r.render_spp(10, tonemap=False)
    assert np.isfinite(img).all()
    assert img.max() > 0.01  # light reaches the film


def test_estimator_bucket_rotation_and_reset():
    scene = builders.white_furnace_scene(16, 16)
    r = Renderer(scene, POL, 16, 16)
    r.accumulate(3)
    buckets = np.asarray(r.state.buckets)
    filled = (buckets != 0).any(axis=(1, 2))
    # accumulations 1,2,3 land in buckets 1,2,3 (bucket = acc % 5)
    np.testing.assert_array_equal(filled, [False, True, True, True, False])
    r.reset_accumulator()
    assert int(r.state.accumulations) == 0
    assert (np.asarray(r.state.buckets) == 0).all()


def test_median_suppresses_fireflies():
    """A huge outlier in one bucket must not leak into the median resolve."""
    scene = builders.white_furnace_scene(16, 16)
    r = Renderer(scene, POL, 16, 16)
    r.accumulate(5)
    corrupted = r.state.buckets.at[2, 0, 0].set(1e6)
    r.state = estimator.RenderState(corrupted, r.state.accumulations)
    img = r.render(tonemap=False)
    assert img.max() < 10.0  # outlier suppressed
    avg_pol = RendererPolicy(max_bounces=8, rays_per_chunk=4096, median=False)
    r2 = Renderer(scene, avg_pol, 16, 16)
    r2.accumulate(5)
    r2.state = estimator.RenderState(
        r2.state.buckets.at[2, 0, 0].set(1e6), r2.state.accumulations
    )
    img2 = r2.render(tonemap=False)
    assert img2.max() > 1e4  # average-of-buckets lets it through


def test_nonstandard_bucket_count():
    """accumulation_buckets != 5 uses the generic median path
    (Renderer.hpp requires exactly 5; we generalize to any odd count)."""
    import dataclasses

    scene = builders.white_furnace_scene(16, 16)
    pol = dataclasses.replace(POL, accumulation_buckets=3)
    r = Renderer(scene, pol, 16, 16)
    img = r.render_spp(6, tonemap=False)  # 6 = 2 rounds of 3 buckets
    assert r.state.buckets.shape[0] == 3
    np.testing.assert_allclose(img, 1.0, atol=1e-5)


@pytest.mark.slow
def test_wide_launch_bit_identical():
    """accumulate_wide / passes_per_launch: k passes traced as one wide
    wavefront launch (per-lane accumulation indices) must be bit-identical
    to k sequential passes — the counter RNG keys every draw by
    (accumulation, pixel), never by launch shape. Covers spp>1 and a
    narrowing-enabled policy. rays_per_chunk is kept >= the widest launch
    so both schedules compile inline: the lax.map microbatch body rounds
    some fusions differently than inline execution (a pre-existing
    rays_per_chunk property, see utils/config.py), and RR threshold flips
    amplify any rounding change — same-schedule comparisons are the
    bit-exact contract."""
    scene = builders.default_scene(32, 32)
    for pol in (
        RendererPolicy(max_bounces=8, rays_per_chunk=8192),
        RendererPolicy(max_bounces=8, rays_per_chunk=16384,
                       samples_per_pixel=2),
        RendererPolicy(max_bounces=6, rays_per_chunk=8192,
                       narrow_wavefront=True, narrow_factors=(2,)),
    ):
        seq = RendererPolicy(**{
            **{f.name: getattr(pol, f.name)
               for f in __import__("dataclasses").fields(pol)},
            "passes_per_launch": 1,
        })
        a = Renderer(scene, seq, 32, 32)
        for _ in range(6):
            a.accumulate(1)
        b = Renderer(scene, pol, 32, 32)  # auto k: 6 passes in one launch
        b.accumulate(6)
        np.testing.assert_array_equal(
            np.asarray(a.state.buckets), np.asarray(b.state.buckets)
        )
        assert int(b.state.accumulations) == 6


def test_accumulate_n_auto_width_matches_sequential():
    """accumulate_n with 'auto' launch width (wide path + remainder) equals
    the sequential schedule bit-exactly, and the counter advances by n."""
    scene = builders.cornell_box_scene(24, 24)
    pol = RendererPolicy(max_bounces=5, rays_per_chunk=4096)
    a_state = estimator.RenderState.create(24, 24, pol)
    a_state = estimator.accumulate_n(scene, pol, a_state, 24, 24, 7)
    b = Renderer(scene, RendererPolicy(max_bounces=5, rays_per_chunk=4096,
                                       passes_per_launch=1), 24, 24)
    for _ in range(7):
        b.accumulate(1)
    np.testing.assert_array_equal(
        np.asarray(a_state.buckets), np.asarray(b.state.buckets)
    )
    assert int(a_state.accumulations) == 7


def test_chunk_padding_is_dead_and_invisible():
    """nrays % rays_per_chunk != 0 pads the last chunk; padded lanes must
    trace DEAD (no duplicate pixel-0 work, no useful-ray inflation) and the
    image must be bit-identical to an unchunked render."""
    import jax
    import jax.numpy as jnp

    from cpu_raytracing_experiments_tpu.render import renderer as RR
    from cpu_raytracing_experiments_tpu.scene import builders

    w, h = 48, 40  # 1920 rays
    scene = builders.default_scene(w, h)
    pol_one = RendererPolicy(max_bounces=4, rays_per_chunk=4096)  # 1 chunk
    pol_pad = RendererPolicy(max_bounces=4, rays_per_chunk=512)  # 1920 = 3.75 chunks

    f1, c1 = jax.jit(lambda s: RR.render_pass(s, pol_one, jnp.uint32(1), w, h))(scene)
    f2, c2 = jax.jit(lambda s: RR.render_pass(s, pol_pad, jnp.uint32(1), w, h))(scene)
    np.testing.assert_array_equal(np.asarray(f1.x), np.asarray(f2.x))
    np.testing.assert_array_equal(np.asarray(f1.y), np.asarray(f2.y))
    np.testing.assert_array_equal(np.asarray(f1.z), np.asarray(f2.z))
    # identical useful-ray count: padding contributes zero
    assert int(c1) == int(c2)
