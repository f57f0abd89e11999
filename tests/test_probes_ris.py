"""Autofocus probe, AOV rendering, and RIS reservoir tests."""
import numpy as np
import jax.numpy as jnp

from cpu_raytracing_experiments_tpu.core import ris, rng
from cpu_raytracing_experiments_tpu.render import probes
from cpu_raytracing_experiments_tpu.scene import builders
from cpu_raytracing_experiments_tpu.utils.config import RendererPolicy

POL = RendererPolicy(max_bounces=4, rays_per_chunk=1024)


def test_autofocus_probe():
    """White furnace: a center ray hits the unit sphere at distance 2
    (camera at z=3, sphere radius 1). Note the 50mm default FOV is narrower
    than the sphere's silhouette, so corner rays hit too."""
    scene = builders.white_furnace_scene(64, 64)
    d = probes.probe_depth(scene, 32, 32, 64, 64)
    assert abs(d - 2.0) < 1e-3
    assert probes.probe_depth(scene, 0, 0, 64, 64) > d
    updated = probes.autofocus(scene, 32, 32, 64, 64)
    assert abs(float(updated.camera.focus_distance) - 2.0) < 1e-3
    # miss -> infinity (Application.cpp:298 miss case): the default scene's
    # sky occupies the top of frame
    sky = builders.default_scene(64, 64)
    assert probes.probe_depth(sky, 32, 63, 64, 64) == float("inf")


def test_aovs():
    scene = builders.white_furnace_scene(48, 48)
    aovs = probes.render_aovs(scene, POL, 48, 48)
    assert aovs["depth"].shape == (48, 48)
    assert aovs["normal"].shape == (48, 48, 3)
    center = aovs["depth"][24, 24]
    assert abs(center - 2.0) < 0.05
    # corner rays hit the sphere farther away (narrow FOV, see above)
    assert aovs["depth"][0, 0] > center
    # center normal points back at the camera (+z)
    assert aovs["normal"][24, 24, 2] > 0.95
    assert aovs["prim_id"][24, 24] == 0
    assert np.allclose(aovs["albedo"][24, 24], 1.0, atol=1e-5)
    # the default scene's sky misses at top of frame
    sky_aovs = probes.render_aovs(builders.default_scene(48, 48), POL, 48, 48)
    assert np.isinf(sky_aovs["depth"][0, 0])
    assert sky_aovs["prim_id"][0, 0] == -1


def test_reservoir_proportional_selection():
    """Weighted reservoir picks candidates proportionally to weight."""
    n = 200000
    weights = np.array([1.0, 3.0, 6.0], np.float32)
    state = rng.hash_2d(jnp.uint32(7), jnp.arange(n, dtype=jnp.uint32))
    r = ris.Reservoir.empty((n,))
    for i, w in enumerate(weights):
        state, u = rng.rand_unit_float(state)
        r = r.update(jnp.full((n,), i, jnp.int32), jnp.float32(w), u)
    sel = np.asarray(r.sample)
    freq = np.bincount(sel, minlength=3) / n
    np.testing.assert_allclose(freq, weights / weights.sum(), atol=0.01)


def test_ris_unbiased_estimator():
    """RIS estimate of E_p_hat-weighted integrand: with target p_hat == f,
    the estimator f(x) * W should average to sum(f)/K * K ... i.e. the
    integral of f over the uniform source."""
    n = 100000
    k = 8  # discrete domain size
    f = np.array([0.1, 0.9, 0.4, 0.2, 0.7, 0.05, 0.3, 0.6], np.float32)
    f_j = jnp.asarray(f)
    state0 = rng.hash_2d(jnp.uint32(3), jnp.arange(n, dtype=jnp.uint32))

    def src(i, state):
        state, cand = rng.rand_bounded_int(state, jnp.uint32(k))
        return state, cand.astype(jnp.int32), jnp.full((n,), float(k))

    def weight(cand):
        return f_j[cand]

    _, sample, w = ris.ris(4, src, weight, state0)
    est = np.asarray(f_j[np.maximum(np.asarray(sample), 0)] * np.asarray(w))
    # E[f(x) W] = sum_x f(x) (integral over uniform counting measure)
    np.testing.assert_allclose(est.mean(), f.sum(), rtol=0.02)


def test_ambient_occlusion():
    from cpu_raytracing_experiments_tpu.render import ao

    scene = builders.default_scene(48, 48)
    img = ao.render_ao(scene, POL, 48, 48, samples=16, radius=2.0)
    assert img.shape == (48, 48, 3)
    assert img.min() >= 0.0 and img.max() <= 1.0
    # sky pixels are fully unoccluded; crevices (between floor and small
    # spheres) darker than open floor
    assert img.max() == 1.0
    assert img.min() < 0.9  # some occlusion exists in the hero scene
    # deterministic
    img2 = ao.render_ao(scene, POL, 48, 48, samples=16, radius=2.0)
    np.testing.assert_array_equal(img, img2)


def test_aovs_multisample_averaging():
    scene = builders.default_scene(32, 32)
    a1 = probes.render_aovs(scene, POL, 32, 32, samples=1)
    a4 = probes.render_aovs(scene, POL, 32, 32, samples=4)
    # averaged normals stay unit where hit
    hit = a4["prim_id"] >= 0
    norms = np.linalg.norm(a4["normal"][hit], axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)
    # averaging changes edge pixels but not interiors much
    assert not np.allclose(a1["albedo"], a4["albedo"])
    fin = np.isfinite(a1["depth"]) & np.isfinite(a4["depth"])
    assert np.abs(a1["depth"][fin] - a4["depth"][fin]).mean() < 0.5
