"""Power-proportional NEE light selection ('COSA A INVESTIGAR',
Renderer.hpp:260): unbiasedness vs uniform, and variance reduction on
many-light scenes."""
import dataclasses

import numpy as np

from cpu_raytracing_experiments_tpu.render.api import Renderer
from cpu_raytracing_experiments_tpu.scene import builders
from cpu_raytracing_experiments_tpu.scene.builders import _SceneBuilder
from cpu_raytracing_experiments_tpu.scene.scene import Camera, Sky
from cpu_raytracing_experiments_tpu.utils.config import RendererPolicy

POL_U = RendererPolicy(max_bounces=4, rays_per_chunk=2048)
POL_P = dataclasses.replace(POL_U, light_sampling="power")


def _many_light_scene(width=32, height=32):
    """A floor lit by one strong nearby light + 15 weak distant ones —
    the case where uniform selection wastes 15/16 of its shadow rays."""
    b = _SceneBuilder()
    floor = b.material(albedo=(0.8, 0.8, 0.8), roughness=1.0)
    b.sphere((0.0, -100.5, 0.0), 100.0, floor)
    strong = b.material(emission=(80.0, 80.0, 80.0), albedo=(1, 1, 1))
    b.sphere((0.0, 1.2, 0.0), 0.15, strong)
    weak = b.material(emission=(0.4, 0.4, 0.4), albedo=(1, 1, 1))
    g = np.random.default_rng(5)
    for _ in range(15):
        b.sphere(
            (float(g.uniform(-30, 30)), float(g.uniform(15, 40)),
             float(g.uniform(-30, 30))),
            0.3,
            weak,
        )
    cam = Camera.create(eye=(0, 1.2, 4), forward=(0, -0.25, -1),
                        width=width, height=height)
    return b.build(cam, Sky.constant((0.0, 0.0, 0.0)))


def test_power_sampling_unbiased():
    """Long-run means agree between uniform and power selection."""
    scene = _many_light_scene()
    a = Renderer(scene, POL_U, 32, 32)
    a.accumulate(300)
    b = Renderer(scene, POL_P, 32, 32)
    b.accumulate(300)
    ma = np.asarray(a.state.buckets).sum(0) / 300
    mb = np.asarray(b.state.buckets).sum(0) / 300
    assert abs(ma.mean() - mb.mean()) < 0.05 * max(ma.mean(), 1e-6), (
        ma.mean(), mb.mean(),
    )


def test_power_sampling_reduces_variance():
    """Bucket spread (per-pixel variance proxy) drops with power selection
    on the many-light scene."""
    scene = _many_light_scene()
    a = Renderer(scene, POL_U, 32, 32)
    a.accumulate(100)
    b = Renderer(scene, POL_P, 32, 32)
    b.accumulate(100)
    var_u = np.asarray(a.state.buckets).std(axis=0).mean()
    var_p = np.asarray(b.state.buckets).std(axis=0).mean()
    assert var_p < var_u * 0.8, (var_u, var_p)


def test_power_sampling_single_light_matches_uniform():
    """With exactly one light the two modes are bit-identical."""
    scene = builders.default_scene(16, 16)
    import jax.numpy as jnp
    import dataclasses as dc

    # keep only the first light by zeroing the other emissive materials
    mats = scene.materials
    from cpu_raytracing_experiments_tpu.core.vec import Vec3

    keep = int(scene.spheres.material_id[int(scene.lights[0])])
    mask = jnp.arange(mats.emission.x.shape[0]) == keep
    em = Vec3(
        jnp.where(mask, mats.emission.x, 0.0),
        jnp.where(mask, mats.emission.y, 0.0),
        jnp.where(mask, mats.emission.z, 0.0),
    )
    from cpu_raytracing_experiments_tpu.scene import edit

    scene = dc.replace(scene, materials=dc.replace(mats, emission=em))
    scene = edit.apply_invalidation(scene, edit.SceneUpdate.MATERIAL)
    assert scene.num_lights == 1
    a = Renderer(scene, POL_U, 16, 16)
    a.accumulate(5)
    b = Renderer(scene, POL_P, 16, 16)
    b.accumulate(5)
    np.testing.assert_array_equal(
        np.asarray(a.state.buckets), np.asarray(b.state.buckets)
    )


def test_ris_sampling_unbiased():
    """RIS mode (M-candidate reservoir, NEE-only direct light) converges to
    the same image as uniform+MIS."""
    scene = _many_light_scene()
    pol_ris = dataclasses.replace(POL_U, light_sampling="ris")
    a = Renderer(scene, POL_U, 32, 32)
    a.accumulate(300)
    b = Renderer(scene, pol_ris, 32, 32)
    b.accumulate(300)
    ma = np.asarray(a.state.buckets).sum(0) / 300
    mb = np.asarray(b.state.buckets).sum(0) / 300
    assert abs(ma.mean() - mb.mean()) < 0.05 * max(ma.mean(), 1e-6), (
        ma.mean(), mb.mean(),
    )


def test_ris_reduces_variance_on_many_lights():
    scene = _many_light_scene()
    pol_ris = dataclasses.replace(POL_U, light_sampling="ris")
    a = Renderer(scene, POL_U, 32, 32)
    a.accumulate(100)
    b = Renderer(scene, pol_ris, 32, 32)
    b.accumulate(100)
    var_u = np.asarray(a.state.buckets).std(axis=0).mean()
    var_r = np.asarray(b.state.buckets).std(axis=0).mean()
    assert var_r < var_u, (var_u, var_r)


POL_A = dataclasses.replace(POL_U, light_sampling="alias")


def test_alias_table_distribution():
    """The Vose table reproduces the static power pmf exactly: summing
    each bin's kept mass (prob/L to itself) and donated mass (1-prob)/L to
    its alias recovers pdf, and the stored per-prim pdfs match."""
    from cpu_raytracing_experiments_tpu.scene.scene import build_light_alias

    scene = _many_light_scene()
    la = scene.light_alias
    assert la is not None
    tbl = np.asarray(la.table)
    L = tbl.shape[0]
    prob, alias, pdf, pdf_alias = tbl[:, 0], tbl[:, 1].astype(int), tbl[:, 2], tbl[:, 3]
    # reconstruct the pmf from the alias structure
    recon = prob / L
    for i in range(L):
        recon[alias[i]] += (1.0 - prob[i]) / L
    np.testing.assert_allclose(recon, pdf, rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(pdf[alias], pdf_alias, rtol=0, atol=0)
    np.testing.assert_allclose(pdf.sum(), 1.0, rtol=1e-5)
    # per-prim tables carry the same pdfs at the light prims, 0 elsewhere
    sp = np.asarray(la.sphere_pdf)
    lights = np.asarray(scene.lights)
    np.testing.assert_allclose(sp[lights], pdf[: len(lights)], rtol=0)
    mask = np.ones(len(sp), bool)
    mask[lights] = False
    assert (sp[mask] == 0).all()
    # rebuild matches (edit.apply_invalidation path)
    la2 = build_light_alias(scene)
    np.testing.assert_array_equal(np.asarray(la2.table), tbl)


def test_alias_sampling_unbiased():
    """Long-run means agree between uniform and alias selection (the exact
    selection pdf feeds the same MIS, so the estimator stays unbiased)."""
    scene = _many_light_scene()
    a = Renderer(scene, POL_U, 32, 32)
    a.accumulate(300)
    b = Renderer(scene, POL_A, 32, 32)
    b.accumulate(300)
    ma = np.asarray(a.state.buckets).sum(0) / 300
    mb = np.asarray(b.state.buckets).sum(0) / 300
    assert abs(ma.mean() - mb.mean()) < 0.05 * max(ma.mean(), 1e-6), (
        ma.mean(), mb.mean(),
    )


def test_alias_reduces_variance_like_power():
    """On the strong+weak many-light scene the static power weights give
    most of per-ray power selection's variance win."""
    scene = _many_light_scene()
    a = Renderer(scene, POL_U, 32, 32)
    a.accumulate(100)
    b = Renderer(scene, POL_A, 32, 32)
    b.accumulate(100)
    var_u = np.asarray(a.state.buckets).std(axis=0).mean()
    var_a = np.asarray(b.state.buckets).std(axis=0).mean()
    assert var_a < var_u * 0.8, (var_u, var_a)


def test_alias_many_light_scene_renders():
    """512-emitter scene: selection cost is O(1) in L (one alias-row gather
    + one per-prim pdf gather); render is finite and lit."""
    b = _SceneBuilder()
    floor = b.material(albedo=(0.8, 0.8, 0.8), roughness=1.0)
    b.sphere((0.0, -100.5, 0.0), 100.0, floor)
    g = np.random.default_rng(11)
    for _ in range(512):
        em = float(g.uniform(0.5, 60.0))
        m = b.material(emission=(em, em * 0.9, em * 0.7), albedo=(1, 1, 1))
        b.sphere(
            (float(g.uniform(-40, 40)), float(g.uniform(2, 50)),
             float(g.uniform(-40, 40))),
            float(g.uniform(0.1, 0.5)), m,
        )
    from cpu_raytracing_experiments_tpu.scene.scene import Camera, Sky

    cam = Camera.create(eye=(0, 3, 30), forward=(0, -0.1, -1), width=24, height=24)
    scene = b.build(cam, Sky.constant((0.0, 0.0, 0.0)))
    assert int(scene.lights.shape[0]) == 512
    pol = dataclasses.replace(POL_A, max_bounces=3, rays_per_chunk=576)
    r = Renderer(scene, pol, 24, 24)
    r.accumulate(10)
    img = r.render(tonemap=False)
    assert np.isfinite(img).all()
    assert img.mean() > 0.01
