"""Tests for coherence sort, bitmanip, scene editing, multi-spp, GGX."""
import dataclasses
import pytest

import numpy as np
import jax.numpy as jnp

from cpu_raytracing_experiments_tpu.core import bitmanip
from cpu_raytracing_experiments_tpu.ops import sort as ray_sort
from cpu_raytracing_experiments_tpu.render.api import Renderer
from cpu_raytracing_experiments_tpu.scene import builders, edit
from cpu_raytracing_experiments_tpu.utils.config import RendererPolicy

POL = RendererPolicy(max_bounces=6, rays_per_chunk=2048)


# ---------------------------------------------------------------------------
# ops/sort.py — counting-sort semantics (DataStreams.hpp:221-253)
# ---------------------------------------------------------------------------
def test_sort_ray_ids():
    mat = jnp.asarray([2, -1, 0, 2, -1, 1, 0, 2], jnp.int32)
    ids, miss = ray_sort.sort_ray_ids(mat, num_materials=3)
    ids = np.asarray(ids)
    assert int(miss) == 2
    # misses first, then stable by material
    np.testing.assert_array_equal(ids, [1, 4, 2, 6, 5, 0, 3, 7])


def test_histogram():
    keys = jnp.asarray([0, 1, 1, 3, 3, 3], jnp.int32)
    np.testing.assert_array_equal(
        np.asarray(ray_sort.histogram(keys, 4)), [1, 2, 0, 3]
    )


def test_compaction_order():
    alive = jnp.asarray([False, True, False, True, True], bool)
    order, n = ray_sort.compaction_order(alive)
    assert int(n) == 3
    np.testing.assert_array_equal(np.asarray(order), [1, 3, 4, 0, 2])


# ---------------------------------------------------------------------------
# core/bitmanip.py
# ---------------------------------------------------------------------------
def test_popcount():
    xs = jnp.asarray([0, 1, 0xFF, 0xFFFFFFFF, 0x80000001], jnp.uint32)
    np.testing.assert_array_equal(np.asarray(bitmanip.popcount32(xs)), [0, 1, 8, 32, 2])


def test_morton_roundtrip():
    g = np.random.default_rng(0)
    x = jnp.asarray(g.integers(0, 1 << 16, 100), jnp.uint32)
    y = jnp.asarray(g.integers(0, 1 << 16, 100), jnp.uint32)
    code = bitmanip.morton_encode2d(x, y)
    dx, dy = bitmanip.morton_decode2d(code)
    np.testing.assert_array_equal(np.asarray(dx), np.asarray(x))
    np.testing.assert_array_equal(np.asarray(dy), np.asarray(y))
    # morton(2,3): x bits -> even, y bits -> odd: 0b1110 = 14
    assert int(bitmanip.morton_encode2d(jnp.uint32(2), jnp.uint32(3))) == 14


def test_round_up_pow2():
    xs = jnp.asarray([1, 2, 3, 5, 16, 17, 1000], jnp.uint32)
    np.testing.assert_array_equal(
        np.asarray(bitmanip.round_up_pow2(xs)), [1, 2, 4, 8, 16, 32, 1024]
    )


# ---------------------------------------------------------------------------
# scene/edit.py — UpdateTracker semantics (Application.cpp:335-358, 508-510)
# ---------------------------------------------------------------------------
def test_edit_flags_and_invalidation():
    scene = builders.default_scene(32, 32)
    s2, flags = edit.set_sphere(scene, 0, position=(1.0, 2.0, 3.0))
    assert flags == edit.SceneUpdate.GEOMETRY
    assert flags.needs_bvh and flags.needs_light_list
    assert float(s2.spheres.center.x[0]) == 1.0

    s3, flags = edit.set_material(scene, 0, albedo=(0.5, 0.5, 0.5))
    assert flags == edit.SceneUpdate.MATERIAL
    assert not flags.needs_bvh and flags.needs_light_list

    _, flags = edit.set_ambient(scene, (1, 1, 1))
    assert not flags.needs_bvh and not flags.needs_light_list


def test_editing_light_emission_rebuilds_light_list():
    scene = builders.default_scene(32, 32)
    n_lights = scene.lights.shape[0]
    # kill one light's emission -> light list shrinks after invalidation
    light_mat = int(scene.spheres.material_id[int(scene.lights[0])])
    s2, flags = edit.set_material(scene, light_mat, emission=(0.0, 0.0, 0.0))
    s2 = edit.apply_invalidation(s2, flags)
    assert s2.lights.shape[0] == n_lights - 1


def test_scene_editor_commit_resets_accumulator():
    scene = builders.default_scene(32, 32)
    r = Renderer(scene, POL, 32, 32)
    r.accumulate(5)
    assert int(r.state.accumulations) == 5
    editor = edit.SceneEditor(r)
    editor.edit(edit.set_material, 0, albedo=(0.2, 0.2, 0.2)).commit()
    assert int(r.state.accumulations) == 0
    # edit visible in the next render (same compiled fn, new arrays)
    r.accumulate(5)
    assert int(r.state.accumulations) == 5


def test_material_edit_changes_render_without_recompile():
    scene = builders.white_furnace_scene(16, 16)
    r = Renderer(scene, POL, 16, 16)
    img_white = r.render_spp(5, tonemap=False)
    editor = edit.SceneEditor(r)
    editor.edit(edit.set_material, 0, albedo=(0.3, 0.3, 0.3)).commit()
    img_grey = r.render_spp(5, tonemap=False)
    assert img_white.mean() > img_grey.mean()


# ---------------------------------------------------------------------------
# multi-spp passes (reference declares but never implements spp > 1)
# ---------------------------------------------------------------------------
def test_multi_spp_white_furnace():
    scene = builders.white_furnace_scene(16, 16)
    pol = dataclasses.replace(POL, samples_per_pixel=4)
    img = Renderer(scene, pol, 16, 16).render_spp(5, tonemap=False)
    np.testing.assert_allclose(img, 1.0, atol=1e-5)


def test_multi_spp_matches_single_spp_mean():
    scene = builders.default_scene(16, 16)
    a = Renderer(scene, POL, 16, 16)
    a.accumulate(40)
    pol4 = dataclasses.replace(POL, samples_per_pixel=4)
    b = Renderer(scene, pol4, 16, 16)
    b.accumulate(10)  # 40 samples total
    ma = np.asarray(a.state.buckets).sum(0).mean() / 40
    mb = np.asarray(b.state.buckets).sum(0).mean() / 40
    assert abs(ma - mb) < 0.1 * max(ma, 1e-6)


# ---------------------------------------------------------------------------
# GGX policy renders
# ---------------------------------------------------------------------------
def test_ggx_render_sane():
    scene = builders.brdf_test_scene(48, 48)
    pol = dataclasses.replace(POL, brdf="ggx")
    img = Renderer(scene, pol, 48, 48).render_spp(10, tonemap=False)
    assert np.isfinite(img).all()
    assert (img >= 0).all()
    assert img.max() > 0.05


def test_ggx_mirror_furnace():
    """F0=1, roughness=0 mirror in a white furnace: perfect reflection of a
    uniform sky returns exactly 1 (VNDF estimator = F * G2/G1 = 1)."""
    scene = builders.white_furnace_scene(16, 16)
    import jax.numpy as jnp
    from cpu_raytracing_experiments_tpu.core.vec import Vec3

    mats = scene.materials
    one = jnp.ones_like(mats.f0.x)
    scene = dataclasses.replace(
        scene,
        materials=dataclasses.replace(
            mats, f0=Vec3(one, one, one), roughness=one * 0.0
        ),
    )
    pol = dataclasses.replace(POL, brdf="ggx")
    img = Renderer(scene, pol, 16, 16).render_spp(5, tonemap=False)
    np.testing.assert_allclose(img, 1.0, atol=1e-4)


# ---------------------------------------------------------------------------
# fly-camera motion (View::Rotate/Translate, Camera.hpp:47-59)
# ---------------------------------------------------------------------------
def test_translate_camera_local():
    scene = builders.default_scene(16, 16)
    import numpy as _np

    # forward in camera space is -Z; translating (0,0,-1) moves along view dir
    before = _np.array([float(scene.camera.pos.x), float(scene.camera.pos.y),
                        float(scene.camera.pos.z)])
    s2, flags = edit.translate_camera_local(scene, (0.0, 0.0, -1.0))
    assert flags == edit.SceneUpdate.CAMERA
    after = _np.array([float(s2.camera.pos.x), float(s2.camera.pos.y),
                       float(s2.camera.pos.z)])
    moved = after - before
    # view forward for the default scene is normalize((0.1,-0.4,-1))
    fwd = _np.array([0.1, -0.4, -1.0]); fwd /= _np.linalg.norm(fwd)
    _np.testing.assert_allclose(moved, fwd, atol=1e-5)


def test_rotate_camera_roundtrip():
    scene = builders.default_scene(16, 16)
    import numpy as _np

    q0 = edit._camera_quat(scene)
    s2, _ = edit.rotate_camera_local(scene, (0.1, -0.2, 0.05))
    s3, _ = edit.rotate_camera_local(s2, (-0.0, 0.0, 0.0))
    q2 = edit._camera_quat(s2)
    assert not _np.allclose(q0, q2)
    assert abs(_np.linalg.norm(q2) - 1.0) < 1e-6
    # rotating keeps it a valid view (renders fine)
    r = Renderer(s2, POL, 16, 16)
    r.accumulate(1)


def test_tuned_policy():
    """tuned_policy is currently the defaults: a v5e sweep measured spp=1
    fastest at every frame size (benchmarks/RESULTS.md spp-per-pass table),
    withdrawing the earlier informal spp-boost reading."""
    from cpu_raytracing_experiments_tpu.utils.config import tuned_policy

    assert tuned_policy(256, 256).samples_per_pixel == 1
    assert tuned_policy(1920, 1088).samples_per_pixel == 1
    override = tuned_policy(256, 256, max_bounces=4)
    assert override.max_bounces == 4


def test_radiance_clamp():
    """max_radiance becomes live with clamp_radiance (the reference declares
    the knob and never uses it, Renderer.hpp:25)."""
    from cpu_raytracing_experiments_tpu.render import renderer as prod
    import jax.numpy as jnp

    scene = builders.default_scene(16, 16)
    pol = dataclasses.replace(POL, clamp_radiance=True, max_radiance=0.05)
    rad, _ = prod.render_pass(scene, pol, jnp.uint32(1), 16, 16)
    assert float(np.asarray(rad.x).max()) <= 0.05 + 1e-6
    pol_off = dataclasses.replace(POL)
    rad2, _ = prod.render_pass(scene, pol_off, jnp.uint32(1), 16, 16)
    assert float(np.asarray(rad2.x).max()) > 0.05  # lights exceed the cap


@pytest.mark.slow
def test_stratified_camera_converges_faster():
    """Stratified (van der Corput + CP rotation) camera jitter reduces
    bucket-spread variance vs pure random jitter at equal sample counts
    (the hero scene has jitter-sensitive radiance: curved geometry + NEE).
    Measured ~15% reduction; assert a conservative 5%."""
    scene = builders.default_scene(48, 48)
    pol_r = dataclasses.replace(POL, max_bounces=4)
    pol_s = dataclasses.replace(pol_r, stratify_camera=True)

    def bucket_spread(pol):
        r = Renderer(scene, pol, 48, 48)
        r.accumulate(40)
        return np.asarray(r.state.buckets).std(axis=0).mean()

    spread_random = bucket_spread(pol_r)
    spread_strat = bucket_spread(pol_s)
    assert spread_strat < spread_random * 0.95, (spread_random, spread_strat)


def test_brdf_test_all_properties():
    """All eight Properties sweeps of the reference's BRDF_test enum
    (Application.cpp:148-157 — only Roughness compiles there) render
    finitely with the principled BSDF."""
    pol = dataclasses.replace(POL, brdf="principled", rays_per_chunk=1024, max_bounces=5)
    for prop in builders.BRDF_TEST_PROPERTIES:
        scene = builders.brdf_test_scene(24, 24, prop=prop)
        img = Renderer(scene, pol, 24, 24).render_spp(5, tonemap=False)
        assert np.isfinite(img).all() and (img >= 0).all(), prop


def test_obj_loader(tmp_path):
    """Minimal OBJ loading incl. quad triangulation."""
    from cpu_raytracing_experiments_tpu.scene import meshes

    obj = tmp_path / "t.obj"
    obj.write_text(
        "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n"
        "f 1 2 3\n"          # triangle
        "f 1/1 2/2 3/3 4/4\n"  # quad with uv indices -> two tris
    )
    verts, faces = meshes.load_obj(obj)
    assert verts.shape == (4, 3)
    assert faces.shape == (3, 3)  # 1 + 2 triangles
    np.testing.assert_array_equal(faces[0], [0, 1, 2])
    np.testing.assert_array_equal(faces[1], [0, 1, 2])
    np.testing.assert_array_equal(faces[2], [0, 2, 3])
    # loads into a renderable scene
    tris = meshes.mesh_to_triangles(verts, faces, 0)
    assert tris["v0"].shape == (3, 3)


def test_renderer_resize():
    """Renderer::Resize semantics (Renderer.hpp:53-63): new dims, camera
    projection rescaled, accumulator reset."""
    scene = builders.default_scene(32, 32)
    r = Renderer(scene, POL, 32, 32)
    r.accumulate(5)
    r.resize(48, 24)
    assert int(r.state.accumulations) == 0
    assert r.state.buckets.shape[-1] == 48 * 24
    assert float(r.scene.camera.half_width) == 24.0
    assert float(r.scene.camera.half_height) == 12.0
    r.accumulate(5)
    img = r.render(tonemap=False)
    assert img.shape == (24, 48, 3)
    assert np.isfinite(img).all()


def test_set_camera_fields():
    scene = builders.default_scene(16, 16)
    s2, flags = edit.set_camera(
        scene, pos=(1.0, 2.0, 3.0), exposure=2.0, focus_distance=4.0
    )
    assert flags == edit.SceneUpdate.CAMERA
    assert float(s2.camera.pos.y) == 2.0
    assert float(s2.camera.exposure) == 2.0
    assert float(s2.camera.focus_distance) == 4.0


def test_set_camera_lens():
    """UpdateLens semantics: focal length rescales projection z; f-number
    sets the aperture radius from the (new) focal length."""
    scene = builders.default_scene(32, 32)  # focal 40mm
    z0 = float(scene.camera.z)
    s2, flags = edit.set_camera_lens(scene, 32, 32, focal_length=80.0)
    assert flags == edit.SceneUpdate.CAMERA
    assert abs(float(s2.camera.z) / z0 - 2.0) < 1e-5  # doubled focal -> 2x z
    s3, _ = edit.set_camera_lens(scene, 32, 32, focal_length=50.0, f_number=2.0)
    assert abs(float(s3.camera.aperture_radius) - 50.0 / 4.0 * 1e-3) < 1e-8
    s4, _ = edit.set_camera_lens(scene, 32, 32, exposure=3.0, focus_distance=2.5)
    assert float(s4.camera.exposure) == 3.0
    assert float(s4.camera.focus_distance) == 2.5
