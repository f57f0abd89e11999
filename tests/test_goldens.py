"""Golden-image regression tests.

Fixed-seed CPU renders compared against checked-in references: any change
to the integrator, RNG schedule, estimator, or sampling math that alters
radiance shows up here immediately. Tolerance is loose enough for
XLA-version fusion/rounding drift but catches real regressions (which move
many pixels by large margins).

Regenerate intentionally with tests/goldens/regen.py (see goldens/README.md).
"""
import dataclasses
from pathlib import Path

import numpy as np
import pytest

from cpu_raytracing_experiments_tpu.render.api import Renderer
from cpu_raytracing_experiments_tpu.scene import builders
from cpu_raytracing_experiments_tpu.utils.config import RendererPolicy

GOLDEN_DIR = Path(__file__).parent / "goldens"
POL = RendererPolicy(max_bounces=6, rays_per_chunk=4096)
SIZE, SPP = 64, 10


def _render(scene, policy=POL):
    r = Renderer(scene, policy, SIZE, SIZE)
    r.accumulate(SPP)
    return r.render(tonemap=False)


def _check(name, img):
    want = np.load(GOLDEN_DIR / f"{name}_{SIZE}x{SIZE}_{SPP}spp.npy")
    close = np.isclose(img, want, rtol=1e-3, atol=1e-4)
    assert close.mean() > 0.995, (
        f"{name}: {100 * (1 - close.mean()):.2f}% of pixels deviate from golden"
    )
    np.testing.assert_allclose(img.mean(), want.mean(), rtol=1e-3)


def test_golden_hero():
    _check("hero", _render(builders.default_scene(SIZE, SIZE)))


def test_golden_cornell():
    _check("cornell", _render(builders.cornell_box_scene(SIZE, SIZE)))


def test_golden_white_furnace():
    """Energy conservation at image level: unit-albedo sphere in a unit sky
    resolves to exactly 1.0 everywhere (Application.cpp:218-223)."""
    img = _render(builders.white_furnace_scene(SIZE, SIZE))
    _check("white_furnace", img)
    np.testing.assert_allclose(img, 1.0, rtol=2e-3)


def test_golden_bvh_test():
    _check("bvh_test", _render(builders.bvh_test_scene(SIZE, SIZE)))


def test_golden_brdf_ggx():
    """GGX closure over the BRDF_test roughness lineup — covers the VNDF
    sampling + the pdf the reference left as a TODO (DataStreams.hpp:196)."""
    pol = dataclasses.replace(POL, brdf="ggx")
    _check("brdf_ggx", _render(builders.brdf_test_scene(SIZE, SIZE), pol))


def test_golden_dof():
    """Real thin-lens depth of field (reference declares aperture/focus but
    never uses them in generate_ray, Camera.hpp:80-88)."""
    import jax.numpy as jnp

    scene = builders.default_scene(SIZE, SIZE)
    scene = dataclasses.replace(
        scene,
        camera=dataclasses.replace(
            scene.camera,
            focus_distance=jnp.float32(1.3),
            aperture_radius=jnp.float32(0.05),
        ),
    )
    pol = dataclasses.replace(POL, enable_dof=True)
    _check("dof", _render(scene, pol))


@pytest.mark.parametrize(
    "accel",
    [
        # one representative backend (clustered) stays in the default gate;
        # bvh/grid/pallas cross-checks run in ci.sh (each backend also has
        # its own default-gate parity tests in its module)
        pytest.param("bvh", marks=pytest.mark.slow),
        pytest.param("grid", marks=pytest.mark.slow),
        "clustered",
        pytest.param("pallas", marks=pytest.mark.slow),
    ],
)
def test_golden_accel_cross_check(accel):
    """Every acceleration backend must reproduce the SAME image as the brute
    battery on the 255-sphere BVH_test scene — the backends differ only in
    traversal order, so the golden holds near-bitwise for all of them."""
    from cpu_raytracing_experiments_tpu.scene import accel as accel_mod

    scene = builders.bvh_test_scene(SIZE, SIZE)
    if accel == "bvh":
        scene = accel_mod.with_bvh(scene)
        pol = dataclasses.replace(POL, accel="bvh")
    elif accel == "grid":
        scene = accel_mod.with_grid(scene)
        pol = dataclasses.replace(POL, accel="grid")
    elif accel == "clustered":
        scene = accel_mod.with_clusters(scene, num_clusters=16)
        pol = dataclasses.replace(POL, accel="clustered")
    else:
        scene = accel_mod.with_pallas_clusters(scene, cluster_size=64)
        pol = dataclasses.replace(
            POL, accel="pallas", pallas_tile_rays=64, pallas_interpret=True
        )
    _check("bvh_test", _render(scene, pol))


@pytest.mark.slow
def test_golden_mesh():
    """Triangle-mesh geometry (the pallas traversal's main workload) at
    96x96 (the displaced mesh renders black at the 64x64 framing) —
    brute battery against the golden, plus the pallas traversal
    (interpret) must match the same golden."""
    scene = builders.mesh_scene(96, 96, subdivisions=3)
    r = Renderer(scene, POL, 96, 96)
    r.accumulate(SPP)
    img = r.render(tonemap=False)
    want = np.load(GOLDEN_DIR / "mesh_96x96_10spp.npy")
    close = np.isclose(img, want, rtol=1e-3, atol=1e-4)
    assert close.mean() > 0.995, f"{100 * (1 - close.mean()):.2f}% deviate"

    from cpu_raytracing_experiments_tpu.scene import accel as accel_mod

    sc = accel_mod.with_pallas_clusters(scene, cluster_size=64)
    pol = dataclasses.replace(
        POL, accel="pallas", pallas_tile_rays=64, pallas_interpret=True,
        rays_per_chunk=9216,
    )
    rp = Renderer(sc, pol, 96, 96)
    rp.accumulate(SPP)
    imgp = rp.render(tonemap=False)
    close = np.isclose(imgp, want, rtol=1e-3, atol=1e-4)
    assert close.mean() > 0.995, f"{100 * (1 - close.mean()):.2f}% deviate"
