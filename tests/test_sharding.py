"""Multi-device sharding tests on the 8-virtual-CPU-device mesh.

The load-bearing property: sharded renders are BIT-IDENTICAL to
single-device renders (counter-based RNG + disjoint pixel/sample ownership),
for every (dp, sp) factorization.
"""
import jax
import numpy as np
import pytest

from cpu_raytracing_experiments_tpu.parallel import sharded
from cpu_raytracing_experiments_tpu.render.api import Renderer
from cpu_raytracing_experiments_tpu.scene import builders
from cpu_raytracing_experiments_tpu.utils.config import RendererPolicy

POL = RendererPolicy(max_bounces=6, rays_per_chunk=2048)
W = H = 32


def _single_device_buckets(scene, n):
    r = Renderer(scene, POL, W, H)
    r.accumulate(n)
    return np.asarray(r.state.buckets)


@pytest.fixture(scope="module")
def scene():
    return builders.default_scene(W, H)


@pytest.fixture(scope="module")
def reference_buckets(scene):
    return _single_device_buckets(scene, 40)


@pytest.mark.parametrize(
    "dp,sp",
    [
        pytest.param(8, 1, marks=pytest.mark.slow),
        (4, 2),
        pytest.param(2, 4, marks=pytest.mark.slow),
        pytest.param(1, 8, marks=pytest.mark.slow),
        (1, 1),
    ],
)
def test_sharded_matches_single_device(scene, reference_buckets, dp, sp):
    """dp-only sharding is BIT-identical to single device (disjoint pixel
    ownership, same counters). sp sharding reorders the per-bucket float
    summation (rank partials summed at the end), so it matches to float32
    reassociation tolerance."""
    if dp * sp > len(jax.devices()):
        pytest.skip("not enough devices")
    mesh = sharded.make_mesh(dp=dp, sp=sp, devices=jax.devices()[: dp * sp])
    r = sharded.ShardedRenderer(scene, POL, W, H, mesh)
    r.accumulate(40)
    merged = np.asarray(r.state.buckets).sum(axis=0)
    if sp == 1:
        np.testing.assert_array_equal(merged, reference_buckets)
    else:
        np.testing.assert_allclose(
            merged, reference_buckets, rtol=2e-5, atol=1e-5
        )


def test_sharded_resolve_matches_single(scene, reference_buckets):
    mesh = sharded.make_mesh(dp=4, sp=2, devices=jax.devices())
    r = sharded.ShardedRenderer(scene, POL, W, H, mesh)
    r.accumulate(40)
    img_sharded = r.render(tonemap=True)

    single = Renderer(scene, POL, W, H)
    single.accumulate(40)
    img_single = single.render(tonemap=True)
    np.testing.assert_allclose(img_sharded, img_single, rtol=2e-5, atol=1e-5)


def test_mesh_shapes():
    mesh = sharded.make_mesh()
    assert mesh.shape["dp"] == len(jax.devices())
    mesh2 = sharded.make_mesh(dp=2, sp=4)
    assert mesh2.shape == {"dp": 2, "sp": 4}


def test_pod_mesh_helpers():
    """parallel.distributed mesh builders on the virtual 8-device pool."""
    from cpu_raytracing_experiments_tpu.parallel import distributed

    mesh = distributed.pod_mesh(sp=2)
    assert mesh.shape == {"dp": 4, "sp": 2}
    mesh2 = distributed.multi_slice_mesh(num_slices=4)
    assert mesh2.shape == {"dp": 2, "sp": 4}
    # a sharded render runs on the pod mesh
    from cpu_raytracing_experiments_tpu.parallel import sharded as sh

    r = sh.ShardedRenderer(builders.default_scene(16, 16), POL, 16, 16, mesh)
    r.accumulate(2)
    assert int(r.state.accumulations) == 2


@pytest.mark.slow
def test_sharded_multi_spp_matches_single():
    """Composition: sp/dp sharding x samples_per_pixel>1."""
    import dataclasses

    pol = dataclasses.replace(POL, samples_per_pixel=2)
    sc = builders.default_scene(W, H)
    mesh = sharded.make_mesh(dp=4, sp=2)
    r = sharded.ShardedRenderer(sc, pol, W, H, mesh)
    r.accumulate(10)
    single = Renderer(sc, pol, W, H)
    single.accumulate(10)
    np.testing.assert_allclose(
        np.asarray(r.state.buckets).sum(0),
        np.asarray(single.state.buckets),
        rtol=2e-5, atol=1e-5,
    )
    # resolved images must match too — this is where the spp division lives
    # (a resolve that forgets samples_per_pixel is spp x too bright)
    np.testing.assert_allclose(
        r.render(tonemap=True), single.render(tonemap=True), rtol=2e-5, atol=1e-5
    )


def test_sharded_render_spp_sample_accounting():
    """render_spp(spp) counts SAMPLES, not passes: with samples_per_pixel=2,
    render_spp(10) must trace >= 10 samples in <= 10 passes on both paths,
    and the two must agree."""
    import dataclasses

    pol = dataclasses.replace(POL, samples_per_pixel=2)
    sc = builders.default_scene(W, H)
    mesh = sharded.make_mesh(dp=4, sp=2)
    r = sharded.ShardedRenderer(sc, pol, W, H, mesh)
    img_sh = r.render_spp(10)
    single = Renderer(sc, pol, W, H)
    img_single = single.render_spp(10)
    assert int(single.state.accumulations) == 5  # ceil(10/2) passes
    assert int(r.state.accumulations) == 10  # rounded up to lcm(5, sp=2)
    # (single-device render_spp determinism is covered by the resume-
    # equivalence tests in test_renderer.py — no third render here)
    # same estimator semantics: both resolve to comparable brightness
    assert abs(float(img_sh.mean()) - float(img_single.mean())) < 0.02


@pytest.mark.slow
def test_sharded_pallas_accel_matches_single():
    """Multi-chip + accel='pallas' (the large-scene production combination):
    8-device dp mesh must match single-device bit-exactly. check_vma=False
    works around a jax interpret-mode limitation (pallas_call's internal
    grid scan drops the varying-axes annotation); the COMPILED path
    type-checks with check_vma=True and was verified bit-exact on real TPU
    hardware (kernel out_shapes carry the rays' vma via _out_struct, and
    replicated cluster tables are pcast to varying via _match_vma)."""
    import numpy as np

    from cpu_raytracing_experiments_tpu.parallel import sharded
    from cpu_raytracing_experiments_tpu.render.api import Renderer
    from cpu_raytracing_experiments_tpu.scene import accel as accel_mod
    from cpu_raytracing_experiments_tpu.scene import builders
    from cpu_raytracing_experiments_tpu.utils.config import RendererPolicy

    w = h = 32
    scene = accel_mod.with_pallas_clusters(
        builders.cornell_box_scene(w, h), cluster_size=32
    )
    pol = RendererPolicy(max_bounces=3, accel="pallas", pallas_interpret=True,
                         pallas_tile_rays=64, rays_per_chunk=1024)
    single = Renderer(scene, pol, w, h)
    single.accumulate(5)
    mesh = sharded.make_mesh(dp=8, sp=1)
    sr = sharded.ShardedRenderer(scene, pol, w, h, mesh, check_vma=False)
    sr.accumulate(5)
    a = np.asarray(single.render(tonemap=False))
    b = np.asarray(sr.render(tonemap=False))
    np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_sharded_restir_temporal_matches_single():
    """dp-sharded ReSTIR: reservoirs shard with their pixels. Temporal-only
    reuse (restir_spatial=0) has no neighbor lookups, so an 8-device render
    is bit-identical to single-device; with 2-D spatial reuse only pixels
    whose (dx, dy) neighborhood crosses a shard's scanline band may differ
    (the shard's coord-verified candidates reject out-of-band rows where
    the single-chip path reuses them — equal in distribution). The spatial
    leg uses dp=2 so each band is 16 rows tall and most neighborhoods stay
    in-band; at dp=8 a 32-pixel-tall frame gives 4-row bands, thinner than
    the radius, and EVERY pixel becomes a boundary pixel."""
    import dataclasses

    import numpy as np

    from cpu_raytracing_experiments_tpu.parallel import sharded
    from cpu_raytracing_experiments_tpu.render.api import Renderer
    from cpu_raytracing_experiments_tpu.scene import builders
    from cpu_raytracing_experiments_tpu.utils.config import RendererPolicy

    w = h = 32
    scene = builders.cornell_box_scene(w, h)
    pol = RendererPolicy(max_bounces=3, light_sampling="restir",
                         restir_spatial=0, rays_per_chunk=1024)
    single = Renderer(scene, pol, w, h)
    single.accumulate(6)
    mesh = sharded.make_mesh(dp=8, sp=1)
    sr = sharded.ShardedRenderer(scene, pol, w, h, mesh)
    sr.accumulate(6)
    np.testing.assert_array_equal(
        np.asarray(single.render(tonemap=False)),
        np.asarray(sr.render(tonemap=False)),
    )

    # spatial reuse: runs sharded, interior pixels identical
    pol2 = dataclasses.replace(pol, restir_spatial=2, restir_radius=4)
    s2 = Renderer(scene, pol2, w, h)
    s2.accumulate(6)
    import jax

    mesh2 = sharded.make_mesh(dp=2, sp=1, devices=jax.devices()[:2])
    sr2 = sharded.ShardedRenderer(scene, pol2, w, h, mesh2)
    sr2.accumulate(6)
    a = np.asarray(s2.render(tonemap=False))
    b = np.asarray(sr2.render(tonemap=False))
    assert (a == b).mean() > 0.7, (a == b).mean()
    assert float(((a - b) ** 2).mean()) < 1e-4


@pytest.mark.slow
def test_sharded_adaptive_tol0_matches_uniform():
    """Multi-chip adaptive allocation: tol=0 keeps every pixel active, so
    the sharded adaptive render must be bit-identical to the plain sharded
    uniform render at the same spp; a real tolerance must save samples."""
    import numpy as np

    from cpu_raytracing_experiments_tpu.parallel import sharded
    from cpu_raytracing_experiments_tpu.scene import builders
    from cpu_raytracing_experiments_tpu.utils.config import RendererPolicy

    w = h = 32
    scene = builders.default_scene(w, h)
    pol = RendererPolicy(max_bounces=3, rays_per_chunk=1024)
    mesh = sharded.make_mesh(dp=8, sp=1)

    sa = sharded.ShardedRenderer(scene, pol, w, h, mesh)
    img0, st0 = sa.render_adaptive(tol=0.0, max_spp=20)
    su = sharded.ShardedRenderer(scene, pol, w, h, mesh)
    su.accumulate(20)
    np.testing.assert_array_equal(np.asarray(img0), np.asarray(su.render()))
    assert st0["saved_fraction"] == 0.0

    sb = sharded.ShardedRenderer(scene, pol, w, h, mesh)
    img, stats = sb.render_adaptive(tol=0.05, max_spp=40)
    assert np.isfinite(np.asarray(img)).all()
    assert stats["saved_fraction"] > 0.05


@pytest.mark.slow
def test_cross_topology_checkpoint_resume():
    """Checkpoint on one topology, resume on another, bit-exact either way:
    single-device 4 passes -> sharded 4 more == 8 straight single-device,
    and sharded 4 -> single 4 likewise (counter-based RNG + merged-bucket
    checkpoint layout make the accumulator topology-independent)."""
    import numpy as np

    from cpu_raytracing_experiments_tpu.parallel import sharded
    from cpu_raytracing_experiments_tpu.render import checkpoint
    from cpu_raytracing_experiments_tpu.render.api import Renderer
    from cpu_raytracing_experiments_tpu.scene import builders
    from cpu_raytracing_experiments_tpu.utils.config import RendererPolicy

    w = h = 32
    scene = builders.default_scene(w, h)
    pol = RendererPolicy(max_bounces=3, rays_per_chunk=1024)
    mesh = sharded.make_mesh(dp=8, sp=1)
    ref = Renderer(scene, pol, w, h)
    ref.accumulate(8)
    want = np.asarray(ref.render(tonemap=False))

    def ckpt(tmp, state):
        checkpoint.save(tmp, state, pol, w, h)

    import tempfile
    with tempfile.TemporaryDirectory() as d:
        path = d + "/ck.npz"
        single = Renderer(scene, pol, w, h)
        single.accumulate(4)
        ckpt(path, single.state)
        sr = sharded.ShardedRenderer(scene, pol, w, h, mesh)
        sr.load_checkpoint(path)
        sr.accumulate(4)
        np.testing.assert_array_equal(np.asarray(sr.render(tonemap=False)), want)

        sr2 = sharded.ShardedRenderer(scene, pol, w, h, mesh)
        sr2.accumulate(4)
        sr2.save_checkpoint(path)
        s2 = Renderer(scene, pol, w, h)
        s2.state = checkpoint.load(path, pol, w, h)
        s2.accumulate(4)
        np.testing.assert_array_equal(np.asarray(s2.render(tonemap=False)), want)


@pytest.mark.slow
def test_sharded_variance_map_and_denoise():
    """ShardedRenderer.variance_map matches single-device bit-exactly
    (merged buckets, same statistic), and the AOV denoiser accepts a
    ShardedRenderer directly."""
    import numpy as np

    from cpu_raytracing_experiments_tpu.parallel import sharded
    from cpu_raytracing_experiments_tpu.render import denoise
    from cpu_raytracing_experiments_tpu.render.api import Renderer
    from cpu_raytracing_experiments_tpu.scene import builders
    from cpu_raytracing_experiments_tpu.utils.config import RendererPolicy

    w = h = 32
    scene = builders.default_scene(w, h)
    pol = RendererPolicy(max_bounces=3, rays_per_chunk=1024)
    mesh = sharded.make_mesh(dp=8, sp=1)
    sr = sharded.ShardedRenderer(scene, pol, w, h, mesh)
    sr.accumulate(6)
    single = Renderer(scene, pol, w, h)
    single.accumulate(6)
    np.testing.assert_array_equal(sr.variance_map(), single.variance_map())
    img = denoise.denoise_render(sr, variance_guided=True, sigma_l=25.0)
    assert img.shape == (h, w, 3) and np.isfinite(img).all()


@pytest.mark.slow
def test_sharded_pallas_stream_matches_single():
    """Multi-chip + accel='pallas' + pallas_stream=True: the HBM-streaming
    kernel's packed table operand (memory_space=ANY) must ride shard_map
    like the resident tables do (_match_vma pcast to varying); 8-device dp
    mesh matches single-device bit-exactly. check_vma=False for the same
    interpret-mode limitation as test_sharded_pallas_accel_matches_single."""
    import numpy as np

    from cpu_raytracing_experiments_tpu.parallel import sharded
    from cpu_raytracing_experiments_tpu.render.api import Renderer
    from cpu_raytracing_experiments_tpu.scene import accel as accel_mod
    from cpu_raytracing_experiments_tpu.scene import builders
    from cpu_raytracing_experiments_tpu.utils.config import RendererPolicy

    w = h = 32
    scene = accel_mod.with_pallas_clusters(
        builders.cornell_box_scene(w, h), cluster_size=32
    )
    pol = RendererPolicy(max_bounces=3, accel="pallas", pallas_interpret=True,
                         pallas_tile_rays=64, rays_per_chunk=1024,
                         pallas_stream=True)
    single = Renderer(scene, pol, w, h)
    single.accumulate(3)
    mesh = sharded.make_mesh(dp=8, sp=1)
    sr = sharded.ShardedRenderer(scene, pol, w, h, mesh, check_vma=False)
    sr.accumulate(3)
    a = np.asarray(single.render(tonemap=False))
    b = np.asarray(sr.render(tonemap=False))
    np.testing.assert_array_equal(a, b)


def test_sharded_narrowing_engages_and_matches_single():
    """The wavefront-narrowing cascade is shard-local (VERDICT r2 item 3):
    with narrow_wavefront forced ON, each dp shard compacts its own lanes
    and the sharded render stays BIT-identical to the single-device render
    with the same policy. bvh_test (255 prims) keeps enough lanes alive
    across bounces that every cascade stage actually executes."""
    import dataclasses

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    sc = builders.bvh_test_scene(W, H)
    pol = dataclasses.replace(
        POL, narrow_wavefront=True, narrow_factors=(2, 8), rays_per_chunk=1024
    )
    r1 = Renderer(sc, pol, W, H)
    r1.accumulate(10)
    want = np.asarray(r1.state.buckets)
    mesh = sharded.make_mesh(dp=4, sp=1, devices=jax.devices()[:4])
    r2 = sharded.ShardedRenderer(sc, pol, W, H, mesh)
    r2.accumulate(10)
    got = np.asarray(r2.state.buckets).sum(axis=0)
    np.testing.assert_array_equal(got, want)
