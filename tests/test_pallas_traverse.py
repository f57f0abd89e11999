"""Pallas clustered-traversal kernel (ops/pallas/traverse_kernel.py) vs the
brute battery oracle — interpret mode on CPU. The same kernel compiles via
Mosaic on TPU (validated on hardware; benchmarks/RESULTS.md)."""
import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from cpu_raytracing_experiments_tpu.core.vec import Vec3
from cpu_raytracing_experiments_tpu.ops import clustered, intersect
from cpu_raytracing_experiments_tpu.ops.pallas import traverse_kernel as tk

RNG = np.random.default_rng(42)


def _sphere_setup(P=200, K=64):
    centers = RNG.uniform(-5, 5, (P, 3)).astype(np.float32)
    radii = RNG.uniform(0.1, 0.6, P).astype(np.float32)
    rows = np.concatenate([centers, (radii ** 2)[:, None]], axis=1)
    cp = clustered.build_clusters(
        centers - radii[:, None], centers + radii[:, None], rows,
        num_clusters=-(-P // K), kind="sphere",
    )
    geom = (
        Vec3(*[jnp.asarray(centers[:, i]) for i in range(3)]),
        jnp.asarray(radii ** 2),
    )
    return cp, geom


def _rays(R=500):
    p = RNG.uniform(-8, 8, (R, 3)).astype(np.float32)
    d = RNG.normal(size=(R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return (
        Vec3(*[jnp.asarray(p[:, i]) for i in range(3)]),
        Vec3(*[jnp.asarray(d[:, i].astype(np.float32)) for i in range(3)]),
    )


@pytest.mark.parametrize("tile_r,sort", [(128, True), (64, False)])
def test_closest_matches_brute(tile_r, sort):
    cp, geom = _sphere_setup()
    p, d = _rays()
    t_ref, id_ref = intersect.intersect_spheres(p, d, *geom)
    t_pk, id_pk = tk.intersect_clustered_pallas(
        cp, p, d, tile_r=tile_r, sort=sort, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(id_pk), np.asarray(id_ref))
    hit = np.asarray(id_ref) >= 0
    np.testing.assert_allclose(
        np.asarray(t_pk)[hit], np.asarray(t_ref)[hit], rtol=1e-5, atol=1e-5
    )


def test_closest_tfar_seed():
    """tfar0 seeding: only strictly closer hits replace the seed."""
    cp, geom = _sphere_setup()
    p, d = _rays(300)
    t_ref, id_ref = intersect.intersect_spheres(p, d, *geom)
    seed = jnp.where(jnp.asarray(id_ref) >= 0, t_ref * 0.5, 3.4e38)
    t_pk, id_pk = tk.intersect_clustered_pallas(
        cp, p, d, tfar0=seed, tile_r=128, interpret=True
    )
    # every hit in the seeded run must beat the seed
    hit = np.asarray(id_pk) >= 0
    assert (np.asarray(t_pk)[hit] < np.asarray(seed)[hit]).all()
    # rays whose seed cut off all prims return miss with tfar == seed
    np.testing.assert_allclose(
        np.asarray(t_pk)[~hit], np.asarray(seed)[~hit], rtol=1e-6
    )


def test_shadow_matches_brute():
    cp, geom = _sphere_setup()
    p, d = _rays(400)
    tfar = jnp.asarray(
        np.where(RNG.uniform(size=400) < 0.25, 0.0,
                 RNG.uniform(0.5, 20.0, 400)).astype(np.float32)
    )
    occ_ref = np.asarray(intersect.occluded_spheres(p, d, tfar, *geom))
    occ_ref = occ_ref & (np.asarray(tfar) > 0)  # tfar=0 masks the lane
    occ_pk = np.asarray(
        tk.occluded_clustered_pallas(cp, p, d, tfar, tile_r=128, interpret=True)
    )
    np.testing.assert_array_equal(occ_pk, occ_ref)


def test_alive_mask_and_compaction():
    cp, geom = _sphere_setup()
    p, d = _rays(500)
    alive = jnp.asarray(RNG.uniform(size=500) < 0.5)
    t_ref, id_ref = intersect.intersect_spheres(p, d, *geom)
    # masked (uncompacted): dead lanes return miss
    t_m, id_m = tk.intersect_clustered_pallas(
        cp, p, d, alive=alive, tile_r=128, interpret=True
    )
    a = np.asarray(alive)
    np.testing.assert_array_equal(np.asarray(id_m)[a], np.asarray(id_ref)[a])
    assert (np.asarray(id_m)[~a] == -1).all()
    # compacted wrapper: same contract
    t_c, id_c = tk.intersect_clustered_pallas_compact(
        cp, p, d, alive, tile_r=128, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(id_c)[a], np.asarray(id_ref)[a])
    assert (np.asarray(id_c)[~a] == -1).all()


def test_compact_order_roundtrip():
    alive = jnp.asarray(RNG.uniform(size=333) < 0.3)
    order, inv = tk.compact_order(alive)
    order, inv = np.asarray(order), np.asarray(inv)
    a = np.asarray(alive)
    n = int(a.sum())
    assert a[order[:n]].all() and not a[order[n:]].any()
    # stable within each class
    assert (np.diff(order[:n]) > 0).all() and (np.diff(order[n:]) > 0).all()
    x = np.arange(333)
    np.testing.assert_array_equal(x[order][inv], x)


@pytest.mark.slow
def test_triangle_traversal_matches_brute():
    T = 150
    v0 = RNG.uniform(-4, 4, (T, 3)).astype(np.float32)
    e1 = RNG.normal(0, 0.8, (T, 3)).astype(np.float32)
    e2 = RNG.normal(0, 0.8, (T, 3)).astype(np.float32)
    rows = np.concatenate([v0, e1, e2], axis=1)
    pts = np.stack([v0, v0 + e1, v0 + e2], axis=0)
    cp = clustered.build_clusters(
        pts.min(axis=0), pts.max(axis=0), rows, num_clusters=-(-T // 32),
        kind="triangle",
    )
    geom = tuple(
        Vec3(*[jnp.asarray(a[:, i]) for i in range(3)]) for a in (v0, e1, e2)
    )
    p, d = _rays(400)
    t_ref, id_ref = intersect.intersect_triangles(p, d, *geom)
    t_pk, id_pk = tk.intersect_clustered_pallas(cp, p, d, tile_r=128, interpret=True)
    np.testing.assert_array_equal(np.asarray(id_pk), np.asarray(id_ref))
    tfar = jnp.asarray(RNG.uniform(0.5, 15.0, 400).astype(np.float32))
    occ_ref = np.asarray(intersect.occluded_triangles(p, d, tfar, *geom))
    occ_pk = np.asarray(
        tk.occluded_clustered_pallas(cp, p, d, tfar, tile_r=128, interpret=True)
    )
    np.testing.assert_array_equal(occ_pk, occ_ref)


def test_renderer_accel_pallas_matches_brute():
    """Full renderer with accel='pallas' (interpret) is bit-identical to
    brute on a mixed sphere+triangle scene."""
    from cpu_raytracing_experiments_tpu.render.api import Renderer
    from cpu_raytracing_experiments_tpu.scene import accel as accel_mod
    from cpu_raytracing_experiments_tpu.scene import builders
    from cpu_raytracing_experiments_tpu.utils.config import RendererPolicy

    w = h = 24
    scene = builders.cornell_box_scene(w, h)  # spheres + triangles
    base = RendererPolicy(max_bounces=4, rays_per_chunk=w * h)
    rb = Renderer(scene, base, w, h)
    rb.accumulate(3)
    sc = accel_mod.with_pallas_clusters(scene, cluster_size=32)
    pol = dataclasses.replace(
        base, accel="pallas", pallas_tile_rays=64, pallas_interpret=True
    )
    rp = Renderer(sc, pol, w, h)
    rp.accumulate(3)
    np.testing.assert_array_equal(
        np.asarray(rp.state.buckets), np.asarray(rb.state.buckets)
    )


def test_coherence_order_roundtrip_and_grouping():
    """Segmented (dead, octant) radix: permutation property, dead-last and
    octant-grouped within each segment, inverse scatters back."""
    import numpy as np

    rng = np.random.default_rng(3)
    r = 5000  # not a multiple of seg_len -> exercises padding
    seg = 2048
    alive = jnp.asarray(rng.random(r) < 0.7)
    d = Vec3(*[jnp.asarray(rng.normal(size=r).astype(np.float32)) for _ in range(3)])
    order, inv, rp = tk.coherence_order(alive, d, seg_len=seg)
    assert rp == 3 * seg
    o = np.asarray(order)
    assert sorted(o.tolist()) == list(range(rp))  # permutation over padded ids
    # inverse property: order[inv[i]] == i
    assert np.array_equal(o[np.asarray(inv)], np.arange(rp))
    # per segment: alive block first, then dead, then padding ids (>= r)
    al = np.zeros(rp, bool)
    al[:r] = np.asarray(alive)
    oct_ = (
        (np.asarray(d.x) < 0).astype(int)
        | ((np.asarray(d.y) < 0).astype(int) << 1)
        | ((np.asarray(d.z) < 0).astype(int) << 2)
    )
    key = np.full(rp, 15)
    key[:r] = np.where(np.asarray(alive), oct_, 8)
    for s in range(3):
        seg_ids = o[s * seg : (s + 1) * seg]
        in_seg = (seg_ids >= s * seg) & (seg_ids < (s + 1) * seg)
        assert in_seg.all()  # segment-local permutation
        k = key[seg_ids]
        assert (np.diff(k) >= 0).all()  # sorted by (dead, octant) key
        # stability: equal keys keep original relative order
        for kv in np.unique(k):
            grp = seg_ids[k == kv]
            assert (np.diff(grp) > 0).all()


@pytest.mark.parametrize(
    "fill_window",
    # fill_window=1 is the production default; the windowed-packing variant
    # (measured-negative knob, RESULTS.md) keeps ci.sh coverage only
    [1, pytest.param(8, marks=pytest.mark.slow)],
)
def test_sah_clusters_invariants_and_parity(fill_window):
    """build_clusters_sah: every prim appears exactly once, cluster AABBs
    contain their prims, and the traversal kernel over SAH clusters matches
    the brute battery exactly (closest + shadow). fill_window=8 exercises
    the windowed first-fit packing (a measured-negative experiment —
    benchmarks/sim_fill_pack.py — kept correct behind its knob)."""
    P = 300
    centers = RNG.uniform(-6, 6, (P, 3)).astype(np.float32)
    radii = RNG.uniform(0.1, 0.5, P).astype(np.float32)
    rows = np.concatenate([centers, (radii ** 2)[:, None]], axis=1)
    mins, maxs = centers - radii[:, None], centers + radii[:, None]
    cp = clustered.build_clusters_sah(mins, maxs, rows, cluster_size=64,
                                      kind="sphere",
                                      fill_window=fill_window)
    order = np.asarray(cp.order)
    ids = order[order >= 0]
    assert sorted(ids.tolist()) == list(range(P))  # exact partition
    lo = np.stack([np.asarray(cp.lo.x), np.asarray(cp.lo.y),
                   np.asarray(cp.lo.z)], 1)
    hi = np.stack([np.asarray(cp.hi.x), np.asarray(cp.hi.y),
                   np.asarray(cp.hi.z)], 1)
    k = cp.cluster_size
    for c in range(cp.num_clusters):
        cid = order[c * k:(c + 1) * k]
        cid = cid[cid >= 0]
        assert (mins[cid] >= lo[c] - 1e-4).all()
        assert (maxs[cid] <= hi[c] + 1e-4).all()
    geom = (
        Vec3(*[jnp.asarray(centers[:, i]) for i in range(3)]),
        jnp.asarray(radii ** 2),
    )
    p, d = _rays(500)
    t_ref, id_ref = intersect.intersect_spheres(p, d, *geom)
    t_pk, id_pk = tk.intersect_clustered_pallas(cp, p, d, tile_r=128,
                                                interpret=True)
    np.testing.assert_array_equal(np.asarray(id_pk), np.asarray(id_ref))
    # t agrees to f32 rounding (the kernel and the brute battery fuse the
    # same formula differently; ids are the exact contract). rtol 2e-4:
    # grazing hits legitimately land ~1e-4 apart between fusions — 5e-5
    # flaked at 1/500 rays on some module-RNG draw orders (full-suite vs
    # default-gate order changes which scene this test gets)
    np.testing.assert_allclose(np.asarray(t_pk), np.asarray(t_ref), rtol=2e-4)
    tfar = jnp.asarray(RNG.uniform(0.5, 20.0, 500).astype(np.float32))
    occ_ref = np.asarray(intersect.occluded_spheres(p, d, tfar, *geom))
    occ_pk = np.asarray(
        tk.occluded_clustered_pallas(cp, p, d, tfar, tile_r=128,
                                     interpret=True)
    )
    np.testing.assert_array_equal(occ_pk, occ_ref)


@pytest.mark.slow  # plan='group' is a non-default knob (hardware A/B in
# RESULTS.md); 30 s of build+interpret parity stays in the ci.sh full suite
def test_group_boxes_build_and_plan_parity():
    """group_boxes clustering: rows hold <= 2 SAH leaves, each leaf box
    bounds its lanes' prims, the pair union equals the row box, and the
    dual-slab plan='group' traversal (per-leaf culling of fill-packed
    rows) matches the brute battery exactly — closest ids AND shadow —
    while planning no MORE visits than it would see rows."""
    P = 300
    centers = RNG.uniform(-6, 6, (P, 3)).astype(np.float32)
    radii = RNG.uniform(0.1, 0.5, P).astype(np.float32)
    rows = np.concatenate([centers, (radii ** 2)[:, None]], axis=1)
    mins, maxs = centers - radii[:, None], centers + radii[:, None]
    cp = clustered.build_clusters_sah(mins, maxs, rows, cluster_size=64,
                                      kind="sphere", fill_window=8,
                                      group_boxes=True)
    order = np.asarray(cp.order)
    ids = order[order >= 0]
    assert sorted(ids.tolist()) == list(range(P))  # exact partition
    assert cp.glo is not None and cp.ghi is not None
    k = cp.cluster_size
    glo = np.stack([np.asarray(cp.glo.x), np.asarray(cp.glo.y),
                    np.asarray(cp.glo.z)], -1)  # [2, C, 3]
    ghi = np.stack([np.asarray(cp.ghi.x), np.asarray(cp.ghi.y),
                    np.asarray(cp.ghi.z)], -1)
    lo = np.stack([np.asarray(cp.lo.x), np.asarray(cp.lo.y),
                   np.asarray(cp.lo.z)], 1)
    hi = np.stack([np.asarray(cp.hi.x), np.asarray(cp.hi.y),
                   np.asarray(cp.hi.z)], 1)
    for c in range(cp.num_clusters):
        cid = order[c * k:(c + 1) * k]
        cid = cid[cid >= 0]
        # every prim in the row lies inside leaf box A or leaf box B
        in_a = ((mins[cid] >= glo[0, c] - 1e-4).all(1)
                & (maxs[cid] <= ghi[0, c] + 1e-4).all(1))
        in_b = ((mins[cid] >= glo[1, c] - 1e-4).all(1)
                & (maxs[cid] <= ghi[1, c] + 1e-4).all(1))
        assert (in_a | in_b).all()
        # pair union == the row union box (no third leaf hides anywhere)
        np.testing.assert_allclose(
            np.minimum(glo[0, c], glo[1, c]), lo[c], atol=1e-5)
        np.testing.assert_allclose(
            np.maximum(ghi[0, c], ghi[1, c]), hi[c], atol=1e-5)
    geom = (
        Vec3(*[jnp.asarray(centers[:, i]) for i in range(3)]),
        jnp.asarray(radii ** 2),
    )
    p, d = _rays(500)
    t_ref, id_ref = intersect.intersect_spheres(p, d, *geom)
    t_pk, id_pk = tk.intersect_clustered_pallas(
        cp, p, d, tile_r=128, plan="group", interpret=True)
    np.testing.assert_array_equal(np.asarray(id_pk), np.asarray(id_ref))
    np.testing.assert_allclose(np.asarray(t_pk), np.asarray(t_ref), rtol=5e-5)
    tfar = jnp.asarray(RNG.uniform(0.5, 20.0, 500).astype(np.float32))
    occ_ref = np.asarray(intersect.occluded_spheres(p, d, tfar, *geom))
    occ_pk = np.asarray(
        tk.occluded_clustered_pallas(cp, p, d, tfar, tile_r=128,
                                     plan="group", interpret=True)
    )
    np.testing.assert_array_equal(occ_pk, occ_ref)
    # plan='group' on a pack WITHOUT group boxes falls back to 'ray'
    cp_plain = clustered.build_clusters_sah(mins, maxs, rows,
                                            cluster_size=64, kind="sphere")
    t_fb, id_fb = tk.intersect_clustered_pallas(
        cp_plain, p, d, tile_r=128, plan="group", interpret=True)
    np.testing.assert_array_equal(np.asarray(id_fb), np.asarray(id_ref))


@pytest.mark.parametrize(
    "plan",
    # both planners are documented measured-negative alternatives
    # (ARCHITECTURE.md); their ~35 s of parity checking runs in ci.sh
    [pytest.param("tilebox", marks=pytest.mark.slow),
     pytest.param("hybrid", marks=pytest.mark.slow)],
)
def test_plan_variants_match_ray_plan(plan):
    """The conservative broad-phase planners (tilebox interval test, hybrid
    coherent-tile dispatch) plan visit SUPERSETS of the per-ray plan, so
    closest-hit t/id and shadow occlusion must be identical. Mixed
    coherent/incoherent ray population exercises both hybrid branches."""
    scene_cp, (center, rsq) = _sphere_setup(P=200, K=64)
    R = 512
    p = RNG.uniform(-8, 8, (R, 3)).astype(np.float32)
    d = RNG.normal(size=(R, 3)).astype(np.float32)
    d[: R // 2] = np.abs(d[: R // 2]) + 0.05  # coherent half (octant +++)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    pv = Vec3(*[jnp.asarray(p[:, i]) for i in range(3)])
    dv = Vec3(*[jnp.asarray(d[:, i]) for i in range(3)])

    t0, i0 = tk.intersect_clustered_pallas(
        scene_cp, pv, dv, tile_r=64, interpret=True
    )
    t1, i1 = tk.intersect_clustered_pallas(
        scene_cp, pv, dv, tile_r=64, interpret=True, plan=plan
    )
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))

    tf = jnp.where(t0 < 3e38, t0 * jnp.float32(0.99), jnp.float32(4.0))
    o0 = tk.occluded_clustered_pallas(
        scene_cp, pv, dv, tf, tile_r=64, interpret=True
    )
    o1 = tk.occluded_clustered_pallas(
        scene_cp, pv, dv, tf, tile_r=64, interpret=True, plan=plan
    )
    np.testing.assert_array_equal(np.asarray(o0), np.asarray(o1))


@pytest.mark.parametrize("P,K", [(2000, 8), (900, 8)])  # C = 250, 113
@pytest.mark.slow
def test_super_plan_bit_identical(P, K):
    """The two-level (supercluster) broad phase must be BIT-identical to
    the flat per-ray planner, not merely a superset: phase B re-runs
    _tile_entry_row's exact arithmetic on the exact per-cluster slab values
    for entered superclusters, and skipping a rejected super is exact
    because the union-box entry lower-bounds every member entry. C=250
    exercises multiple supers + a partial last one; C=113 the single-super
    sub-128 path. Covers the in-kernel-sort planner, the unsorted
    (suffix-min) path, and the shadow kernel."""
    cp, _ = _sphere_setup(P=P, K=K)
    pv, dv = _rays(512)
    for kw in (dict(), dict(sort=False)):
        t0, i0 = tk.intersect_clustered_pallas(
            cp, pv, dv, tile_r=64, interpret=True, **kw
        )
        t1, i1 = tk.intersect_clustered_pallas(
            cp, pv, dv, tile_r=64, interpret=True, plan="super", **kw
        )
        np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
        np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))
    tf = jnp.where(t0 < 3e38, t0 * jnp.float32(0.99), jnp.float32(4.0))
    o0 = tk.occluded_clustered_pallas(cp, pv, dv, tf, tile_r=64,
                                      interpret=True)
    o1 = tk.occluded_clustered_pallas(cp, pv, dv, tf, tile_r=64,
                                      interpret=True, plan="super")
    np.testing.assert_array_equal(np.asarray(o0), np.asarray(o1))


def test_mxu_battery_matches_vpu():
    """pallas_mxu=True (triangle narrow phase as two MXU dots) selects the
    same prims; t agrees to float rounding (different fma association)."""
    from cpu_raytracing_experiments_tpu.scene import accel as accel_mod
    from cpu_raytracing_experiments_tpu.scene import builders

    # K=128: the MXU battery excludes lane-packed sub-128 clusters
    scene = accel_mod.with_pallas_clusters(
        builders.mesh_scene(32, 32, subdivisions=3), cluster_size=128
    )
    cp = scene.tri_clusters
    pv, dv = _rays(R=512)
    t0, i0 = tk.intersect_clustered_pallas(cp, pv, dv, tile_r=64,
                                           interpret=True)
    t1, i1 = tk.intersect_clustered_pallas(cp, pv, dv, tile_r=64,
                                           interpret=True, mxu=True)
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    hit = np.asarray(i0) >= 0
    np.testing.assert_allclose(
        np.asarray(t0)[hit], np.asarray(t1)[hit], rtol=1e-5, atol=1e-6
    )


@pytest.mark.parametrize("unroll,plan_block", [(2, 8), (4, 32), (8, 16)])
@pytest.mark.slow
def test_unroll_and_plan_block_bit_exact(unroll, plan_block):
    """The perf knobs (visits per traversal-loop trip, tiles per planner
    program) must be bit-exact vs the defaults: with sorted entries,
    gating each extra visit on the same early-exit test makes skipped /
    extra visits provably result-neutral (a cluster whose tile entry
    exceeds the max live tfar cannot beat any lane's best)."""
    cp, _ = _sphere_setup(P=300)
    p, d = _rays(777)  # non-tile-multiple ray count
    alive = jnp.asarray(RNG.random(777) > 0.25)
    t0, i0 = tk.intersect_clustered_pallas(
        cp, p, d, None, alive, tile_r=64, interpret=True
    )
    t1, i1 = tk.intersect_clustered_pallas(
        cp, p, d, None, alive, tile_r=64, interpret=True,
        unroll=unroll, plan_block=plan_block,
    )
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))
    tf = jnp.where(alive, jnp.float32(10.0), jnp.float32(0.0))
    o0 = tk.occluded_clustered_pallas(cp, p, d, tf, tile_r=64, interpret=True)
    o1 = tk.occluded_clustered_pallas(
        cp, p, d, tf, tile_r=64, interpret=True,
        unroll=unroll, plan_block=plan_block,
    )
    np.testing.assert_array_equal(np.asarray(o0), np.asarray(o1))


@pytest.mark.parametrize(
    "fuse,trav_block",
    [  # default gate keeps the production-like (4, 8); the other corners
       # stay in the full suite (ci.sh) — suite-gate budget, VERDICT r4 #8
        pytest.param(True, 1, marks=pytest.mark.slow),
        pytest.param(False, 8, marks=pytest.mark.slow),
        pytest.param(True, 8, marks=pytest.mark.slow),
        pytest.param(4, 1, marks=pytest.mark.slow),
        (4, 8),
    ],
)
def test_fuse_and_trav_block_bit_exact(fuse, trav_block):
    """Fused paired visits (one [TILE_R, 2K] reduction + loop-carried hit
    state per pair) and the 8-tiles-per-program traversal schedule must be
    bit-exact vs the serial defaults: the concat keeps first-cluster lanes
    first (visit-order tie-break preserved) and the pair's second visit is
    gated on the same sorted-entry early-exit test the serial pl.when
    applies; trav_block only re-batches whole tiles onto one program."""
    cp, _ = _sphere_setup(P=300)
    p, d = _rays(777)  # non-tile-multiple ray count
    alive = jnp.asarray(RNG.random(777) > 0.25)
    t0, i0 = tk.intersect_clustered_pallas(
        cp, p, d, None, alive, tile_r=64, interpret=True
    )
    t1, i1 = tk.intersect_clustered_pallas(
        cp, p, d, None, alive, tile_r=64, interpret=True,
        fuse=fuse, trav_block=trav_block,
    )
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))
    tf = jnp.where(alive, jnp.float32(10.0), jnp.float32(0.0))
    o0 = tk.occluded_clustered_pallas(cp, p, d, tf, tile_r=64, interpret=True)
    o1 = tk.occluded_clustered_pallas(
        cp, p, d, tf, tile_r=64, interpret=True,
        fuse=fuse, trav_block=trav_block,
    )
    np.testing.assert_array_equal(np.asarray(o0), np.asarray(o1))


@pytest.mark.parametrize(
    "exit_refresh,prefetch",
    [  # default gate keeps the A/B-candidate (32, False); prefetch corners
       # run in the full suite (ci.sh)
        (32, False),
        pytest.param(8, True, marks=pytest.mark.slow),
        pytest.param(64, True, marks=pytest.mark.slow),
    ],
)
def test_exit_refresh_and_prefetch_bit_exact(exit_refresh, prefetch):
    """The walk's scalar-sync knobs must be bit-exact vs the defaults:
    a staler exit bound only ADMITS extra (result-neutral) visits, and
    prefetched visit/entry scalars are loop-invariant inputs read a trip
    early — identical values, same mx program points. Note interpret mode
    never fires the early exit (stale-SMEM cond, ROADMAP.md item 4), so
    this covers the no-exit walk; the hardware golden gate
    (benchmarks/tpu_goldens.py) exercises the exit path compiled."""
    cp, _ = _sphere_setup(P=300)
    p, d = _rays(777)
    alive = jnp.asarray(RNG.random(777) > 0.25)
    t0, i0 = tk.intersect_clustered_pallas(
        cp, p, d, None, alive, tile_r=64, interpret=True, fuse=4,
        trav_block=8,
    )
    t1, i1 = tk.intersect_clustered_pallas(
        cp, p, d, None, alive, tile_r=64, interpret=True, fuse=4,
        trav_block=8, exit_refresh=exit_refresh, prefetch=prefetch,
    )
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))
    tf = jnp.where(alive, jnp.float32(10.0), jnp.float32(0.0))
    o0 = tk.occluded_clustered_pallas(
        cp, p, d, tf, tile_r=64, interpret=True, fuse=4, trav_block=8
    )
    o1 = tk.occluded_clustered_pallas(
        cp, p, d, tf, tile_r=64, interpret=True, fuse=4, trav_block=8,
        exit_refresh=exit_refresh, prefetch=prefetch,
    )
    np.testing.assert_array_equal(np.asarray(o0), np.asarray(o1))


def test_fuse_trav_block_triangles_and_seed():
    """Triangle batteries + tfar0 seeding through the fused/batched path."""
    P = 240
    v0 = RNG.uniform(-4, 4, (P, 3)).astype(np.float32)
    e1 = RNG.normal(0, 0.5, (P, 3)).astype(np.float32)
    e2 = RNG.normal(0, 0.5, (P, 3)).astype(np.float32)
    rows = np.concatenate([v0, e1, e2], axis=1)
    mins = np.minimum(v0, np.minimum(v0 + e1, v0 + e2))
    maxs = np.maximum(v0, np.maximum(v0 + e1, v0 + e2))
    cp = clustered.build_clusters(mins, maxs, rows, num_clusters=4,
                                  kind="triangle")
    p, d = _rays(333)
    seed = jnp.full((333,), 6.0)
    t0, i0 = tk.intersect_clustered_pallas(
        cp, p, d, tfar0=seed, tile_r=64, interpret=True
    )
    t1, i1 = tk.intersect_clustered_pallas(
        cp, p, d, tfar0=seed, tile_r=64, interpret=True, fuse=True,
        trav_block=8,
    )
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))


@pytest.mark.parametrize(
    "K,fuse",
    # (32, fuse=4) covers the same K=32 packing as (32, False) plus the
    # fused walk; the unfused twin is ci.sh-only
    [pytest.param(32, False, marks=pytest.mark.slow), (32, 4), (64, 2)],
)
def test_lane_packed_sub128_clusters_bit_exact(K, fuse):
    """Sub-128 cluster sizes lane-pack 128/K clusters per battery (tables
    lane-tiled to 128, scalar-gated group selects): hits must be
    BIT-identical to the K=128 kernel on the same primitives — the pack is
    a pure battery-layout change (same per-pair algebra, same visit-order
    (t, lane) tie-break through the packed lane ordering)."""
    P = 512
    centers = RNG.uniform(-5, 5, (P, 3)).astype(np.float32)
    radii = RNG.uniform(0.1, 0.6, P).astype(np.float32)
    rows = np.concatenate([centers, (radii ** 2)[:, None]], axis=1)

    def mk(k):
        return clustered.build_clusters(
            centers - radii[:, None], centers + radii[:, None], rows,
            num_clusters=P // k, kind="sphere",
        )

    cp128, cpk = mk(128), mk(K)
    assert cpk.cluster_size == K
    p, d = _rays(333)
    t0, i0 = tk.intersect_clustered_pallas(cp128, p, d, tile_r=64,
                                           interpret=True)
    t1, i1 = tk.intersect_clustered_pallas(cpk, p, d, tile_r=64,
                                           interpret=True, fuse=fuse)
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))
    tf = jnp.where(i0 >= 0, t0 * 0.999, 12.0)
    o0 = tk.occluded_clustered_pallas(cp128, p, d, tf, tile_r=64,
                                      interpret=True)
    o1 = tk.occluded_clustered_pallas(cpk, p, d, tf, tile_r=64,
                                      interpret=True, fuse=fuse)
    np.testing.assert_array_equal(np.asarray(o0), np.asarray(o1))


def test_stream_bit_exact_spheres():
    """HBM-streaming traversal (cluster tables DMA'd per visit into a
    double-buffered VMEM scratch) must be bit-exact vs the VMEM-resident
    default: same batteries, same visit order, same early-exit gates —
    only the residence of the attribute rows changes. K=128: streaming
    excludes lane-packed sub-128 clusters (table rows live in HBM)."""
    cp, _ = _sphere_setup(P=300, K=128)
    p, d = _rays(777)
    alive = jnp.asarray(RNG.random(777) > 0.25)
    t0, i0 = tk.intersect_clustered_pallas(
        cp, p, d, None, alive, tile_r=64, interpret=True
    )
    t1, i1 = tk.intersect_clustered_pallas(
        cp, p, d, None, alive, tile_r=64, interpret=True, stream=True
    )
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))
    tf = jnp.where(alive, jnp.float32(10.0), jnp.float32(0.0))
    o0 = tk.occluded_clustered_pallas(cp, p, d, tf, tile_r=64, interpret=True)
    o1 = tk.occluded_clustered_pallas(
        cp, p, d, tf, tile_r=64, interpret=True, stream=True
    )
    np.testing.assert_array_equal(np.asarray(o0), np.asarray(o1))


@pytest.mark.slow  # heaviest stream test; sphere stream bit-exactness and
# the renderer-level stream-vs-brute check remain in the default gate
def test_stream_triangles_and_seed():
    """Triangle batteries + tfar0 seeding through the streaming path."""
    P = 240
    v0 = RNG.uniform(-4, 4, (P, 3)).astype(np.float32)
    e1 = RNG.normal(0, 0.5, (P, 3)).astype(np.float32)
    e2 = RNG.normal(0, 0.5, (P, 3)).astype(np.float32)
    rows = np.concatenate([v0, e1, e2], axis=1)
    mins = np.minimum(v0, np.minimum(v0 + e1, v0 + e2))
    maxs = np.maximum(v0, np.maximum(v0 + e1, v0 + e2))
    cp = clustered.build_clusters(mins, maxs, rows, num_clusters=2,
                                  kind="triangle")  # k=120 -> 128 (stream)
    p, d = _rays(333)
    seed = jnp.full((333,), 6.0)
    t0, i0 = tk.intersect_clustered_pallas(
        cp, p, d, tfar0=seed, tile_r=64, interpret=True
    )
    t1, i1 = tk.intersect_clustered_pallas(
        cp, p, d, tfar0=seed, tile_r=64, interpret=True, stream=True
    )
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))
    tf = jnp.full((333,), 6.0)
    o0 = tk.occluded_clustered_pallas(cp, p, d, tf, tile_r=64, interpret=True)
    o1 = tk.occluded_clustered_pallas(
        cp, p, d, tf, tile_r=64, interpret=True, stream=True
    )
    np.testing.assert_array_equal(np.asarray(o0), np.asarray(o1))


def test_renderer_accel_pallas_stream_matches_brute():
    """Full renderer with accel='pallas' + pallas_stream=True (interpret)
    is bit-identical to brute: the production dispatch resolves the
    streaming kernel per pack and drops the incompatible schedule knobs."""
    from cpu_raytracing_experiments_tpu.render.api import Renderer
    from cpu_raytracing_experiments_tpu.scene import accel as accel_mod
    from cpu_raytracing_experiments_tpu.scene import builders
    from cpu_raytracing_experiments_tpu.utils.config import RendererPolicy

    w = h = 24
    scene = builders.cornell_box_scene(w, h)  # spheres + triangles
    base = RendererPolicy(max_bounces=4, rays_per_chunk=w * h)
    rb = Renderer(scene, base, w, h)
    rb.accumulate(2)
    sc = accel_mod.with_pallas_clusters(scene, cluster_size=32)
    pol = dataclasses.replace(
        base, accel="pallas", pallas_tile_rays=64, pallas_interpret=True,
        pallas_stream=True,
    )
    rp = Renderer(sc, pol, w, h)
    rp.accumulate(2)
    np.testing.assert_array_equal(
        np.asarray(rp.state.buckets), np.asarray(rb.state.buckets)
    )


def test_primary_accel_override_bit_exact():
    """policy.primary_accel peels bounce 0 out of the while_loop and runs it
    with a different accel backend; since every backend returns identical
    hits and RNG is keyed by state.bounce, the render must be bit-identical
    to the unpeeled single-accel run."""
    from cpu_raytracing_experiments_tpu.render.api import Renderer
    from cpu_raytracing_experiments_tpu.scene import accel as accel_mod
    from cpu_raytracing_experiments_tpu.scene import builders
    from cpu_raytracing_experiments_tpu.utils.config import RendererPolicy

    w = h = 24
    scene = builders.cornell_box_scene(w, h)
    base = RendererPolicy(max_bounces=4, rays_per_chunk=w * h)
    rb = Renderer(scene, base, w, h)
    rb.accumulate(2)
    sc = accel_mod.with_pallas_clusters(scene, cluster_size=32)
    pol = dataclasses.replace(
        base, accel="brute", primary_accel="pallas", pallas_tile_rays=64,
        pallas_interpret=True,
    )
    rp = Renderer(sc, pol, w, h)
    rp.accumulate(2)
    np.testing.assert_array_equal(
        np.asarray(rp.state.buckets), np.asarray(rb.state.buckets)
    )


def test_unsorted_plan_entries_are_suffix_minima():
    """The traversal kernels' early-exit test `entry[j] < mx` is only safe
    when all later entries are at least as large. sort=False (morton visit
    order) violates that raw, so _plan_visits passes the SUFFIX MINIMUM of
    the entries — equivalently, the exit array must be non-decreasing along
    the visit axis. (Interpret mode never fires the exit — the interpreter's
    while_loop cond reads a stale mx — so this invariant plus the hardware
    gate in benchmarks/tpu_goldens.py::_early_exit_gate carry the
    correctness argument.)"""
    cp, _ = _sphere_setup(P=400, K=32)
    p, d = _rays(512)
    rp = 512
    ray_in = tk._ray_cols(
        [(p.x, 1e30), (p.y, 1e30), (p.z, 1e30), (d.x, 1.0), (d.y, 1.0),
         (d.z, 1.0), (jnp.full((512,), tk.FLT_MAX), 0.0),
         (jnp.ones((512,)), 0.0)], rp,
    )
    for sort in (True, False):
        _, entry, nvis = tk._plan_visits(cp, ray_in, 8, 64, sort, True)
        e = np.asarray(entry)
        assert (np.diff(e, axis=1) >= 0).all(), f"sort={sort}"


@pytest.mark.slow
def test_early_exit_spike_dip_scene_interpret():
    """The forced spike-then-dip visit-order scene (the sort=False early-
    exit counterexample) must resolve to the brute result. Interpret mode
    can't fire the exit, so this is a smoke of scene construction + the
    suffix-min plumbing; the compiled-path check lives in
    benchmarks/tpu_goldens.py::_early_exit_gate."""
    import benchmarks.tpu_goldens as tg

    assert tg._early_exit_gate(interpret=True) == 0


@pytest.mark.slow
def test_primary_accel_compositions():
    """primary_accel composes bit-exactly with ReSTIR (same-peel site) and
    adaptive allocation. ReSTIR needs ray_order pinned to 'raster': the
    auto rule flips to 'tile' for pallas, which reshuffles ReSTIR's
    lane-offset spatial neighborhoods (equal in distribution, not bitwise —
    see RendererPolicy.primary_accel docstring)."""
    from cpu_raytracing_experiments_tpu.render.api import Renderer
    from cpu_raytracing_experiments_tpu.scene import accel as accel_mod
    from cpu_raytracing_experiments_tpu.scene import builders
    from cpu_raytracing_experiments_tpu.utils.config import RendererPolicy

    w = h = 24
    scene = builders.cornell_box_scene(w, h)
    sc = accel_mod.with_pallas_clusters(scene, cluster_size=32)
    base = RendererPolicy(max_bounces=3, rays_per_chunk=w * h,
                          light_sampling="restir")
    rb = Renderer(scene, base, w, h)
    rb.accumulate(3)
    pol = dataclasses.replace(
        base, primary_accel="pallas", pallas_tile_rays=64,
        pallas_interpret=True, ray_order="raster",
    )
    rp = Renderer(sc, pol, w, h)
    rp.accumulate(3)
    np.testing.assert_array_equal(
        np.asarray(rp.state.buckets), np.asarray(rb.state.buckets)
    )

    b2 = dataclasses.replace(base, light_sampling="uniform")
    r2 = Renderer(scene, b2, w, h)
    r2.render_adaptive(0.0, max_spp=6, warmup=5)
    p2 = dataclasses.replace(
        b2, primary_accel="pallas", pallas_tile_rays=64,
        pallas_interpret=True,
    )
    r3 = Renderer(sc, p2, w, h)
    r3.render_adaptive(0.0, max_spp=6, warmup=5)
    np.testing.assert_array_equal(
        np.asarray(r3.state.buckets), np.asarray(r2.state.buckets)
    )


@pytest.mark.slow
def test_sort_impl_kernel_matches_xla():
    """The in-kernel vectorized selection sort (pallas_sort_impl='kernel')
    must reproduce the XLA argsort path bit-for-bit: same visit order
    (stable ascending-entry, ties by cluster id), same entries, same nvis
    — so closest/shadow results are bit-identical."""
    cp, _ = _sphere_setup(P=300, K=64)
    p, d = _rays(R=1024)
    for kw in (dict(), dict(fuse=4), dict(trav_block=8)):
        t1, i1 = tk.intersect_clustered_pallas(
            cp, p, d, tile_r=128, sort_impl="kernel", interpret=True, **kw
        )
        t2, i2 = tk.intersect_clustered_pallas(
            cp, p, d, tile_r=128, sort_impl="xla", interpret=True, **kw
        )
        np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    tf = jnp.full((1024,), 4.0, jnp.float32)
    o1 = tk.occluded_clustered_pallas(
        cp, p, d, tf, tile_r=128, sort_impl="kernel", interpret=True
    )
    o2 = tk.occluded_clustered_pallas(
        cp, p, d, tf, tile_r=128, sort_impl="xla", interpret=True
    )
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    # raw planner outputs agree on the visited prefix of every tile row
    ray_in = tk._ray_cols(
        [(p.x, 1e30), (p.y, 1e30), (p.z, 1e30), (d.x, 1.0), (d.y, 1.0),
         (d.z, 1.0), (jnp.full((1024,), 3.4e38, jnp.float32), 0.0),
         (jnp.ones((1024,), jnp.float32), 0.0)], 1024,
    )
    o_k, e_k, n_k = tk._plan_visits(cp, ray_in, 8, 128, True, True, "ray",
                                    8, "kernel")
    o_x, e_x, n_x = tk._plan_visits(cp, ray_in, 8, 128, True, True, "ray",
                                    8, "xla")
    nk = np.asarray(n_k)
    np.testing.assert_array_equal(nk, np.asarray(n_x))
    for r in range(nk.shape[0]):
        n = nk[r, 0]
        np.testing.assert_array_equal(
            np.asarray(o_k)[r, :n], np.asarray(o_x)[r, :n])
        np.testing.assert_array_equal(
            np.asarray(e_k)[r, :n], np.asarray(e_x)[r, :n])
