"""Pallas sphere-battery kernel vs the jnp battery (interpreter mode so it
runs in the CPU CI; the same kernel was validated compiled on real TPU —
ids matched 100% at 128k rays x 256 prims)."""
import numpy as np
import jax.numpy as jnp

from cpu_raytracing_experiments_tpu.core.vec import Vec3
from cpu_raytracing_experiments_tpu.ops import intersect
from cpu_raytracing_experiments_tpu.ops.pallas import sphere_kernel as pk


def _setup(n=2048, m=64, seed=0):
    g = np.random.default_rng(seed)
    p = Vec3(*[jnp.asarray(g.uniform(-20, 20, n).astype(np.float32)) for _ in range(3)])
    dn = g.normal(size=(n, 3)).astype(np.float32)
    dn /= np.linalg.norm(dn, axis=1, keepdims=True)
    d = Vec3(*[jnp.asarray(dn[:, k]) for k in range(3)])
    c = Vec3(*[jnp.asarray(g.uniform(-20, 20, m).astype(np.float32)) for _ in range(3)])
    rsq = jnp.asarray(g.uniform(0.5, 3.0, m).astype(np.float32) ** 2)
    return p, d, c, rsq


def test_pallas_closest_matches_jnp():
    p, d, c, rsq = _setup()
    bt, bid = intersect.intersect_spheres(p, d, c, rsq)
    tt, tid = pk.intersect_spheres_pallas(p, d, c, rsq, interpret=True)
    np.testing.assert_array_equal(np.asarray(tid), np.asarray(bid))
    hit = np.asarray(bid) >= 0
    np.testing.assert_allclose(np.asarray(tt)[hit], np.asarray(bt)[hit], rtol=2e-3)  # grazing-hit fp fusion differences


def test_pallas_occluded_matches_jnp():
    p, d, c, rsq = _setup(seed=3)
    tfar = jnp.full((p.x.shape[0],), 25.0)
    want = np.asarray(intersect.occluded_spheres(p, d, tfar, c, rsq))
    got = np.asarray(pk.occluded_spheres_pallas(p, d, tfar, c, rsq, interpret=True))
    np.testing.assert_array_equal(got, want)


def test_pallas_multi_prim_block_accumulation():
    """P > TILE_P exercises the round-5 revisited-output combine path
    (pl.when(j > 0) min/OR accumulation): closest ids must still match the
    brute battery exactly — including first-occurrence tie-breaks across
    prim-block boundaries — and occlusion bits must OR across blocks."""
    assert pk.TILE_P >= 4  # test shrinks the block to force multiple
    orig = pk.TILE_P
    try:
        pk.TILE_P = 4  # 64 prims -> 16 blocks; combine path dominates
        pk.intersect_spheres_pallas.clear_cache()
        pk.occluded_spheres_pallas.clear_cache()
        p, d, c, rsq = _setup(n=1024, m=64, seed=11)
        bt, bid = intersect.intersect_spheres(p, d, c, rsq)
        tt, tid = pk.intersect_spheres_pallas(p, d, c, rsq, interpret=True)
        np.testing.assert_array_equal(np.asarray(tid), np.asarray(bid))
        hit = np.asarray(bid) >= 0
        np.testing.assert_allclose(
            np.asarray(tt)[hit], np.asarray(bt)[hit], rtol=2e-3)
        # duplicate spheres across DIFFERENT blocks: the earlier block's id
        # must win the tie (strict-less-than combine keeps first occurrence)
        c_dup = Vec3(*(jnp.concatenate([a, a]) for a in (c.x, c.y, c.z)))
        rsq_dup = jnp.concatenate([rsq, rsq])
        _, tid_dup = pk.intersect_spheres_pallas(
            p, d, c_dup, rsq_dup, interpret=True)
        np.testing.assert_array_equal(np.asarray(tid_dup), np.asarray(bid))
        tfar = jnp.full((p.x.shape[0],), 25.0)
        want = np.asarray(intersect.occluded_spheres(p, d, tfar, c, rsq))
        got = np.asarray(
            pk.occluded_spheres_pallas(p, d, tfar, c, rsq, interpret=True))
        np.testing.assert_array_equal(got, want)
    finally:
        pk.TILE_P = orig
        pk.intersect_spheres_pallas.clear_cache()
        pk.occluded_spheres_pallas.clear_cache()
