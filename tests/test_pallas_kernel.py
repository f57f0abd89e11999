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
