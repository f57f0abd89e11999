"""Bit-parity tests for the counter-based RNG against an independent
pure-Python uint32 oracle of /root/reference/Random.hpp."""
import numpy as np
import jax.numpy as jnp

from cpu_raytracing_experiments_tpu.core import rng

M32 = 0xFFFFFFFF


def py_pcg_state(v):
    return (v * 747796405 + 2891336453) & M32


def py_pcg_output(v):
    word = (((v >> ((v >> 28) + 4)) ^ v) * 277803737) & M32
    return ((word >> 22) ^ word) & M32


def py_hash_u32(i):
    i ^= i >> 16
    i = (i * 0x21F0AAAD) & M32
    i ^= i >> 15
    i = (i * 0xD35A2D97) & M32
    i ^= i >> 15
    return (i ^ 0xE6FE3BEB) & M32


def py_hash_2d(x, y):
    qx = (0x41C64E6D * (((x >> 1) ^ y) & M32)) & M32
    qy = (0x41C64E6D * (((y >> 1) ^ x) & M32)) & M32
    return (0x41C64E6D * ((qx ^ (qy >> 3)) & M32)) & M32


SAMPLE = [0, 1, 2, 12345, 0xDEADBEEF, 0xFFFFFFFF, 747796405, 2891336453]


def test_pcg_state_transition_parity():
    got = np.asarray(rng.pcg_state_transition(jnp.asarray(SAMPLE, jnp.uint32)))
    want = [py_pcg_state(v) for v in SAMPLE]
    assert got.tolist() == want


def test_pcg_output_parity():
    got = np.asarray(rng.pcg_output(jnp.asarray(SAMPLE, jnp.uint32)))
    want = [py_pcg_output(v) for v in SAMPLE]
    assert got.tolist() == want


def test_hash_u32_parity():
    got = np.asarray(rng.hash_u32(jnp.asarray(SAMPLE, jnp.uint32)))
    want = [py_hash_u32(v) for v in SAMPLE]
    assert got.tolist() == want


def test_hash_2d_parity():
    xs = [0, 1, 7, 123456, 0xFFFFFFFF]
    ys = [0, 3, 99, 0xABCDEF01, 1]
    got = np.asarray(
        rng.hash_2d(jnp.asarray(xs, jnp.uint32), jnp.asarray(ys, jnp.uint32))
    )
    want = [py_hash_2d(x, y) for x, y in zip(xs, ys)]
    assert got.tolist() == want


def test_unit_float_range_and_value():
    # make_unit_float = float(u32) * 2^-32, C cast semantics
    vals = jnp.asarray([0, 1, 1 << 31, 0xFFFFFFFF], jnp.uint32)
    got = np.asarray(rng.make_unit_float(vals))
    want = np.float32(np.asarray([0, 1, 1 << 31, 0xFFFFFFFF], np.float64).astype(np.float32) * 2.0**-32)
    np.testing.assert_array_equal(got, want)
    assert got[0] == 0.0 and abs(got[2] - 0.5) < 1e-7


def test_draw_sequence_matches_sequential_oracle():
    """draws() must reproduce n sequential rand_unit_float calls."""
    state0 = 0xCAFEBABE
    _, fs = rng.draws(jnp.uint32(state0), 4)
    s = state0
    for f in fs:
        out = py_pcg_output(s)
        s = py_pcg_state(s)
        expected = np.float32(np.float64(np.float32(out)) * 2.0**-32)
        assert float(f) == expected


def test_rand_bounded_int():
    state = jnp.asarray([123, 456, 789, 0xFFFFFFFF], jnp.uint32)
    _, v = rng.rand_bounded_int(state, jnp.uint32(7))
    v = np.asarray(v)
    assert (v < 7).all()


def test_bitreverse():
    got = np.asarray(rng.bitreverse32(jnp.asarray([1, 0x80000000, 0xF0F0F0F0], jnp.uint32)))
    assert got[0] == 0x80000000
    assert got[1] == 1
    assert got[2] == 0x0F0F0F0F


def test_uniformity():
    """Draws over many counters are ~uniform (chi-square-ish sanity)."""
    seeds = jnp.arange(100000, dtype=jnp.uint32)
    state = rng.hash_2d(jnp.uint32(1), seeds)
    _, f = rng.rand_unit_float(state)
    f = np.asarray(f)
    assert abs(f.mean() - 0.5) < 0.005
    assert abs(np.var(f) - 1 / 12) < 0.002
    hist, _ = np.histogram(f, bins=16, range=(0, 1))
    assert hist.min() > 0.9 * len(f) / 16
