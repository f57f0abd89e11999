"""Counter-based (stateless) RNG, bit-parity with the reference.

The reference uses a stateless PCG-style generator keyed on hashed counters
(``/root/reference/Random.hpp:10-50``) with the per-path seed schedule of
``/root/reference/Renderer.hpp:107,117,255,362``:

    seed(path)        = global_path_index * (2*max_bounces + 1)
    camera site state = hash_2d(accumulations, seed)
    NEE site state    = hash_2d(accumulations, seed + bounce*2)
    BRDF site state   = hash_2d(accumulations, seed + bounce*2 + 1)

and then draws sequentially from the LCG at each site. This maps perfectly
to TPU: every draw is pure uint32 arithmetic over full-width arrays — no
state tensors to thread, renders are deterministic and checkpoint/resume is
bit-exact (resuming at accumulation k reproduces exactly the same sample
stream as an uninterrupted run).

All functions operate elementwise on uint32 arrays of any shape.
"""
from __future__ import annotations

import jax.numpy as jnp

_U = jnp.uint32


def u32(x) -> jnp.ndarray:
    return jnp.asarray(x, jnp.uint32)


def pcg_state_transition(state: jnp.ndarray) -> jnp.ndarray:
    """LCG step (Random.hpp:10-13)."""
    return state * _U(747796405) + _U(2891336453)


def pcg_output(state: jnp.ndarray) -> jnp.ndarray:
    """PCG XSH-RR style output permutation (Random.hpp:14-18)."""
    word = ((state >> ((state >> _U(28)) + _U(4))) ^ state) * _U(277803737)
    return (word >> _U(22)) ^ word


def pcg_generate(state: jnp.ndarray):
    """Return (new_state, output). Output comes from the *previous* state,
    matching Random.hpp:20-24 (output of prev_state, then advance)."""
    return pcg_state_transition(state), pcg_output(state)


def make_unit_float(bits: jnp.ndarray) -> jnp.ndarray:
    """uint32 -> float in [0, 1] via x * 2^-32 (Random.hpp:5)."""
    return bits.astype(jnp.float32) * jnp.float32(2.0 ** -32)


def rand_unit_float(state: jnp.ndarray):
    """Return (new_state, float in [0,1]) (Random.hpp:26-29)."""
    state, bits = pcg_generate(state)
    return state, make_unit_float(bits)


def rand_bounded_int(state: jnp.ndarray, range_: jnp.ndarray):
    """Return (new_state, uint32 in [0, range)) (Random.hpp:31-34)."""
    state, f = rand_unit_float(state)
    r = jnp.asarray(range_, jnp.uint32)
    v = (f * r.astype(jnp.float32)).astype(jnp.uint32)
    return state, jnp.minimum(r - _U(1), v)


def hash_u32(i: jnp.ndarray) -> jnp.ndarray:
    """hash-prospector avalanche hash (Random.hpp:36-43)."""
    i = u32(i)
    i = i ^ (i >> _U(16))
    i = i * _U(0x21F0AAAD)
    i = i ^ (i >> _U(15))
    i = i * _U(0xD35A2D97)
    i = i ^ (i >> _U(15))
    return i ^ _U(0xE6FE3BEB)


def hash_2d(x, y) -> jnp.ndarray:
    """2D counter hash (Random.hpp:45-50)."""
    x = u32(x)
    y = u32(y)
    m = _U(0x41C64E6D)
    qx = m * ((x >> _U(1)) ^ y)
    qy = m * ((y >> _U(1)) ^ x)
    return m * (qx ^ (qy >> _U(3)))


def bitreverse32(x) -> jnp.ndarray:
    """Reverse the bits of a uint32 (Bitmanip.hpp:200-233 semantics)."""
    x = u32(x)
    x = ((x & _U(0x55555555)) << _U(1)) | ((x >> _U(1)) & _U(0x55555555))
    x = ((x & _U(0x33333333)) << _U(2)) | ((x >> _U(2)) & _U(0x33333333))
    x = ((x & _U(0x0F0F0F0F)) << _U(4)) | ((x >> _U(4)) & _U(0x0F0F0F0F))
    x = ((x & _U(0x00FF00FF)) << _U(8)) | ((x >> _U(8)) & _U(0x00FF00FF))
    return (x << _U(16)) | (x >> _U(16))


def draws(state: jnp.ndarray, n: int):
    """Draw `n` sequential unit floats from a site state.

    Returns (new_state, [f0, f1, ... f_{n-1}]) — the vectorized equivalent of
    n consecutive rand_unit_float(&state) calls in the reference hot loop.
    """
    outs = []
    for _ in range(n):
        state, f = rand_unit_float(state)
        outs.append(f)
    return state, outs
