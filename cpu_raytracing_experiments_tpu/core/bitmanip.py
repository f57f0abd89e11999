"""Bit-manipulation utilities — parity with /root/reference/Bitmanip.hpp.

The reference wraps x86 intrinsics (tzcnt/pdep/popcnt/...); on TPU these are
elementwise uint32 ops over arrays. `bitreverse32` lives in core/rng.py
(it's part of the sample-index schedule); here are the rest that have
meaningful array-level uses: Morton codes (tiling/swizzle experiments,
Bitmanip.hpp:236-246), popcount, and power-of-two helpers.
"""
from __future__ import annotations

import jax.numpy as jnp

_U = jnp.uint32


def popcount32(x) -> jnp.ndarray:
    """Per-element bit population count (Bitmanip.hpp popcnt)."""
    x = jnp.asarray(x, jnp.uint32)
    x = x - ((x >> _U(1)) & _U(0x55555555))
    x = (x & _U(0x33333333)) + ((x >> _U(2)) & _U(0x33333333))
    x = (x + (x >> _U(4))) & _U(0x0F0F0F0F)
    return (x * _U(0x01010101)) >> _U(24)


def _part1by1(x) -> jnp.ndarray:
    """Spread the low 16 bits of x to even bit positions (pdep 0x55555555)."""
    x = jnp.asarray(x, jnp.uint32) & _U(0x0000FFFF)
    x = (x | (x << _U(8))) & _U(0x00FF00FF)
    x = (x | (x << _U(4))) & _U(0x0F0F0F0F)
    x = (x | (x << _U(2))) & _U(0x33333333)
    x = (x | (x << _U(1))) & _U(0x55555555)
    return x


def _compact1by1(x) -> jnp.ndarray:
    """Inverse of _part1by1 (pext 0x55555555)."""
    x = jnp.asarray(x, jnp.uint32) & _U(0x55555555)
    x = (x | (x >> _U(1))) & _U(0x33333333)
    x = (x | (x >> _U(2))) & _U(0x0F0F0F0F)
    x = (x | (x >> _U(4))) & _U(0x00FF00FF)
    x = (x | (x >> _U(8))) & _U(0x0000FFFF)
    return x


def morton_encode2d(x, y) -> jnp.ndarray:
    """Interleave 16-bit x (even bits) and y (odd bits)
    (Bitmanip.hpp:236-240)."""
    return _part1by1(x) | (_part1by1(y) << _U(1))


def morton_decode2d(code):
    """(x, y) from a 2D Morton code (Bitmanip.hpp:242-246)."""
    code = jnp.asarray(code, jnp.uint32)
    return _compact1by1(code), _compact1by1(code >> _U(1))


def round_up_pow2(x) -> jnp.ndarray:
    """Smallest power of two >= x (Bitmanip.hpp round_up_pow2)."""
    x = jnp.asarray(x, jnp.uint32)
    v = x - _U(1)
    v = v | (v >> _U(1))
    v = v | (v >> _U(2))
    v = v | (v >> _U(4))
    v = v | (v >> _U(8))
    v = v | (v >> _U(16))
    return jnp.where(x <= _U(1), _U(1), v + _U(1))


def float_exponent(x) -> jnp.ndarray:
    """Biased IEEE-754 exponent bits of a float32 array."""
    import jax

    bits = jax.lax.bitcast_convert_type(jnp.asarray(x, jnp.float32), jnp.uint32)
    return (bits >> _U(23)) & _U(0xFF)
