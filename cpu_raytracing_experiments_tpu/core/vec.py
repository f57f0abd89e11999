"""SoA 3-vector / quaternion math for TPU.

The reference keeps ray state as structure-of-arrays streams
(``/root/reference/DataStreams.hpp:74-128``) and does its vector math with
8-wide AVX2 registers (``/root/reference/VectorMath.hpp``). On TPU the
idiomatic equivalent is *separate full-width arrays per component*: a
``Vec3`` of three ``[N]`` float32 arrays runs every elementwise op at full
VPU width (8x128 lanes), whereas an ``[N, 3]`` layout would pad the trailing
dimension 3 -> 128 and waste ~97% of each register.

``Vec3``/``Quat`` are NamedTuples, hence automatically JAX pytrees: they can
be carried through ``jit`` / ``lax.while_loop`` / ``shard_map`` unchanged.
"""
from __future__ import annotations

from typing import NamedTuple, Union

import jax.numpy as jnp

Scalar = Union[float, jnp.ndarray]


class Vec3(NamedTuple):
    """Structure-of-arrays 3-vector: three same-shape component arrays."""

    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray

    # -- arithmetic ---------------------------------------------------------
    def __add__(self, o: "Vec3") -> "Vec3":
        return Vec3(self.x + o.x, self.y + o.y, self.z + o.z)

    def __sub__(self, o: "Vec3") -> "Vec3":
        return Vec3(self.x - o.x, self.y - o.y, self.z - o.z)

    def __mul__(self, o) -> "Vec3":
        if isinstance(o, Vec3):
            return Vec3(self.x * o.x, self.y * o.y, self.z * o.z)
        return Vec3(self.x * o, self.y * o, self.z * o)

    __rmul__ = __mul__

    def __neg__(self) -> "Vec3":
        return Vec3(-self.x, -self.y, -self.z)

    def __truediv__(self, o) -> "Vec3":
        if isinstance(o, Vec3):
            return Vec3(self.x / o.x, self.y / o.y, self.z / o.z)
        inv = 1.0 / o
        return Vec3(self.x * inv, self.y * inv, self.z * inv)

    # -- reductions ---------------------------------------------------------
    def dot(self, o: "Vec3") -> jnp.ndarray:
        return self.x * o.x + self.y * o.y + self.z * o.z

    def length_sq(self) -> jnp.ndarray:
        return self.dot(self)

    def length(self) -> jnp.ndarray:
        return jnp.sqrt(self.length_sq())

    def normalize(self) -> "Vec3":
        inv = jax_rsqrt(jnp.maximum(self.length_sq(), 1e-30))
        return self * inv

    def cross(self, o: "Vec3") -> "Vec3":
        return Vec3(
            self.y * o.z - self.z * o.y,
            self.z * o.x - self.x * o.z,
            self.x * o.y - self.y * o.x,
        )

    def max_component(self) -> jnp.ndarray:
        return jnp.maximum(self.x, jnp.maximum(self.y, self.z))

    def min_component(self) -> jnp.ndarray:
        return jnp.minimum(self.x, jnp.minimum(self.y, self.z))

    # -- helpers ------------------------------------------------------------
    @staticmethod
    def full(shape, value, dtype=jnp.float32) -> "Vec3":
        a = jnp.full(shape, value, dtype)
        return Vec3(a, a, a)

    @staticmethod
    def zeros(shape, dtype=jnp.float32) -> "Vec3":
        return Vec3.full(shape, 0.0, dtype)

    @staticmethod
    def ones(shape, dtype=jnp.float32) -> "Vec3":
        return Vec3.full(shape, 1.0, dtype)

    @staticmethod
    def splat(v, shape=()) -> "Vec3":
        """Broadcast a python/np length-3 sequence to a Vec3 of `shape`."""
        return Vec3(
            jnp.broadcast_to(jnp.float32(v[0]), shape),
            jnp.broadcast_to(jnp.float32(v[1]), shape),
            jnp.broadcast_to(jnp.float32(v[2]), shape),
        )

    def where(self, mask, other: "Vec3") -> "Vec3":
        """Componentwise select: mask ? self : other."""
        return Vec3(
            jnp.where(mask, self.x, other.x),
            jnp.where(mask, self.y, other.y),
            jnp.where(mask, self.z, other.z),
        )

    def stack(self) -> jnp.ndarray:
        """Return as a single [..., 3] array (host/IO paths only)."""
        return jnp.stack([self.x, self.y, self.z], axis=-1)

    @staticmethod
    def from_stacked(a) -> "Vec3":
        return Vec3(a[..., 0], a[..., 1], a[..., 2])

    def gather(self, idx) -> "Vec3":
        """Index each component with `idx` (e.g. material table lookup)."""
        return Vec3(self.x[idx], self.y[idx], self.z[idx])


def jax_rsqrt(x):
    import jax.lax

    return jax.lax.rsqrt(x)


class Quat(NamedTuple):
    """SoA quaternion (x, y, z, w), w = scalar part (glm layout)."""

    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray
    w: jnp.ndarray

    def rotate(self, v: Vec3) -> Vec3:
        """Full quaternion rotation q * v * conj(q) (general q).

        Matches glm::rotate(quat, vec3); used for camera orientation
        (``/root/reference/Camera.hpp:80-88``).
        """
        # t = 2 * cross(q.xyz, v); v' = v + q.w * t + cross(q.xyz, t)
        qv = Vec3(self.x, self.y, self.z)
        t = qv.cross(v) * 2.0
        return v + t * self.w + qv.cross(t)

    def conjugate(self) -> "Quat":
        return Quat(-self.x, -self.y, -self.z, self.w)

    @staticmethod
    def from_stacked(a) -> "Quat":
        return Quat(a[..., 0], a[..., 1], a[..., 2], a[..., 3])
