"""Color pipeline: ACES tonemap, Reinhard, luminance, linear<->sRGB.

Vectorized ports of /root/reference/Color.hpp. The reference's 8-wide AVX2
paths (tonemapping(Vec8f&...), Color.hpp:66-73) become full-array elementwise
maps which XLA fuses into the resolve kernel; the RGBA interleave dance
(Renderer.hpp:462-473) is unnecessary on TPU — channels stay planar (SoA)
until host-side image export.
"""
from __future__ import annotations

import jax.numpy as jnp

from .vec import Vec3


def luminance(r, g, b):
    """Rec.709 luma (Color.hpp:19-25)."""
    return r * 0.2126 + g * 0.7152 + b * 0.0722


def reinhard(x):
    return x / (x + 1.0)


def aces_rtt_odt_fit(x):
    """(Color.hpp:39-49)."""
    return (x * (x + 0.0245786) - 0.000090537) / (
        x * (0.983729 * x + 0.4329510) + 0.238081
    )


def tonemap_aces(r, g, b):
    """ACES: input matrix -> rtt_odt fit -> output matrix -> clamp
    (Color.hpp:66-73). Operates channelwise on same-shape arrays."""
    x = aces_rtt_odt_fit(r * 0.59719 + g * 0.35458 + b * 0.04823)
    y = aces_rtt_odt_fit(r * 0.07600 + g * 0.90834 + b * 0.01566)
    z = aces_rtt_odt_fit(r * 0.02840 + g * 0.13383 + b * 0.83777)
    out_r = jnp.clip(x * 1.604750 + y * -0.53108 + z * -0.07367, 0.0, 1.0)
    out_g = jnp.clip(x * -0.10208 + y * 1.10813 + z * -0.00605, 0.0, 1.0)
    out_b = jnp.clip(x * -0.00327 + y * -0.07276 + z * 1.07602, 0.0, 1.0)
    return out_r, out_g, out_b


def tonemap_aces_vec(c: Vec3) -> Vec3:
    return Vec3(*tonemap_aces(c.x, c.y, c.z))


def linear_to_srgb(x):
    """Exact sRGB OETF (Color.hpp:8-11 reference formulae)."""
    x = jnp.clip(x, 0.0, 1.0)
    return jnp.where(
        x < 0.0031308, x * 12.92, 1.055 * jnp.power(x, 1.0 / 2.4) - 0.055
    )


def srgb_to_linear(x):
    return jnp.where(
        x < 0.04045, x / 12.92, jnp.power((x + 0.055) / 1.055, 2.4)
    )


def linear_to_srgb_u8(x):
    """Reinhard + sRGB encode to uint8, the reference's LUT path semantics
    (Color.hpp:84-95) computed exactly instead of via a 4096-entry LUT."""
    return jnp.clip(
        jnp.round(255.0 * linear_to_srgb(reinhard(jnp.maximum(0.0, x)))), 0, 255
    ).astype(jnp.uint8)
