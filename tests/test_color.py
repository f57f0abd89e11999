"""Color pipeline tests (reference: Color.hpp)."""
import numpy as np
import jax.numpy as jnp

from cpu_raytracing_experiments_tpu.core import color


def test_aces_known_values():
    # black -> ~0 (the fit has a tiny negative numerator offset, clamped)
    r, g, b = color.tonemap_aces(jnp.float32(0.0), jnp.float32(0.0), jnp.float32(0.0))
    assert float(r) == 0.0 and float(g) == 0.0 and float(b) == 0.0
    # huge input -> 1.0 clamp
    r, g, b = color.tonemap_aces(jnp.float32(1e4), jnp.float32(1e4), jnp.float32(1e4))
    assert float(r) == 1.0 and float(g) == 1.0 and float(b) == 1.0
    # grey midpoint monotonicity & range
    xs = jnp.linspace(0.0, 4.0, 64)
    r, _, _ = color.tonemap_aces(xs, xs, xs)
    r = np.asarray(r)
    assert (np.diff(r) >= -1e-6).all()
    assert r.min() >= 0.0 and r.max() <= 1.0


def test_aces_rtt_odt_fit_scalar():
    # scalar formula spot check (Color.hpp:39-41)
    x = 0.5
    want = (x * (x + 0.0245786) - 0.000090537) / (x * (0.983729 * x + 0.4329510) + 0.238081)
    assert abs(float(color.aces_rtt_odt_fit(jnp.float32(x))) - want) < 1e-6


def test_srgb_roundtrip():
    x = jnp.linspace(0.0, 1.0, 256)
    rt = color.srgb_to_linear(color.linear_to_srgb(x))
    np.testing.assert_allclose(np.asarray(rt), np.asarray(x), atol=1e-5)


def test_luminance_weights():
    assert abs(float(color.luminance(1.0, 1.0, 1.0)) - 1.0) < 1e-6
    assert abs(float(color.luminance(1.0, 0.0, 0.0)) - 0.2126) < 1e-7


def test_linear_to_srgb_u8():
    out = color.linear_to_srgb_u8(jnp.asarray([0.0, 1e6], jnp.float32))
    assert out.dtype == jnp.uint8
    assert int(out[0]) == 0
    assert int(out[1]) >= 254  # reinhard(1e6) ~ 1.0
