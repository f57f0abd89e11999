"""AOV-guided a-trous wavelet denoiser (SVGF-lite).

No reference equivalent (the reference's only noise control is the
median-of-means estimator); this is the production-renderer companion
feature built on the first-bounce AOVs (render/probes.py): albedo is
demodulated out, irradiance is filtered with an edge-stopping a-trous
wavelet (normal / depth / luminance weights, dilated 5x5 B3-spline taps),
then albedo is re-modulated. Pure jnp — the whole filter is a handful of
padded gathers + elementwise math, entirely fusable by XLA.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# 5-tap B3-spline kernel (outer product applied separably via offsets)
_B3 = np.asarray([1 / 16, 1 / 4, 3 / 8, 1 / 4, 1 / 16], np.float32)


def _gather(img, dy, dx):
    """[H, W, ...] sample at (y+dy, x+dx) with edge clamp."""
    h, w = img.shape[:2]
    ys = jnp.clip(jnp.arange(h) + dy, 0, h - 1)
    xs = jnp.clip(jnp.arange(w) + dx, 0, w - 1)
    return img[ys][:, xs]


@partial(jax.jit, static_argnames=("iterations",))
def atrous_denoise(
    radiance: jnp.ndarray,  # [H, W, 3] linear
    albedo: jnp.ndarray,  # [H, W, 3]
    normal: jnp.ndarray,  # [H, W, 3]
    depth: jnp.ndarray,  # [H, W] (inf = miss)
    iterations: int = 4,
    sigma_n: float = 0.2,
    sigma_z: float = 0.5,
    sigma_l: float = 4.0,
    variance: jnp.ndarray = None,  # [H, W] per-pixel variance of the mean
) -> jnp.ndarray:
    """Edge-aware smoothing of the demodulated irradiance. With `variance`
    (free from the median-of-means bucket spread — utils/metrics.py
    pixel_variance_map) the luminance edge-stop becomes SVGF-style
    variance-guided: noisy pixels smooth aggressively while converged
    pixels keep their detail; without it the fixed sigma_l applies."""
    safe_albedo = jnp.maximum(albedo, 1e-3)
    hit = jnp.isfinite(depth)
    irradiance = jnp.where(albedo.max(-1, keepdims=True) > 1e-3,
                           radiance / safe_albedo, radiance)
    z = jnp.where(hit, depth, 0.0)
    zrange = jnp.maximum(z.max() - z.min(), 1e-3)
    zn = z / zrange

    def luminance(c):
        return c[..., 0] * 0.2126 + c[..., 1] * 0.7152 + c[..., 2] * 0.0722

    sdev = None
    if variance is not None:
        # 3x3-smoothed std-dev guide (SVGF filters its variance estimate);
        # demodulate like the color so the scales match
        v = variance / jnp.maximum(luminance(safe_albedo) ** 2, 1e-6)
        v = sum(
            _gather(v, dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)
        ) / 9.0
        sdev = jnp.sqrt(jnp.maximum(v, 0.0))

    out = irradiance
    for it in range(iterations):
        stride = 1 << it
        acc = jnp.zeros_like(out)
        wsum = jnp.zeros(out.shape[:2] + (1,))
        lum_c = luminance(out)
        # each a-trous pass roughly halves the residual noise; shrink the
        # variance guide with it so later passes stop over-smoothing
        l_denom = (
            sigma_l * sdev * (0.5 ** it) + 1e-3
            if sdev is not None
            else jnp.float32(sigma_l)
        )
        for oy in range(-2, 3):
            for ox in range(-2, 3):
                k = _B3[oy + 2] * _B3[ox + 2]
                dy, dx = oy * stride, ox * stride
                n_s = _gather(normal, dy, dx)
                z_s = _gather(zn, dy, dx)
                c_s = _gather(out, dy, dx)
                hit_s = _gather(hit, dy, dx)
                w_n = jnp.exp(
                    -jnp.maximum(0.0, 1.0 - (n_s * normal).sum(-1)) / sigma_n
                )
                w_z = jnp.exp(-jnp.abs(z_s - zn) / (sigma_z * stride / 64.0 + 1e-4))
                w_l = jnp.exp(-jnp.abs(luminance(c_s) - lum_c) / l_denom)
                # don't mix hit and miss pixels
                w = k * w_n * w_z * w_l * (hit_s == hit)
                acc = acc + c_s * w[..., None]
                wsum = wsum + w[..., None]
        out = acc / jnp.maximum(wsum, 1e-8)
    return out * safe_albedo


def denoise_render(renderer, iterations: int = 4,
                   variance_guided: bool = False,
                   sigma_l: float = 4.0) -> np.ndarray:
    """Denoise the current accumulator state of a render.api.Renderer.
    Returns a tonemapped [H, W, 3] image (row 0 = top).

    variance_guided=True scales the luminance edge-stop by the
    accumulator's free per-pixel std-dev (Renderer.variance_map) —
    SVGF-style. Measured at 10 spp vs 400-spp ground truth (64x64 MSE):
    the optimum is scene-dependent — hero (AOV-explained detail) wants a
    WEAK stop (no stop 0.00667 < guided@25 0.00703 < fixed@4 0.00726),
    cornell (shadow/glow gradients the AOVs can't see) wants a STRONG one
    (fixed@4 0.00351 < guided@25 0.00395 << no stop 0.0191). The default
    stays the conservative fixed sigma_l=4; guidance (with sigma_l~25) is
    the more robust single-knob choice across scene types."""
    from ..core import color
    from . import probes

    hdr = renderer.render(tonemap=False)  # [H, W, 3], already flipped
    aovs = probes.render_aovs(
        renderer.scene, renderer.policy, renderer.width, renderer.height,
        samples=4,  # averaged guides: smoother on AA/DoF edges
    )
    variance = None
    if variance_guided and int(renderer.state.accumulations) >= 2:
        variance = jnp.asarray(renderer.variance_map())  # same flip as hdr
    out = atrous_denoise(
        jnp.asarray(hdr),
        jnp.asarray(aovs["albedo"]),
        jnp.asarray(aovs["normal"]),
        jnp.asarray(aovs["depth"]),
        iterations=iterations,
        sigma_l=sigma_l,
        variance=variance,
    )
    r, g, b = color.tonemap_aces(out[..., 0], out[..., 1], out[..., 2])
    return np.asarray(jnp.stack([r, g, b], -1))
