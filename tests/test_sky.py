"""Sky: equirect lookup, procedural models, HDRI wiring."""
import dataclasses

import numpy as np
import jax.numpy as jnp

from cpu_raytracing_experiments_tpu.core.vec import Vec3
from cpu_raytracing_experiments_tpu.render.api import Renderer
from cpu_raytracing_experiments_tpu.scene import builders, sky_models
from cpu_raytracing_experiments_tpu.scene.scene import Sky
from cpu_raytracing_experiments_tpu.utils import image as image_io
from cpu_raytracing_experiments_tpu.utils.config import RendererPolicy


def test_equirect_lookup_directions():
    """Known texels: +Y hits top row, -Y bottom row, axis directions map to
    the expected columns (Primitives.hpp:35-46 mapping)."""
    h, w = 8, 16
    img = np.arange(h * w * 3, dtype=np.float32).reshape(h, w, 3)
    sky = Sky.from_image(img)

    def fetch(d):
        v = Vec3(
            jnp.asarray([d[0]], jnp.float32),
            jnp.asarray([d[1]], jnp.float32),
            jnp.asarray([d[2]], jnp.float32),
        )
        out = sky.sample(v)
        return float(out.x[0])

    # +Y (up) -> asin(1) = pi/2 -> v = 0 (top row)
    top = fetch((0.0, 1.0, 0.0))
    bottom = fetch((0.0, -1.0, 0.0))
    assert top in img[0, :, 0]
    assert bottom in img[h - 1, :, 0]
    # +X: atan2(0, 1) = 0 -> u = 0.5 of width
    px = fetch((1.0, 0.0, 0.0))
    assert px in img[:, (w - 1) // 2 : (w - 1) // 2 + 2, 0]


def test_procedural_sky_properties():
    img = sky_models.clear_sky(128, 64, sun_intensity=100.0)
    assert img.shape == (64, 128, 3)
    assert np.isfinite(img).all() and (img >= 0).all()
    # sun is the brightest spot
    assert img.max() > 10
    # upper hemisphere (sky) brighter than ground on average (excluding sun)
    top_half = np.median(img[: 64 // 2].sum(-1))
    bottom_half = np.median(img[64 // 2 :].sum(-1))
    assert top_half > bottom_half


def test_hdri_sky_render_roundtrip(tmp_path):
    """Write a procedural sky to .hdr, load it back as the scene sky, and
    render: miss rays must pick up the sky's colors."""
    img = sky_models.clear_sky(64, 32, sun_intensity=5.0)
    p = tmp_path / "sky.hdr"
    image_io.write_hdr(p, img)
    loaded = image_io.read_hdr(p)
    scene = builders.white_furnace_scene(32, 32)
    scene = dataclasses.replace(
        scene, sky=Sky.from_image(loaded, ambient=(1.0, 1.0, 1.0))
    )
    pol = RendererPolicy(max_bounces=4, rays_per_chunk=1024)
    out = Renderer(scene, pol, 32, 32).render_spp(5, tonemap=False)
    assert np.isfinite(out).all()
    # blue-ish sky should dominate: b channel > r channel on average
    assert out[..., 2].mean() > out[..., 0].mean()


def test_sky_ambient_tint():
    """ambient multiplies the HDRI fetch (Primitives.hpp:41-45)."""
    img = np.full((4, 8, 3), 2.0, np.float32)
    sky = Sky.from_image(img, ambient=(0.5, 1.0, 0.25))
    from cpu_raytracing_experiments_tpu.core.vec import Vec3

    d = Vec3(jnp.asarray([0.0]), jnp.asarray([0.0]), jnp.asarray([1.0]))
    out = sky.sample(d)
    assert abs(float(out.x[0]) - 1.0) < 1e-6
    assert abs(float(out.y[0]) - 2.0) < 1e-6
    assert abs(float(out.z[0]) - 0.5) < 1e-6


def test_sky_wrap_seam():
    """Directions just either side of the -X seam fetch adjacent columns,
    not opposite ends of the map (no wrap crack)."""
    w, h = 32, 16
    img = np.zeros((h, w, 3), np.float32)
    img[:, :, 0] = np.arange(w)[None, :]  # column index in red
    sky = Sky.from_image(img)
    from cpu_raytracing_experiments_tpu.core.vec import Vec3

    eps = 1e-3
    d1 = Vec3(jnp.asarray([-1.0]), jnp.asarray([0.0]), jnp.asarray([eps]))
    d2 = Vec3(jnp.asarray([-1.0]), jnp.asarray([0.0]), jnp.asarray([-eps]))
    c1 = float(sky.sample(d1).x[0])
    c2 = float(sky.sample(d2).x[0])
    # atan2 jumps from +pi to -pi across the seam: columns at the two ends
    assert {c1, c2} <= {0.0, float(w - 1), float(w - 2), 1.0}
