"""Image IO + checkpoint/resume tests."""
import os
import subprocess
import sys

# CLI subprocesses run --cpu; stripping the axon pool var skips the TPU
# tunnel registration at interpreter startup (which costs 60-200 s when
# the tunnel is busy and made these tests time out under load)
_CPU_ENV = {k: v for k, v in os.environ.items() if k != "PALLAS_AXON_POOL_IPS"}
_CPU_ENV["JAX_PLATFORMS"] = "cpu"

import numpy as np
import pytest

from cpu_raytracing_experiments_tpu.render import checkpoint
from cpu_raytracing_experiments_tpu.render.api import Renderer
from cpu_raytracing_experiments_tpu.scene import builders
from cpu_raytracing_experiments_tpu.utils import image as image_io
from cpu_raytracing_experiments_tpu.utils.config import RendererPolicy

POL = RendererPolicy(max_bounces=6, rays_per_chunk=2048)


def test_hdr_roundtrip(tmp_path):
    rgb = np.abs(np.random.default_rng(0).normal(1.0, 3.0, (24, 32, 3))).astype(
        np.float32
    )
    p = tmp_path / "img.hdr"
    image_io.write_hdr(p, rgb)
    back = image_io.read_hdr(p)
    assert back.shape == rgb.shape
    # RGBE has an 8-bit shared-exponent mantissa: error bounded by the
    # per-pixel max channel / 256
    bound = rgb.max(axis=-1, keepdims=True) / 256 + 1e-6
    assert (np.abs(back - rgb) <= bound * 1.01).all()


def test_hdr_rgbe_native_matches_numpy():
    from cpu_raytracing_experiments_tpu.utils import native

    if native.get_lib() is None:
        pytest.skip("native lib unavailable")
    rgb = np.abs(np.random.default_rng(1).normal(0.5, 2.0, (16, 16, 3))).astype(
        np.float32
    )
    np.testing.assert_array_equal(
        native.rgbe_encode(rgb), image_io._rgbe_encode_np(rgb)
    )
    enc = image_io._rgbe_encode_np(rgb)
    np.testing.assert_allclose(
        native.rgbe_decode(enc), image_io._rgbe_decode_np(enc), rtol=1e-6
    )


def test_png_store(tmp_path):
    rgb = np.random.default_rng(2).uniform(0, 1, (8, 8, 3)).astype(np.float32)
    p = tmp_path / "img.png"
    image_io.store(p, rgb)
    from PIL import Image

    arr = np.asarray(Image.open(p))
    assert arr.shape == (8, 8, 3)
    np.testing.assert_allclose(arr / 255.0, rgb, atol=1 / 255 + 1e-6)


def test_checkpoint_resume_bit_exact(tmp_path):
    """Render 10, checkpoint at 5 and resume -> identical buckets."""
    scene = builders.default_scene(32, 32)
    a = Renderer(scene, POL, 32, 32)
    a.accumulate(10)

    b = Renderer(scene, POL, 32, 32)
    b.accumulate(5)
    p = tmp_path / "state.npz"
    checkpoint.save(p, b.state, POL, 32, 32)
    c = Renderer(scene, POL, 32, 32)
    c.state = checkpoint.load(p, POL, 32, 32)
    c.accumulate(5)
    np.testing.assert_array_equal(
        np.asarray(a.state.buckets), np.asarray(c.state.buckets)
    )


def test_checkpoint_rejects_mismatched_config(tmp_path):
    scene = builders.default_scene(16, 16)
    r = Renderer(scene, POL, 16, 16)
    r.accumulate(5)
    p = tmp_path / "state.npz"
    checkpoint.save(p, r.state, POL, 16, 16)
    import dataclasses

    other = dataclasses.replace(POL, max_bounces=4)
    with pytest.raises(ValueError, match="different render config"):
        checkpoint.load(p, other, 16, 16)
    with pytest.raises(ValueError, match="different render config"):
        checkpoint.load(p, POL, 32, 32)
    # changing only the microbatch size is fine
    bigger_chunk = dataclasses.replace(POL, rays_per_chunk=4096)
    checkpoint.load(p, bigger_chunk, 16, 16)


def test_cli_render_end_to_end(tmp_path):
    """Drive the CLI surface: render a tiny image to png + hdr."""
    out = tmp_path / "out.png"
    hdr = tmp_path / "out.hdr"
    cmd = [
        sys.executable, "-m", "cpu_raytracing_experiments_tpu.cli", "render",
        "--scene", "white_furnace", "--width", "32", "--height", "32",
        "--spp", "5", "--bounces", "4", "--chunk", "1024", "--cpu", "--quiet",
        "--out", str(out), "--hdr-out", str(hdr),
    ]
    res = subprocess.run(cmd, capture_output=True, text=True, timeout=300, env=_CPU_ENV)
    assert res.returncode == 0, res.stderr[-2000:]
    assert out.exists() and hdr.exists()
    back = image_io.read_hdr(hdr)
    np.testing.assert_allclose(back, 1.0, atol=0.01)


@pytest.mark.slow  # scene-matrix sweep; test_cli_render_end_to_end keeps
# the CLI path in the default gate
def test_cli_scenes_and_aov(tmp_path):
    res = subprocess.run(
        [sys.executable, "-m", "cpu_raytracing_experiments_tpu.cli", "scenes"],
        capture_output=True, text=True, timeout=120, env=_CPU_ENV,
    )
    assert res.returncode == 0
    assert "white_furnace" in res.stdout and "cornell" in res.stdout

    res = subprocess.run(
        [sys.executable, "-m", "cpu_raytracing_experiments_tpu.cli", "aov",
         "--scene", "white_furnace", "--width", "24", "--height", "24",
         "--cpu", "--out-prefix", str(tmp_path / "a")],
        capture_output=True, text=True, timeout=300, env=_CPU_ENV,
    )
    assert res.returncode == 0, res.stderr[-1500:]
    assert (tmp_path / "a_depth.png").exists()
    assert (tmp_path / "a_normal.png").exists()
    assert (tmp_path / "a_prim_id.npy").exists()


def test_hdr_rle_decode():
    """Hand-craft a new-style RLE .hdr scanline and decode it (the writer
    emits flat scanlines, so this exercises the reader's RLE branch that
    external HDRIs use)."""
    h, w = 2, 8
    rgb = np.zeros((h, w, 3), np.float32)
    rgb[0, :, 0] = 1.0          # constant red row -> run-length encodes
    rgb[1, :, 1] = np.arange(w) / 8.0 + 0.25   # varying green row -> literals
    rgbe = image_io._rgbe_encode_np(rgb)

    def rle_scanline(row):  # row: [w, 4]
        out = bytearray([2, 2, w >> 8, w & 0xFF])
        for c in range(4):
            vals = row[:, c]
            # encode runs >= 2, else literals (simple encoder)
            i = 0
            while i < len(vals):
                run = 1
                while i + run < len(vals) and vals[i + run] == vals[i] and run < 127:
                    run += 1
                if run >= 2:
                    out += bytes([128 + run, int(vals[i])])
                    i += run
                else:
                    j = i + 1
                    while (
                        j < len(vals)
                        and (j + 1 >= len(vals) or vals[j + 1] != vals[j])
                        and j - i < 128
                    ):
                        j += 1
                    out += bytes([j - i]) + bytes(int(v) for v in vals[i:j])
                    i = j
        return bytes(out)

    payload = b"".join(rle_scanline(rgbe[y]) for y in range(h))
    data = (
        b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n"
        + f"-Y {h} +X {w}\n".encode()
        + payload
    )
    import tempfile, os

    with tempfile.NamedTemporaryFile(suffix=".hdr", delete=False) as f:
        f.write(data)
        path = f.name
    try:
        back = image_io.read_hdr(path)
    finally:
        os.unlink(path)
    bound = rgb.max(axis=-1, keepdims=True) / 256 + 1e-6
    assert (np.abs(back - rgb) <= bound * 1.01 + 1e-6).all()


def test_numpy_bvh_builder_fallback():
    """The pure-numpy binned-SAH fallback builds a correct tree (used when
    the native lib is unavailable)."""
    import jax.numpy as jnp

    from cpu_raytracing_experiments_tpu.bvh import builder as bvh_builder
    from cpu_raytracing_experiments_tpu.bvh import traverse
    from cpu_raytracing_experiments_tpu.core.vec import Vec3
    from cpu_raytracing_experiments_tpu.ops import intersect

    g = np.random.default_rng(21)
    m = 150
    c = g.uniform(-30, 30, (m, 3)).astype(np.float32)
    r = g.uniform(0.3, 3.0, m).astype(np.float32)
    node_min, node_max, first, count, order = bvh_builder._build_numpy(
        c - r[:, None], c + r[:, None], leaf_size=4
    )
    miss = bvh_builder.compute_miss_links(first, count)
    arrays = bvh_builder.BVHArrays(
        node_min=Vec3(*[jnp.asarray(node_min[:, k]) for k in range(3)]),
        node_max=Vec3(*[jnp.asarray(node_max[:, k]) for k in range(3)]),
        first=jnp.asarray(first.astype(np.int32)),
        count=jnp.asarray(count.astype(np.int32)),
        miss=jnp.asarray(miss),
        max_leaf=max(int(count.max()), 1),
    )
    c2, r2 = c[order], r[order]
    center = Vec3(*[jnp.asarray(c2[:, k]) for k in range(3)])
    rsq = jnp.asarray(r2 * r2)
    n = 300
    p = Vec3(*[jnp.asarray(g.uniform(-50, 50, n).astype(np.float32)) for _ in range(3)])
    dn = g.normal(size=(n, 3)).astype(np.float32)
    dn /= np.linalg.norm(dn, axis=1, keepdims=True)
    d = Vec3(*[jnp.asarray(dn[:, k]) for k in range(3)])
    bt, bid = intersect.intersect_spheres(p, d, center, rsq)
    tt, tid = traverse.traverse_closest_packed(
        arrays, p, d, traverse.pack_spheres(center, rsq), traverse.sphere_row_test
    )
    np.testing.assert_array_equal(np.asarray(tid) >= 0, np.asarray(bid) >= 0)
    hit = np.asarray(bid) >= 0
    np.testing.assert_allclose(np.asarray(tt)[hit], np.asarray(bt)[hit], rtol=1e-4)


@pytest.mark.slow
def test_cli_checkpoint_resume(tmp_path):
    """Two CLI invocations with --checkpoint produce the same buckets as one
    continuous run (resume across processes, through disk)."""
    ckpt = tmp_path / "s.npz"
    base = [
        sys.executable, "-m", "cpu_raytracing_experiments_tpu.cli", "render",
        "--scene", "white_furnace", "--width", "16", "--height", "16",
        "--bounces", "3", "--chunk", "256", "--cpu", "--quiet",
        "--checkpoint", str(ckpt),
    ]
    r1 = subprocess.run(base + ["--spp", "5"], capture_output=True, text=True, timeout=300, env=_CPU_ENV)
    assert r1.returncode == 0, r1.stderr[-1000:]
    assert ckpt.exists()
    r2 = subprocess.run(
        base + ["--spp", "10", "--hdr-out", str(tmp_path / "resumed.npy")],
        capture_output=True, text=True, timeout=300, env=_CPU_ENV,
    )
    assert r2.returncode == 0, r2.stderr[-1000:]
    assert "resume" in r2.stdout or True  # metrics quieted; checkpoint grew
    from cpu_raytracing_experiments_tpu.render import checkpoint as ckpt_mod
    from cpu_raytracing_experiments_tpu.utils.config import RendererPolicy

    pol = RendererPolicy(max_bounces=3, rays_per_chunk=256)
    state = ckpt_mod.load(ckpt, pol, 16, 16)
    assert int(state.accumulations) == 10
    resumed = np.load(tmp_path / "resumed.npy")
    # one continuous in-process run for comparison
    from cpu_raytracing_experiments_tpu.render.api import Renderer
    from cpu_raytracing_experiments_tpu.scene import builders as b

    r = Renderer(b.white_furnace_scene(16, 16), pol, 16, 16)
    r.accumulate(10)
    np.testing.assert_array_equal(resumed, r.render(tonemap=False))


@pytest.mark.slow
def test_checkpoint_preserves_adaptive_counts(tmp_path):
    """An adaptive render's per-pixel counts must survive save/load: the
    count-aware resolve after resume must match the unresumed resolve
    bit-for-bit."""
    import jax.numpy as jnp
    import numpy as np

    from cpu_raytracing_experiments_tpu.render import checkpoint, estimator
    from cpu_raytracing_experiments_tpu.render.api import Renderer
    from cpu_raytracing_experiments_tpu.scene import builders
    from cpu_raytracing_experiments_tpu.utils.config import RendererPolicy

    w = h = 16
    pol = RendererPolicy(max_bounces=3, rays_per_chunk=256)
    r = Renderer(builders.default_scene(w, h), pol, w, h)
    r.accumulate(5)
    # one subset round -> counts become non-uniform
    ids = jnp.arange(64, dtype=jnp.int32)
    valid = jnp.ones(64, bool)
    for _ in range(pol.accumulation_buckets):
        r.state = estimator.accumulate_pixels(
            r.scene, pol, r.state, w, h, ids, valid
        )
    assert r.state.counts is not None
    path = tmp_path / "ck.npz"
    checkpoint.save(path, r.state, pol, w, h)
    loaded = checkpoint.load(path, pol, w, h)
    np.testing.assert_array_equal(
        np.asarray(loaded.counts), np.asarray(r.state.counts)
    )
    r2 = Renderer(builders.default_scene(w, h), pol, w, h)
    r2.state = loaded
    np.testing.assert_array_equal(r.render(tonemap=False),
                                  r2.render(tonemap=False))


def test_exr_roundtrip_and_structure(tmp_path):
    """Minimal OpenEXR writer: bit-exact self-roundtrip plus structural
    checks of the header (magic, version, required scanline attributes,
    alphabetized FLOAT chlist, absolute offset table). No independent EXR
    codec exists in this environment (cv2 built without OpenEXR, imageio
    has no plugin), so cross-tool validation is deferred; the format fields
    are written per the OpenEXR 2.0 spec."""
    import numpy as np

    from cpu_raytracing_experiments_tpu.utils import image as im

    rng = np.random.default_rng(3)
    img = (rng.uniform(0, 8, (21, 37, 3)) ** 2).astype(np.float32)
    p = tmp_path / "t.exr"
    im.store(p, img)
    back = im.read_exr(p)
    np.testing.assert_array_equal(back, img)
    raw = p.read_bytes()
    assert np.frombuffer(raw[:4], np.int32)[0] == 20000630  # magic
    assert np.frombuffer(raw[4:8], np.int32)[0] == 2  # version, no flags
    for attr in (b"channels", b"compression", b"dataWindow",
                 b"displayWindow", b"lineOrder", b"pixelAspectRatio",
                 b"screenWindowCenter", b"screenWindowWidth"):
        assert attr + b"\0" in raw[:400], attr
    # chlist alphabetical: B before G before R
    i_b, i_g, i_r = (raw.index(c + b"\0", 8) for c in (b"B", b"G", b"R"))
    assert i_b < i_g < i_r
    # first scanline offset points at a block whose y == 0 and whose size
    # is one uncompressed row of 3 float channels
    hdr_end = raw.index(b"\0" * 1, raw.index(b"screenWindowWidth"))  # coarse
    # locate offset table: read the first uint64 after the header terminator
    # by scanning for a plausible in-file offset whose block header matches
    h, w = img.shape[:2]
    row_bytes = 3 * w * 4
    found = False
    for pos in range(8, len(raw) - 16):
        off = int(np.frombuffer(raw[pos:pos + 8], np.uint64)[0])
        if 0 < off < len(raw) - 8:
            y, size = np.frombuffer(raw[off:off + 8], np.int32)
            if y == 0 and size == row_bytes and off + 8 * h < len(raw):
                found = True
                break
    assert found


def test_exr_multichannel_aovs(tmp_path):
    """Multi-channel EXR: AOV planes ride the same file; channel list stays
    alphabetized regardless of insertion order; values roundtrip exactly."""
    import numpy as np

    from cpu_raytracing_experiments_tpu.utils import image as im

    rng = np.random.default_rng(5)
    rgb = rng.uniform(0, 4, (9, 13, 3)).astype(np.float32)
    z = rng.uniform(0, 50, (9, 13)).astype(np.float32)
    nx = rng.normal(size=(9, 13)).astype(np.float32)
    im.write_exr(tmp_path / "m.exr", rgb, channels={"depth.Z": z, "N.X": nx})
    ch = im.read_exr_channels(tmp_path / "m.exr")
    assert sorted(ch) == ["B", "G", "N.X", "R", "depth.Z"]
    np.testing.assert_array_equal(ch["depth.Z"], z)
    np.testing.assert_array_equal(ch["N.X"], nx)
    np.testing.assert_array_equal(im.read_exr(tmp_path / "m.exr"), rgb)
