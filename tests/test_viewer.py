"""HTTP live-viewer endpoint tests (viewer.py replaces the reference's
GLFW/ImGui shell, App.cpp / Application.cpp:361-421)."""
import json
import threading
import time
import urllib.error
import urllib.request

import pytest

from cpu_raytracing_experiments_tpu import viewer
from cpu_raytracing_experiments_tpu.scene import builders
from cpu_raytracing_experiments_tpu.utils.config import RendererPolicy


@pytest.fixture(scope="module")
def live():
    scene = builders.white_furnace_scene(16, 16)
    pol = RendererPolicy(max_bounces=3, rays_per_chunk=1024)
    server, renderer, stop, _ = viewer.make_server(scene, pol, 16, 16, port=0)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{server.server_address[1]}"
    yield base, renderer
    stop.set()
    server.shutdown()


def _get(url):
    try:
        with urllib.request.urlopen(url, timeout=30) as r:
            return r.status, r.read()
    except urllib.error.HTTPError as e:
        return e.code, e.read()


def test_index_and_stats(live):
    base, _ = live
    code, body = _get(base + "/")
    assert code == 200 and b"<html" in body.lower()
    # wait for the background worker to complete at least one pass
    deadline = time.time() + 60
    spp = 0
    while time.time() < deadline:
        code, body = _get(base + "/stats")
        assert code == 200
        s = json.loads(body)
        spp = s["spp"]
        if spp > 0:
            break
        time.sleep(0.2)
    assert spp > 0
    assert s["width"] == 16 and s["height"] == 16
    assert s["ms_per_pass"] > 0 and s["msamples_per_s"] > 0
    assert len(s["history_ms"]) == 64  # reference HUD's 64-slot CyclicBuffer


def test_frame_png(live):
    base, _ = live
    code, body = _get(base + "/frame.png")
    assert code == 200
    assert body[:8] == b"\x89PNG\r\n\x1a\n"


def test_edit_and_camera(live):
    base, renderer = live
    code, body = _get(base + "/edit?material=0&albedo=0.5,0.5,0.5")
    assert (code, body) == (200, b"ok")
    # edit committed: material 0 albedo now 0.5 and accumulator reset
    import numpy as np

    assert np.isclose(float(renderer.scene.materials.albedo.x[0]), 0.5)
    code, body = _get(base + "/camera?translate=0,0,-0.25")
    assert (code, body) == (200, b"ok")
    code, body = _get(base + "/camera?exposure=0.5&fnumber=2.8")
    assert (code, body) == (200, b"ok")
    assert np.isclose(float(renderer.scene.camera.exposure), 0.5)
    assert float(renderer.scene.camera.aperture_radius) > 0
    code, body = _get(base + "/reset")
    assert (code, body) == (200, b"ok")


def test_materials_endpoint(live):
    base, renderer = live
    code, body = _get(base + "/materials")
    assert code == 200
    mats = json.loads(body)
    assert len(mats) == int(renderer.scene.materials.count)
    assert {"albedo", "emission", "roughness"} <= set(mats[0])
    assert all(len(m["albedo"]) == 3 for m in mats)


def test_frame_hdr_export(live):
    base, _ = live
    code, body = _get(base + "/frame.hdr")
    assert code == 200
    assert body.startswith(b"#?")  # Radiance header


def test_focus_probe_endpoint(live):
    base, renderer = live
    code, body = _get(base + "/camera?focus=8,8")
    assert (code, body) == (200, b"ok")
    # white furnace: center pixel hits the unit sphere -> finite focus
    import numpy as np

    assert np.isfinite(float(renderer.scene.camera.focus_distance))


def test_interactive_page_controls(live):
    """The served page carries the fly-cam / focus / slider wiring."""
    base, _ = live
    _, body = _get(base + "/")
    page = body.decode()
    for needle in ("KeyW", "contextmenu", "rotate=", "translate=",
                   "/materials", "roughness", "frame.hdr"):
        assert needle in page, needle


def test_bad_requests(live):
    base, _ = live
    code, body = _get(base + "/edit?material=0&albedo=not,a,vec")
    assert code == 400 and body.startswith(b"error:")
    code, _ = _get(base + "/nonexistent")
    assert code == 404


def test_delta_streaming(live):
    """Dirty-tile protocol: first request (gen mismatch) returns a full
    frame; a gen-matched request on the converged white furnace returns no
    tiles (every pixel is byte-stable); a stale gen forces a full refresh."""
    base, _ = live
    # wait until the worker has at least one pass in (frame non-black)
    deadline = time.time() + 60
    while time.time() < deadline:
        if json.loads(_get(base + "/stats")[1])["spp"] > 0:
            break
        time.sleep(0.2)
    code, body = _get(base + "/delta?gen=-1")
    assert code == 200
    d = json.loads(body)
    assert d["full"] is True and len(d["png_b64"]) > 0
    gen = d["gen"]

    # matched gen -> partial update (tile list may be empty or not: earlier
    # tests in this module edited the scene, so pixels can still be moving)
    code, body = _get(base + f"/delta?gen={gen}")
    d2 = json.loads(body)
    assert code == 200 and d2["gen"] == gen + 1 and d2["full"] is False
    if d2["tiles"]:
        assert d2["tile"] == 32
        assert all(x % 32 == 0 and y % 32 == 0 for x, y in d2["tiles"])

    # stale generation -> full frame again
    code, body = _get(base + "/delta?gen=0")
    d3 = json.loads(body)
    assert d3["full"] is True

    # unit check of the diff core: a one-pixel change ships exactly one tile
    import numpy as np
    from cpu_raytracing_experiments_tpu.viewer import _frame_delta

    st = {}
    a = np.zeros((48, 80, 3), np.uint8)
    full = _frame_delta(st, a, client_gen=-1)
    assert full["full"] is True
    b = a.copy()
    b[40, 70] = 255  # tile (y=32..47, x=64..79) — a padded edge tile
    part = _frame_delta(st, b, client_gen=full["gen"])
    assert part["full"] is False and part["tiles"] == [[64, 32]]
    assert part["tile"] == 32
    # the shipped tile is folded into the reference: next delta is empty
    again = _frame_delta(st, b, client_gen=part["gen"])
    assert again["tiles"] == []
