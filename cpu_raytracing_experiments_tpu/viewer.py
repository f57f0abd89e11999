"""Live progressive viewer — lightweight replacement for the reference's
GLFW/Vulkan/ImGui shell (/root/reference/App.cpp, Application.cpp:361-421).

A background thread accumulates samples continuously (the progressive
refinement loop); an HTTP server serves the current median-of-means resolve
as PNG plus a stats endpoint mirroring the reference HUD (spp, ms/frame,
Msamples/s). Scene/camera edits arrive as query parameters and go through
scene/edit.py, preserving the reference's edit -> invalidate -> re-render
semantics (UpdateTracker, Application.cpp:335-358):

  /edit?material=2&albedo=0.8,0.2,0.2&roughness=0.5
  /edit?material=1&emission=50,50,50
  /edit?sphere=0&pos=0,1,0&radius=0.5
  /edit?ambient=1,1,1
  /camera?translate=0,0,-0.5      (local frame, like WASD flight)
  /camera?rotate=0.05,0.1,0       (pitch, yaw, roll radians)
  /camera?focus=128,96            (depth-probe autofocus at pixel x,y)
  /camera?focal=85&fnumber=2.8&exposure=0.5   (lens sliders)
"""
from __future__ import annotations

import io
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np

_PAGE = """<!doctype html>
<html><head><title>tpu pathtracer</title><style>
body { background:#111; color:#ccc; font-family:monospace; text-align:center }
img { image-rendering:pixelated; margin-top:1em; max-width:95vw }
</style></head><body>
<div id="stats">...</div>
<canvas id="plot" width="320" height="48" style="display:block;margin:0.5em auto;background:#181818"></canvas>
<img id="frame" src="/frame.png">
<script>
async function tick() {
  const img = document.getElementById('frame');
  img.src = '/frame.png?' + Date.now();
  const s = await (await fetch('/stats')).json();
  document.getElementById('stats').textContent =
    `${s.width}x${s.height}  ${s.spp} spp  ${s.ms_per_pass.toFixed(1)} ms/pass  ` +
    `${s.msamples_per_s.toFixed(1)} Msamples/s`;
  const c = document.getElementById('plot').getContext('2d');
  const h = s.history_ms, peak = Math.max(...h, 1e-3);
  c.clearRect(0, 0, 320, 48);
  c.strokeStyle = '#6cf'; c.beginPath();
  h.forEach((v, i) => { const x = i * 5, y = 48 - 46 * v / peak;
    i ? c.lineTo(x, y) : c.moveTo(x, y); });
  c.stroke();
}
setInterval(tick, 1000);
</script></body></html>"""


def make_server(scene, policy, width: int, height: int, port: int = 8000):
    """Build the viewer server without blocking.

    Returns (server, renderer, stop_event, worker_thread); the caller runs
    server.serve_forever() (see serve()) or drives it from a test. Pass
    port=0 for an ephemeral port (server.server_address[1] reports it).
    """
    from .render.api import Renderer

    renderer = Renderer(scene, policy, width, height)
    lock = threading.Lock()
    # 64-sample frame-time history, like the reference HUD's CyclicBuffer
    # plot (Application.cpp:391-404)
    stats = {"ms_per_pass": 0.0, "spp": 0, "history": [0.0] * 64}
    stop = threading.Event()

    def worker():
        import jax

        while not stop.is_set():
            t0 = time.perf_counter()
            with lock:
                renderer.accumulate(policy.accumulation_buckets)
                jax.block_until_ready(renderer.state.buckets)
            dt = time.perf_counter() - t0
            stats["ms_per_pass"] = dt * 1e3 / policy.accumulation_buckets
            stats["spp"] = int(renderer.state.accumulations)
            stats["history"] = stats["history"][1:] + [stats["ms_per_pass"]]

    thread = threading.Thread(target=worker, daemon=True)
    thread.start()

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def _send(self, code, ctype, body):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            path = self.path.split("?")[0]
            if path == "/":
                self._send(200, "text/html", _PAGE.encode())
            elif path == "/frame.png":
                from PIL import Image

                with lock:
                    img = renderer.render(tonemap=True)
                buf = io.BytesIO()
                arr = (np.clip(img, 0, 1) * 255).astype(np.uint8)
                Image.fromarray(arr).save(buf, "PNG")
                self._send(200, "image/png", buf.getvalue())
            elif path == "/stats":
                ms = stats["ms_per_pass"]
                body = json.dumps(
                    {
                        "width": width,
                        "height": height,
                        "spp": stats["spp"],
                        "ms_per_pass": ms,
                        "msamples_per_s": (width * height / (ms * 1e-3) / 1e6)
                        if ms > 0
                        else 0.0,
                        "history_ms": [round(v, 2) for v in stats["history"]],
                    }
                ).encode()
                self._send(200, "application/json", body)
            elif path == "/reset":
                with lock:
                    renderer.reset_accumulator()
                self._send(200, "text/plain", b"ok")
            elif path in ("/edit", "/camera"):
                from .scene import edit as edit_mod

                q = {k: v[0] for k, v in parse_qs(urlparse(self.path).query).items()}

                def vec(key):
                    return tuple(float(t) for t in q[key].split(","))

                try:
                    with lock:
                        editor = edit_mod.SceneEditor(renderer)
                        if "material" in q:
                            idx = int(q["material"])
                            fields = {}
                            for f in ("albedo", "emission", "f0", "f80", "transmission"):
                                if f in q:
                                    fields[f] = vec(f)
                            for f in ("roughness", "ior_minus_one"):
                                if f in q:
                                    fields[f] = float(q[f])
                            editor.edit(edit_mod.set_material, idx, **fields)
                        if "sphere" in q:
                            idx = int(q["sphere"])
                            editor.edit(
                                edit_mod.set_sphere, idx,
                                position=vec("pos") if "pos" in q else None,
                                radius=float(q["radius"]) if "radius" in q else None,
                            )
                        if "ambient" in q:
                            editor.edit(edit_mod.set_ambient, vec("ambient"))
                        if "translate" in q:
                            editor.edit(edit_mod.translate_camera_local, vec("translate"))
                        if "rotate" in q:
                            editor.edit(edit_mod.rotate_camera_local, vec("rotate"))
                        if any(k in q for k in ("focal", "fnumber", "exposure")):
                            editor.edit(
                                edit_mod.set_camera_lens, width, height,
                                focal_length=float(q["focal"]) if "focal" in q else None,
                                f_number=float(q["fnumber"]) if "fnumber" in q else None,
                                exposure=float(q["exposure"]) if "exposure" in q else None,
                            )
                        if "focus" in q:
                            from .render import probes

                            fx, fy = (int(t) for t in q["focus"].split(","))
                            renderer.scene = probes.autofocus(
                                renderer.scene, fx, fy, width, height
                            )
                            editor.flags |= edit_mod.SceneUpdate.CAMERA
                        editor.commit()
                    self._send(200, "text/plain", b"ok")
                except Exception as e:  # bad query -> 400 with reason
                    self._send(400, "text/plain", f"error: {e}".encode())
            else:
                self._send(404, "text/plain", b"not found")

    server = ThreadingHTTPServer(("0.0.0.0", port), Handler)
    return server, renderer, stop, thread


def serve(scene, policy, width: int, height: int, port: int = 8000):
    server, _, stop, _ = make_server(scene, policy, width, height, port)
    print(f"live viewer on http://localhost:{port}  (ctrl-c to stop)")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        stop.set()
        server.shutdown()
