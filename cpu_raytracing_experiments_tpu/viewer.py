"""Live progressive viewer — lightweight replacement for the reference's
GLFW/Vulkan/ImGui shell (/root/reference/App.cpp, Application.cpp:361-421).

A background thread accumulates samples continuously (the progressive
refinement loop); an HTTP server serves the current median-of-means resolve
as PNG plus a stats endpoint mirroring the reference HUD (spp, ms/frame,
Msamples/s). Camera/scene edits arrive as query parameters and reset the
accumulator, preserving the reference's edit -> invalidate -> re-render
semantics (UpdateTracker, Application.cpp:335-358).
"""
from __future__ import annotations

import io
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

_PAGE = """<!doctype html>
<html><head><title>tpu pathtracer</title><style>
body { background:#111; color:#ccc; font-family:monospace; text-align:center }
img { image-rendering:pixelated; margin-top:1em; max-width:95vw }
</style></head><body>
<div id="stats">...</div>
<img id="frame" src="/frame.png">
<script>
async function tick() {
  const img = document.getElementById('frame');
  img.src = '/frame.png?' + Date.now();
  const s = await (await fetch('/stats')).json();
  document.getElementById('stats').textContent =
    `${s.width}x${s.height}  ${s.spp} spp  ${s.ms_per_pass.toFixed(1)} ms/pass  ` +
    `${s.msamples_per_s.toFixed(1)} Msamples/s`;
}
setInterval(tick, 1000);
</script></body></html>"""


def serve(scene, policy, width: int, height: int, port: int = 8000):
    from .render.api import Renderer

    renderer = Renderer(scene, policy, width, height)
    lock = threading.Lock()
    stats = {"ms_per_pass": 0.0, "spp": 0}
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
                    }
                ).encode()
                self._send(200, "application/json", body)
            elif path == "/reset":
                with lock:
                    renderer.reset_accumulator()
                self._send(200, "text/plain", b"ok")
            else:
                self._send(404, "text/plain", b"not found")

    server = ThreadingHTTPServer(("0.0.0.0", port), Handler)
    print(f"live viewer on http://localhost:{port}  (ctrl-c to stop)")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        stop.set()
        server.shutdown()
