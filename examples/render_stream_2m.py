"""Past-VMEM-ceiling showcase: a 2,000,000-triangle displaced UV sphere
rendered through the HBM-streaming traversal (`pallas_stream`).

2M triangles make ~96 MB of Baldwin-Weber cluster tables — past the v5e
VMEM grant, where the VMEM-resident kernel fails to compile
(benchmarks/RESULTS.md, HBM-streaming A/B). pallas_stream='auto' detects
the >48 MB table and switches to the double-buffered per-visit DMA path,
which measured ~1% overhead at VMEM-feasible sizes — this script is the
real-scene demo of the ceiling lift (ROADMAP round-3 item 6), not just the
synthetic-soup A/B.

Clusters use method='morton' (fixed-size chop): the binned-SAH cut is the
throughput default at config-5 scale, but at 2M prims its host-side build
cost dominates a demo render; the morton chop builds in seconds and the
streaming path is schedule-identical either way.

Run on TPU:  python examples/render_stream_2m.py [--spp 32] [--width 1280]
"""
import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--spp", type=int, default=32)
    ap.add_argument("--width", type=int, default=1280)
    ap.add_argument("--height", type=int, default=720)
    ap.add_argument("--uv", type=int, default=1000,
                    help="UV sphere resolution; 2*uv^2 triangles")
    ap.add_argument("--out", default="examples/stream_2m.png")
    args = ap.parse_args()

    import jax

    from cpu_raytracing_experiments_tpu.render.api import Renderer
    from cpu_raytracing_experiments_tpu.scene import accel, builders
    from cpu_raytracing_experiments_tpu.utils.config import RendererPolicy

    print(f"device={jax.devices()[0].device_kind}", flush=True)
    t0 = time.perf_counter()
    scene = builders.mesh_scene(args.width, args.height, uv_res=args.uv)
    ntri = int(scene.triangles.count)
    print(f"scene: {ntri} tris ({time.perf_counter() - t0:.1f} s)",
          flush=True)
    t0 = time.perf_counter()
    sc = accel.with_pallas_clusters(scene, method="morton")
    print(f"clusters built ({time.perf_counter() - t0:.1f} s)", flush=True)

    on_cpu = jax.devices()[0].platform == "cpu"
    pol = RendererPolicy(max_bounces=8, accel="pallas",
                         pallas_interpret=on_cpu)  # CPU = smoke-test mode
    r = Renderer(sc, pol, args.width, args.height)
    t0 = time.perf_counter()
    r.accumulate(1)  # compile + first pass
    jax.block_until_ready(r.state.buckets)
    print(f"first pass + compile {time.perf_counter() - t0:.1f} s",
          flush=True)
    t0 = time.perf_counter()
    if args.spp > 1:
        r.accumulate(args.spp - 1)
        jax.block_until_ready(r.state.buckets)
    dt = time.perf_counter() - t0
    if args.spp > 1:  # with spp<=1 no timed passes ran; a throughput
        # figure from the ~0s interval would be meaningless
        per = dt / (args.spp - 1)
        msam = args.width * args.height / per / 1e6
        print(f"{args.spp - 1} passes in {dt:.1f} s -> "
              f"{per * 1e3:.0f} ms/pass, "
              f"{msam:.2f} Msamples/s at {ntri} tris", flush=True)
    else:
        print(f"no timed passes (--spp {args.spp}); compile+first-pass "
              f"time above is the only timing", flush=True)

    img = r.render(tonemap=True)
    from PIL import Image

    Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8)).save(
        args.out)
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
