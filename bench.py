"""Benchmark driver: renders the hero scene at 1080p and reports Mrays/s.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

The reference publishes no numbers (BASELINE.md), so the baseline is this
framework's own CPU path (same algorithm, JAX on CPU, single core of this
box): 1.32 Mrays/s on the default scene, 512x512, 8 bounces — measured
2026-08-16 with the command at the bottom of this file. "Rays" counts useful
work: closest-hit rays per bounce plus valid NEE shadow rays (the same
accounting a CPU wavefront tracer would do), measured by the in-kernel
counter (render/renderer.py PathState.ray_count), not estimated.
"""
import json
import os
import sys
import time
from functools import partial

# CPU-JAX baseline, Mrays/s (see module docstring).
CPU_BASELINE_MRAYS = 1.32

WIDTH = int(os.environ.get("BENCH_WIDTH", 1920))
HEIGHT = int(os.environ.get("BENCH_HEIGHT", 1088))  # 1080 padded to tile=16
PASSES = int(os.environ.get("BENCH_PASSES", 240))
BOUNCES = int(os.environ.get("BENCH_BOUNCES", 8))
CHUNK = int(os.environ.get("BENCH_CHUNK", 1 << 19))


class _Timeout(Exception):
    pass


def _probe_tpu(seconds=120):
    """Device init + a tiny jit roundtrip, in a SUBPROCESS with a hard
    timeout: the axon tunnel sometimes hangs inside blocking C calls where
    in-process SIGALRM cannot interrupt. Raises on an unhealthy TPU."""
    import subprocess

    code = (
        "import jax, numpy as np;"
        "out = jax.jit(lambda x: x * 2)(np.ones(4, np.float32));"
        "print(float(np.asarray(out)[0]))"
    )
    res = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=seconds,
    )
    if res.returncode != 0 or "2.0" not in res.stdout:
        raise _Timeout(res.stderr[-200:])
    import jax

    return jax.devices()


def main():
    global WIDTH, HEIGHT, PASSES
    import jax

    platform = "tpu"
    devices = None
    # The axon tunnel outages last ~30-70 min; a CPU-fallback number in the
    # round record is worth avoiding, so poll for up to BENCH_TPU_WAIT_S
    # (default 25 min) before giving up.
    deadline = time.time() + float(os.environ.get("BENCH_TPU_WAIT_S", 1500))
    while True:
        try:
            devices = _probe_tpu()
            break
        except Exception as e:  # tunnel down/hung
            if time.time() >= deadline:
                print(f"[bench] TPU unavailable ({type(e).__name__}), CPU fallback",
                      file=sys.stderr)
                break
            print(f"[bench] TPU probe failed ({type(e).__name__}); retrying",
                  file=sys.stderr)
            time.sleep(60)
    if devices is None:
        jax.config.update("jax_platforms", "cpu")
        platform = "cpu-fallback"
        devices = jax.devices()
        # single host core: shrink so the fallback finishes in minutes
        WIDTH, HEIGHT, PASSES = 512, 512, 5

    import jax.numpy as jnp
    from cpu_raytracing_experiments_tpu.render import estimator, renderer
    from cpu_raytracing_experiments_tpu.scene import builders
    from cpu_raytracing_experiments_tpu.utils.config import RendererPolicy

    policy = RendererPolicy(max_bounces=BOUNCES, rays_per_chunk=CHUNK)
    scene = builders.default_scene(WIDTH, HEIGHT)

    # rays per pass from the in-kernel counter (pass 1; representative since
    # the path-length distribution is stationary across accumulations)
    @jax.jit
    def counted(scene):
        return renderer.render_pass(scene, policy, jnp.uint32(1), WIDTH, HEIGHT)

    rad, count = counted(scene)
    jax.block_until_ready(rad)
    rays_per_pass = int(count)

    @partial(jax.jit, donate_argnames=("state",))
    def run(scene, state):
        return estimator.accumulate_n(scene, policy, state, WIDTH, HEIGHT, PASSES)

    state = estimator.RenderState.create(WIDTH, HEIGHT, policy)
    state = run(scene, state)  # warm-up + compile
    jax.block_until_ready(state)

    # best of 3 timed repetitions (the remote-tunnel dispatch adds jitter)
    dt = float("inf")
    for _ in range(3):
        state2 = estimator.RenderState.create(WIDTH, HEIGHT, policy)
        t0 = time.perf_counter()
        state2 = run(scene, state2)
        jax.block_until_ready(state2)
        dt = min(dt, time.perf_counter() - t0)

    mrays = rays_per_pass * PASSES / dt / 1e6
    msamples = WIDTH * HEIGHT * PASSES / dt / 1e6
    result = {
        "metric": "Mrays/s/chip",
        "value": round(mrays, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / CPU_BASELINE_MRAYS, 2),
        "platform": platform,
        "device": str(devices[0]),
        "config": f"default scene {WIDTH}x{HEIGHT}, {PASSES} spp, {BOUNCES} bounces",
        "rays_per_pass": rays_per_pass,
        # Mrays numerator definition + sanity cross-check: useful rays =
        # closest-hit rays per live bounce + valid NEE shadow rays (in-kernel
        # counter, renderer.py PathState.ray_count). Cross-check: rays/sample
        # ~= avg_path_length * (1 + shadow_fraction), must sit in [1, 2*max_bounces].
        "rays_definition": "closest-hit rays per live bounce + valid NEE shadow rays (in-kernel counter)",
        "useful_rays_per_sample": round(rays_per_pass / (WIDTH * HEIGHT), 3),
        "Msamples_per_s": round(msamples, 3),
        ("spp_per_s_1080p" if platform == "tpu" else "spp_per_s"): round(PASSES / dt, 3),
        "wall_s": round(dt, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()

# CPU baseline measurement (single core of the build box):
#   python - <<'PY'
#   import jax; jax.config.update("jax_platforms","cpu")
#   ... render_pass(default_scene 512x512, 8 bounces) x4, timed ...
#   PY
#   -> rays/pass=784999, 0.593 s/pass => 1.32 Mrays/s, 0.442 Msamples/s
