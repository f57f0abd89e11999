"""Profiling hooks.

The reference profiles with IACA marks + offline sampling, leaving stage
percentages as comments (/root/reference/iacaMarks.h, Renderer.hpp stage
comments; SURVEY.md §5). Here:
  * `trace()` wraps a region in a jax.profiler trace -> Perfetto/
    TensorBoard-readable dump (the megakernel stages carry
    jax.named_scope annotations that show up inside it),
  * `stage_shares()` reproduces the reference's stage-percentage table by
    timing each pipeline stage in isolation (compiled separately).
"""
from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def trace(logdir: str = "/tmp/jax-trace"):
    """jax.profiler trace context; view with TensorBoard or Perfetto."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def stage_shares(scene, policy, width: int, height: int, repeats: int = 10):
    """Approximate per-stage cost shares (the reference's in-source
    percentages, Renderer.hpp:111-442) by timing ablated pipelines:
    full - (pipeline without stage) ~ stage cost. Returns {stage: seconds}."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from ..render import renderer as _r

    def timed(pol):
        f = jax.jit(
            lambda s: _r.render_pass(s, pol, jnp.uint32(1), width, height)[0]
        )
        out = f(scene)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(repeats):
            out = f(scene)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / repeats

    full = timed(policy)
    no_mis = timed(dataclasses.replace(policy, mis=False))
    no_rr = timed(dataclasses.replace(policy, russian_roulette=False))
    one_bounce = timed(dataclasses.replace(policy, max_bounces=1))
    return {
        "full_s": full,
        "nee_shadow_s": max(full - no_mis, 0.0),
        "russian_roulette_s": max(full - no_rr, 0.0),
        "first_bounce_s": one_bounce,
        "later_bounces_s": max(full - one_bounce, 0.0),
    }
