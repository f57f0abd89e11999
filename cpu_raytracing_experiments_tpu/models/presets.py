"""Named render models — curated policy configurations.

The renderer's "model families": each preset is a complete, tested
configuration of the integrator for a deployment profile, the analog of the
reference's compile-time configuration axis (RendererPolicy NTTPs +
preprocessor switches, Renderer.hpp:19-30, 70-71) packaged as data.

    from cpu_raytracing_experiments_tpu.models import presets
    policy = presets.PRODUCTION
    policy = presets.get("reference_compat")
"""
from __future__ import annotations

import dataclasses

from ..utils.config import RendererPolicy

# Bit-parity with the reference's shipped configuration: lambertian BRDF,
# MIS on, brute-force intersection (USEBVH false), uniform light selection,
# plain camera jitter, median-of-means; includes the reference's sky bug.
REFERENCE_COMPAT = RendererPolicy(
    brdf="lambertian",
    mis=True,
    accel="brute",
    light_sampling="uniform",
    sky_bug_compat=True,
    shade_f80=False,  # the reference never reads Material::F80
)

# Reference semantics with its bugs fixed (the default stance of this
# framework): identical sampling decisions, correct sky contribution.
REFERENCE_FIXED = RendererPolicy()

# Fast interactive preview: shallow paths, multi-spp passes to keep the
# chip fed at viewport sizes; pair with render.denoise for display.
PREVIEW = RendererPolicy(
    max_bounces=4,
    samples_per_pixel=4,
    stratify_camera=True,
)

# Production stills: full material model, deep paths, power-proportional
# light selection, stratified primary sampling, firefly clamp as a backstop
# on top of median-of-means.
PRODUCTION = RendererPolicy(
    brdf="principled",
    max_bounces=12,
    light_sampling="power",
    stratify_camera=True,
    clamp_radiance=True,
    max_radiance=1e3,
)

# Physically-strict: no clamp, no RR bias tweaks — for furnace tests and
# ground-truth renders.
GROUND_TRUTH = RendererPolicy(
    brdf="principled",
    max_bounces=32,
    light_sampling="power",
)

# Large scenes (many primitives): identical integrator, execution knobs
# sized for big batteries.
LARGE_SCENE = RendererPolicy(
    max_bounces=6,
    rays_per_chunk=1 << 16,
)

# Throughput-first mesh rendering: clustered Pallas traversal with spp=2
# passes (two samples of one pixel in adjacent kernel-tile lanes halve the
# per-tile screen footprint -> fewer cluster visits; +9% samples/s measured
# on the 20k mesh, benchmarks/RESULTS.md). Each accumulation bucket entry
# is a 2-sample mean, so median-of-means sees B means of 2 — slightly
# softer firefly rejection than spp=1 at equal samples; use for wall-clock-
# bound renders. Scenes need scene.accel.with_pallas_clusters.
THROUGHPUT = RendererPolicy(
    accel="pallas",
    samples_per_pixel=2,
    stratify_camera=True,
)

PRESETS = {
    "reference_compat": REFERENCE_COMPAT,
    "reference_fixed": REFERENCE_FIXED,
    "preview": PREVIEW,
    "production": PRODUCTION,
    "ground_truth": GROUND_TRUTH,
    "large_scene": LARGE_SCENE,
    "throughput": THROUGHPUT,
}


def get(name: str, **overrides) -> RendererPolicy:
    """Look up a preset, optionally overriding fields."""
    policy = PRESETS[name]
    return dataclasses.replace(policy, **overrides) if overrides else policy
