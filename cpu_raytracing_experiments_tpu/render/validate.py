"""Numerical sanitizers — the SURVEY.md §5 'race detection / sanitizer'
slot.

The reference has no sanitizers at all (safety is by construction; it
NaN-checks only the UI color picker, Application.cpp:452-455). Here safety
by construction comes from pure-functional JAX, and this module adds the
debug-mode numerical guard: a checkify-instrumented render pass that
asserts radiance/throughput stay finite and non-negative at every bounce,
reporting the first violation with its pixel index. Run it on a new scene /
policy combination before a long production render.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import checkify

from ..scene.scene import Scene
from ..utils.config import RendererPolicy
from . import renderer as _renderer


def check_render(
    scene: Scene,
    policy: RendererPolicy,
    width: int,
    height: int,
    accumulation: int = 1,
):
    """Run one instrumented pass; raises checkify errors on NaN/inf or
    negative radiance. Returns the per-pixel radiance on success."""

    def checked(scene):
        rad, _ = _renderer.render_pass(
            scene, policy, jnp.uint32(accumulation), width, height
        )
        for name, channel in (("r", rad.x), ("g", rad.y), ("b", rad.z)):
            checkify.check(
                jnp.all(jnp.isfinite(channel)),
                "non-finite radiance in channel " + name + " (first bad pixel {i})",
                i=jnp.argmax(~jnp.isfinite(channel)),
            )
            checkify.check(
                jnp.all(channel >= 0.0),
                "negative radiance in channel " + name + " (first bad pixel {i})",
                i=jnp.argmax(channel < 0.0),
            )
        return rad

    checked_fn = checkify.checkify(jax.jit(checked))
    err, rad = checked_fn(scene)
    err.throw()
    return rad


def validate_scene(scene: Scene) -> list:
    """Host-side pre-launch scene validation (the reference aborts at
    runtime instead: missing HDRI terminates, Application.cpp:226-229).
    Returns a list of problem strings (empty = OK)."""
    import numpy as np

    problems = []
    r_sq = np.asarray(scene.spheres.radius_sq)
    if (r_sq <= 0).any():
        problems.append(f"{int((r_sq <= 0).sum())} spheres with non-positive radius")
    for field in ("x", "y", "z"):
        if not np.isfinite(np.asarray(getattr(scene.spheres.center, field))).all():
            problems.append(f"non-finite sphere centers ({field})")
    em = np.stack(
        [np.asarray(scene.materials.emission.x),
         np.asarray(scene.materials.emission.y),
         np.asarray(scene.materials.emission.z)], axis=1,
    )
    if (em < 0).any():
        problems.append("negative emission")
    mat_ids = np.asarray(scene.spheres.material_id)
    if (mat_ids < 0).any() or (mat_ids >= scene.materials.count).any():
        problems.append("sphere material id out of range")
    if scene.triangles is not None:
        t_ids = np.asarray(scene.triangles.material_id)
        if (t_ids < 0).any() or (t_ids >= scene.materials.count).any():
            problems.append("triangle material id out of range")
        if (np.asarray(scene.triangles.area) <= 0).any():
            problems.append("degenerate (zero-area) triangles")
    if scene.num_lights == 0 and not bool(scene.sky.has_ambient()):
        problems.append("no lights and black sky: the render will be black")
    return problems
