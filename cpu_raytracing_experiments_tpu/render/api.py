"""High-level progressive renderer — the reference ``Renderer`` interface
(/root/reference/Renderer.hpp:29-478: Resize / ResetAccumulator /
Accumulate / Render) rebuilt around jitted functional steps.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import numpy as np

from ..scene.scene import Scene
from ..utils.config import RendererPolicy
from . import estimator


@partial(jax.jit, static_argnames=("policy", "width", "height", "n"), donate_argnames=("state",))
def _accumulate_n_jit(scene, policy, state, width, height, n):
    return estimator.accumulate_n(scene, policy, state, width, height, n)


@partial(jax.jit, static_argnames=("policy", "width", "height", "tonemap"))
def _resolve_jit(state, policy, exposure, width, height, tonemap):
    return estimator.resolve(state, policy, exposure, width, height, tonemap)


class Renderer:
    """Progressive accumulator with the reference's invalidation semantics:
    any scene edit -> reset_accumulator(); renders continue indefinitely and
    resolve on demand (every `buckets` accumulations for equal weighting)."""

    def __init__(self, scene: Scene, policy: Optional[RendererPolicy] = None,
                 width: int = 256, height: int = 256):
        self.policy = policy or RendererPolicy()
        self.width = width
        self.height = height
        self.scene = scene
        if (
            float(scene.camera.half_width) * 2 != width
            or float(scene.camera.half_height) * 2 != height
        ):
            self.scene = self._with_camera(scene.camera.resized(width, height))
        self.state = estimator.RenderState.create(width, height, self.policy)

    def _with_camera(self, camera):
        import dataclasses

        return dataclasses.replace(self.scene, camera=camera)

    # -- reference API -------------------------------------------------------
    def resize(self, width: int, height: int):
        """Renderer::Resize (Renderer.hpp:53-63): resize + reset."""
        self.width, self.height = width, height
        self.scene = self._with_camera(self.scene.camera.resized(width, height))
        self.state = estimator.RenderState.create(width, height, self.policy)

    def reset_accumulator(self):
        """Renderer::ResetAccumulator (Renderer.hpp:64-67)."""
        self.state = self.state.reset()

    def accumulate(self, n: int = 1):
        """n progressive samples/pixel (Renderer::Accumulate)."""
        self.state = _accumulate_n_jit(
            self.scene, self.policy, self.state, self.width, self.height, n
        )

    def render(self, tonemap: bool = True) -> np.ndarray:
        """Renderer::Render: median-of-means resolve (+ACES). Returns
        [H, W, 3] float32, row 0 = TOP scanline (standard image layout; the
        internal framebuffer is y-up like the reference and flipped here,
        mirroring Image::Store's vertical flip, Image.cpp:71-74)."""
        img = _resolve_jit(
            self.state, self.policy, self.scene.camera.exposure,
            self.width, self.height, tonemap,
        )
        return np.asarray(img)[::-1]

    # -- convenience ---------------------------------------------------------
    def render_spp(self, spp: int, tonemap: bool = True) -> np.ndarray:
        """Accumulate until at least `spp` total samples/pixel have been
        traced — each pass contributes policy.samples_per_pixel — with the
        pass count rounded up to a bucket multiple so every bucket carries
        equal weight (as Renderer.hpp:437 assumes), then resolve."""
        b = self.policy.accumulation_buckets
        passes = -(-spp // self.policy.samples_per_pixel)
        n = -(-passes // b) * b
        self.accumulate(n)
        return self.render(tonemap=tonemap)

    def variance_map(self) -> np.ndarray:
        """[H, W] per-pixel variance of the running mean from the
        median-of-means bucket spread (free — no extra samples). Row 0 is
        the top scanline, matching render()."""
        from ..utils.metrics import pixel_variance_map

        v = pixel_variance_map(
            np.asarray(self.state.buckets), int(self.state.accumulations)
        )
        return v.reshape(self.height, self.width)[::-1]

    def render_to_tolerance(
        self,
        tol: float,
        max_spp: int = 10000,
        check_every: Optional[int] = None,
        tonemap: bool = True,
        quantile: float = 0.99,
    ) -> np.ndarray:
        """Adaptive stopping (ROADMAP item 6, first stage): accumulate in
        bucket-multiple chunks until the `quantile`-th per-pixel standard
        error drops below `tol` (in linear radiance units) or max_spp is
        reached. Uses the bucket-spread variance estimate, so convergence
        tracking costs nothing beyond the samples themselves."""
        b = self.policy.accumulation_buckets
        step = check_every or 5 * b
        step = -(-step // b) * b
        while int(self.state.accumulations) < max_spp:
            self.accumulate(step)
            se = float(np.sqrt(np.quantile(self.variance_map(), quantile)))
            if se < tol:
                break
        return self.render(tonemap=tonemap)

    def update_scene(self, scene: Scene):
        """Scene edit entry point: swaps the scene pytree and resets the
        accumulator (UpdateTracker semantics, Application.cpp:343-358,
        508-510). Same-structure edits reuse the compiled executable."""
        self.scene = scene
        self.reset_accumulator()


def render_image(
    scene: Scene,
    width: int,
    height: int,
    spp: int,
    policy: Optional[RendererPolicy] = None,
    tonemap: bool = True,
) -> np.ndarray:
    """One-shot render helper."""
    r = Renderer(scene, policy, width, height)
    return r.render_spp(spp, tonemap=tonemap)
