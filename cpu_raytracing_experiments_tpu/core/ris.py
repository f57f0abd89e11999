"""Resampled importance sampling (RIS) / weighted reservoirs.

Vectorized port of the reference's dormant ReSTIR building blocks
(/root/reference/Sampling.hpp:25-73 — present but unused by its renderer;
kept here as the same future light-sampling upgrade hook, but implemented
batched so a [R]-wide reservoir per ray runs on the VPU).

A reservoir streams candidate samples with weights and keeps one survivor
with probability proportional to its weight; `ris` draws `count` candidates
from a source distribution and returns the selected sample with its
unbiased contribution weight W = weight_sum / (M * p_hat(selected)).
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax.numpy as jnp

from . import rng as _rng


class Reservoir(NamedTuple):
    """SoA batched reservoir (Sampling.hpp:27-37)."""

    sample: jnp.ndarray  # [R] int32 selected candidate (-1 = empty)
    weight: jnp.ndarray  # [R] f32 contribution weight W
    weight_sum: jnp.ndarray  # [R] f32
    count: jnp.ndarray  # [R] int32 candidates seen

    @staticmethod
    def empty(shape) -> "Reservoir":
        return Reservoir(
            sample=jnp.full(shape, -1, jnp.int32),
            weight=jnp.zeros(shape, jnp.float32),
            weight_sum=jnp.zeros(shape, jnp.float32),
            count=jnp.zeros(shape, jnp.int32),
        )

    def update(self, candidate, weight, random_01, num_samples=1) -> "Reservoir":
        """Streaming weighted selection (Sampling.hpp:31-36)."""
        weight_sum = self.weight_sum + weight
        take = random_01 < (weight / jnp.maximum(weight_sum, 1e-30))
        return Reservoir(
            sample=jnp.where(take, candidate, self.sample),
            weight=self.weight,
            weight_sum=weight_sum,
            count=self.count + num_samples,
        )


def ris(
    count: int,
    src_dist: Callable,
    weight_sample: Callable,
    rng_state: jnp.ndarray,
):
    """Resampled importance sampling (Sampling.hpp:42-54).

    src_dist(i, state) -> (state, candidate [R] int32, recip_pdf [R])
    weight_sample(candidate) -> target weight p_hat [R]
    Returns (rng_state, sample [R] int32, W [R]) with sample = -1 / W = 0
    where nothing viable was seen.
    """
    shape = None
    r = None
    state = rng_state
    for i in range(count):
        state, cand, rp = src_dist(i, state)
        if r is None:
            shape = cand.shape
            r = Reservoir.empty(shape)
        state, u = _rng.rand_unit_float(state)
        r = r.update(cand, weight_sample(cand) * rp, u)
    ok = r.sample >= 0
    safe = jnp.maximum(r.sample, 0)
    w = weight_sample(safe)
    ok = ok & (w > 0.0)
    weight = jnp.where(
        ok, r.weight_sum / (r.count.astype(jnp.float32) * jnp.maximum(w, 1e-30)), 0.0
    )
    return state, jnp.where(ok, r.sample, -1), weight


def combine_reservoirs(
    reservoirs, weight_sample: Callable, rng_state: jnp.ndarray
):
    """Merge reservoirs (spatial/temporal reuse, Sampling.hpp:56-73)."""
    r = reservoirs[0]
    state = rng_state
    for other in reservoirs[1:]:
        safe = jnp.maximum(other.sample, 0)
        w = jnp.where(
            other.sample >= 0,
            weight_sample(safe) * other.weight * other.count.astype(jnp.float32),
            0.0,
        )
        state, u = _rng.rand_unit_float(state)
        r = r.update(other.sample, w, u, num_samples=other.count)
    ok = r.sample >= 0
    safe = jnp.maximum(r.sample, 0)
    w = weight_sample(safe)
    ok = ok & (w > 0.0)
    weight = jnp.where(
        ok, r.weight_sum / (r.count.astype(jnp.float32) * jnp.maximum(w, 1e-30)), 0.0
    )
    return state, Reservoir(
        sample=jnp.where(ok, r.sample, -1),
        weight=weight,
        weight_sum=r.weight_sum,
        count=r.count,
    )
