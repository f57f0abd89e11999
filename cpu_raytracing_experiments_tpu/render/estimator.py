"""Progressive accumulation + median-of-means resolve.

Port of the reference's accumulator design (/root/reference/
Renderer.hpp:38-68, 436-478): radiance is accumulated round-robin into 5
independent buckets (bucket = accumulation % 5); every 5th accumulation each
bucket holds an equal number of samples and the resolve takes the per-pixel,
per-channel *median of the 5 bucket means* — a firefly-robust estimator —
scales by exposure/(accumulations/5), applies ACES and clamps.

The accumulator (buckets + accumulation counter) IS the checkpointable
render state: counter-based RNG makes resume bit-exact (see
render/checkpoint.py).
"""
from __future__ import annotations

import dataclasses
import jax
import jax.numpy as jnp

from ..core import color, sampling
from ..scene.scene import Scene
from ..utils.config import RendererPolicy
from . import renderer as _renderer


def _pytree_dataclass(cls):
    cls = dataclasses.dataclass(cls)
    fields = [f.name for f in dataclasses.fields(cls)]
    jax.tree_util.register_dataclass(cls, data_fields=fields, meta_fields=[])
    return cls


@_pytree_dataclass
class RenderState:
    """buckets: [B, 3, npix] f32; accumulations: u32 scalar; reservoir:
    optional [3, npix] f32 ReSTIR per-pixel light reservoirs (light index
    as float, -1 = empty; contribution weight W; candidate count) carried
    across accumulation passes when policy.light_sampling='restir'. Any
    reset (scene edit / resize) clears the history, preserving the
    UpdateTracker invalidation semantics (Application.cpp:343-358)."""

    buckets: jnp.ndarray
    accumulations: jnp.ndarray
    reservoir: jnp.ndarray = None
    counts: jnp.ndarray = None  # [npix] f32 per-pixel pass counts, present
    # only after adaptive (subset) accumulation; None = uniform (the
    # reference's always-every-pixel schedule)

    @staticmethod
    def _empty_reservoir(npix: int):
        return jnp.concatenate(
            [
                jnp.full((1, npix), -1.0, jnp.float32),
                jnp.zeros((2, npix), jnp.float32),
            ],
            axis=0,
        )

    @staticmethod
    def create(width: int, height: int, policy: RendererPolicy) -> "RenderState":
        return RenderState(
            buckets=jnp.zeros(
                (policy.accumulation_buckets, 3, width * height), jnp.float32
            ),
            accumulations=jnp.uint32(0),
            reservoir=(
                RenderState._empty_reservoir(width * height)
                if policy.light_sampling == "restir"
                else None
            ),
        )

    def reset(self) -> "RenderState":
        """ResetAccumulator (Renderer.hpp:64-67)."""
        return RenderState(
            buckets=jnp.zeros_like(self.buckets),
            accumulations=jnp.uint32(0),
            reservoir=(
                None
                if self.reservoir is None
                else RenderState._empty_reservoir(self.reservoir.shape[1])
            ),
        )


def accumulate(
    scene: Scene,
    policy: RendererPolicy,
    state: RenderState,
    width: int,
    height: int,
) -> RenderState:
    """One progressive sample per pixel into the current bucket
    (Renderer.hpp:73-84: ++accumulations, bucket = accumulations % B)."""
    acc = state.accumulations + jnp.uint32(1)
    res_out = state.reservoir
    if policy.light_sampling == "restir" and state.reservoir is not None:
        rad, _, res_out = _renderer.render_pass(
            scene, policy, acc, width, height, restir_in=state.reservoir
        )
    else:
        rad, _ = _renderer.render_pass(scene, policy, acc, width, height)
    bucket = (acc % jnp.uint32(policy.accumulation_buckets)).astype(jnp.int32)
    sample = jnp.stack([rad.x, rad.y, rad.z], axis=0)
    return RenderState(
        buckets=state.buckets.at[bucket].add(sample),
        accumulations=acc,
        reservoir=res_out,
        counts=None if state.counts is None else state.counts + 1.0,
    )


def accumulate_pixels(
    scene: Scene,
    policy: RendererPolicy,
    state: RenderState,
    width: int,
    height: int,
    pixel_ids: jnp.ndarray,
    valid: jnp.ndarray,
) -> RenderState:
    """One progressive sample for a pixel SUBSET (per-pixel adaptive
    sample allocation — the reference traces every pixel every pass,
    Renderer.hpp:75). `pixel_ids` [N] is a static-size compacted list,
    `valid` masks padding. The accumulation counter still advances
    globally (it keys the RNG stream), but only the listed pixels receive
    the sample; `state.counts` tracks per-pixel totals for the
    count-aware resolve."""
    acc = state.accumulations + jnp.uint32(1)
    rad, _ = _renderer.render_pass_pixels(
        scene, policy, acc, width, pixel_ids, valid
    )
    bucket = (acc % jnp.uint32(policy.accumulation_buckets)).astype(jnp.int32)
    npix = state.buckets.shape[-1]
    vf = valid.astype(jnp.float32)
    frame = jnp.zeros((3, npix), jnp.float32)
    frame = frame.at[:, pixel_ids].add(
        jnp.stack([rad.x * vf, rad.y * vf, rad.z * vf], axis=0)
    )
    counts = (
        jnp.full((npix,), state.accumulations.astype(jnp.float32))
        if state.counts is None
        else state.counts
    )
    counts = counts.at[pixel_ids].add(vf)
    return RenderState(
        buckets=state.buckets.at[bucket].add(frame),
        accumulations=acc,
        reservoir=state.reservoir,
        counts=counts,
    )


def stderr_arrays(buckets, accumulations, counts) -> jnp.ndarray:
    """[n] per-pixel standard error of the running mean from the
    median-of-means bucket spread (channel-averaged), computed ON DEVICE —
    the basis of the device-resident adaptive round (render/api.py
    _adaptive_round_jit, parallel/sharded.py _adaptive_round_sharded).
    Matches utils.metrics.pixel_variance_map (the host oracle) for uniform
    counts and the count-aware variant for per-pixel `counts`: each
    pixel's per-bucket share normalizes its bucket sums before the
    across-bucket variance. `buckets` is [B, 3, n]; `counts` is [n] or
    None (uniform: accumulations // B per bucket)."""
    b = buckets.shape[0]
    n = buckets.shape[-1]
    if b <= 1:
        return jnp.zeros((n,), jnp.float32)
    if counts is None:
        per_bucket = jnp.maximum(
            jnp.floor(accumulations.astype(jnp.float32) / b), 1.0
        )
    else:
        per_bucket = jnp.maximum(counts / b, 1.0)[None, None, :]
    means = buckets / per_bucket
    v = means.var(axis=0, ddof=1).mean(axis=0) / b
    return jnp.sqrt(v)


def pixel_stderr(state: RenderState) -> jnp.ndarray:
    return stderr_arrays(state.buckets, state.accumulations, state.counts)


def accumulate_wide(
    scene: Scene,
    policy: RendererPolicy,
    state: RenderState,
    width: int,
    height: int,
    k: int,
) -> RenderState:
    """k accumulation passes traced as ONE wide wavefront launch (lane
    block i carries accumulation+i; renderer.render_pass k_passes). Every
    lane's radiance — and therefore every bucket — is bit-identical to k
    sequential accumulate() calls: the counter RNG keys all draws by
    (accumulation, pixel), never by launch shape. The win is pure per-op
    overhead amortization on small frames, where a 65k-lane pass leaves
    the VPU mostly idle between op launches (hero 256x256 measured
    ~3 ms/pass sequential)."""
    acc0 = state.accumulations + jnp.uint32(1)
    rad, _ = _renderer.render_pass(
        scene, policy, acc0, width, height, k_passes=k
    )
    b = jnp.uint32(policy.accumulation_buckets)
    buckets = state.buckets
    for i in range(k):
        bi = ((acc0 + jnp.uint32(i)) % b).astype(jnp.int32)
        sample = jnp.stack([rad.x[i], rad.y[i], rad.z[i]], axis=0)
        buckets = buckets.at[bi].add(sample)
    return RenderState(
        buckets=buckets,
        accumulations=acc0 + jnp.uint32(k - 1),
        reservoir=state.reservoir,
        counts=None if state.counts is None else state.counts + float(k),
    )


def launch_width(policy: RendererPolicy, width: int, height: int) -> int:
    """Auto k for accumulate_n: batch passes until the launch reaches the
    microbatch width (rays_per_chunk), cap 8. Sequential modes (ReSTIR's
    reservoir chain) stay at 1."""
    if policy.light_sampling == "restir":
        return 1
    ppl = policy.passes_per_launch
    if ppl == "auto":
        per_pass = width * height * policy.samples_per_pixel
        return max(1, min(8, policy.rays_per_chunk // per_pass))
    return max(1, int(ppl))


def accumulate_n(
    scene: Scene,
    policy: RendererPolicy,
    state: RenderState,
    width: int,
    height: int,
    n: int,
) -> RenderState:
    """n accumulation passes fused into one compiled loop. Small frames are
    traced `launch_width` passes per wavefront launch (bit-identical to
    sequential — see accumulate_wide); the remainder runs one at a time."""
    k = min(launch_width(policy, width, height), n)
    if k > 1:

        def stepk(_, s):
            return accumulate_wide(scene, policy, s, width, height, k)

        state = jax.lax.fori_loop(0, n // k, stepk, state)
        n = n % k

    def step(_, s):
        return accumulate(scene, policy, s, width, height)

    return jax.lax.fori_loop(0, n, step, state)


def resolve(
    state: RenderState,
    policy: RendererPolicy,
    exposure,
    width: int,
    height: int,
    tonemap: bool = True,
) -> jnp.ndarray:
    """Median-of-means resolve + ACES (Renderer.hpp:436-478). Returns an
    [H, W, 3] image, row 0 = bottom scanline. Caller is responsible for
    invoking it only when accumulations % buckets == 0 (equal bucket
    weights), as the reference does (:437)."""
    b = policy.accumulation_buckets
    if state.counts is not None:
        # count-aware resolve for adaptive (per-pixel) sample allocation:
        # each bucket holds counts/b of the pixel's samples (subset rounds
        # are issued in bucket multiples), so the per-pixel per-bucket mean
        # divides by counts/b
        n_rounds = jnp.maximum(state.counts / b, 1.0)
    else:
        n_rounds = jnp.maximum(
            state.accumulations // jnp.uint32(b), 1
        ).astype(jnp.float32)
    scale = jnp.asarray(exposure, jnp.float32) / (
        n_rounds * policy.samples_per_pixel
    )
    if policy.median and b == 5:
        channels = [
            sampling.median5(*[state.buckets[k, c] for k in range(5)]) * scale
            for c in range(3)
        ]
    elif policy.median:
        channels = [
            jnp.median(state.buckets[:, c, :], axis=0) * scale for c in range(3)
        ]
    else:  # average-of-buckets variant (Renderer.hpp:457-459)
        channels = [
            jnp.mean(state.buckets[:, c, :], axis=0) * scale for c in range(3)
        ]
    r, g, bl = channels
    if tonemap:
        r, g, bl = color.tonemap_aces(r, g, bl)
    return jnp.stack(
        [r.reshape(height, width), g.reshape(height, width), bl.reshape(height, width)],
        axis=-1,
    )


def resolve_hdr(
    state: RenderState, policy: RendererPolicy, exposure, width: int, height: int
) -> jnp.ndarray:
    """Linear-radiance resolve (no tonemap) — for HDR export and tests."""
    return resolve(state, policy, exposure, width, height, tonemap=False)
