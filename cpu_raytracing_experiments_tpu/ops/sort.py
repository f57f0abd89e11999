"""Coherence extraction: counting sort of ray indices by material id.

Port of the reference's per-tile counting sort (/root/reference/
DataStreams.hpp:221-253 + Renderer.hpp:235-243): histogram over material
ids (key -1 = miss sorts first), prefix sum, stable placement.

On TPU, lanes are divergence-free so shading does NOT need this sort for
correctness or SIMD coherence — it exists as (a) a parity component, and
(b) the building block for compaction experiments (sorting by liveness /
material to densify expensive closure work; SURVEY.md §7 hard-part 1).
A stable argsort IS a stable counting sort; XLA lowers it to its sort HLO.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def histogram(keys: jnp.ndarray, num_bins: int) -> jnp.ndarray:
    """Counts per key (DataStreams.hpp:221-232). keys: [N] int in
    [0, num_bins). One-hot reduction — vectorizes on the VPU/MXU instead of
    the reference's scalar increment loop."""
    one_hot = (keys[:, None] == jnp.arange(num_bins)[None, :]).astype(jnp.int32)
    return one_hot.sum(axis=0)


def prefix_sum(counts: jnp.ndarray) -> jnp.ndarray:
    """Inclusive prefix sum (DataStreams.hpp:233-235)."""
    return jnp.cumsum(counts)


def sort_ray_ids(
    mat_id: jnp.ndarray, num_materials: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Stable sort of ray indices by material id, misses (-1) first —
    sort_rayID semantics (DataStreams.hpp:239-253).

    Returns (ray_ids [N] int32: indices ordered so equal-material runs are
    contiguous and within-run order is the original one, miss_count scalar).
    """
    keys = mat_id + 1  # -1 (miss) -> bin 0, mirroring the reference's +1 shift
    ray_ids = jnp.argsort(keys, stable=True).astype(jnp.int32)
    miss_count = jnp.sum((keys == 0).astype(jnp.int32))
    return ray_ids, miss_count


def compaction_order(alive: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Permutation putting live lanes first (stable) + live count — the
    masked-wavefront analog of the reference's dense rewrite at output_index
    (Renderer.hpp:357-404)."""
    order = jnp.argsort(~alive, stable=True).astype(jnp.int32)
    return order, jnp.sum(alive.astype(jnp.int32))
