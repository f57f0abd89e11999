"""Fast multi-attribute table gathers for the shading hot path.

Profiling the bounce loop on v5e (benchmarks/diag_gather2.py) showed that a
single [R]-from-[P] column gather inside the while_loop costs ~2-3 ms at
R=262k — and the reference-shaped shading stages (closest-hit frame, NEE,
emissive MIS; Renderer.hpp:169-353) perform ~12 of them per bounce, ~17 ms
of the ~22 ms bounce. Two re-formulations fix this:

* **one-hot matmul** (P <= ONE_HOT_MAX): stack the per-prim attributes into
  one [P, F] f32 table and compute `one_hot(idx) @ table` — the MXU does the
  gather at ~1.9 ms for ALL F columns (13x over separate gathers). Exact:
  each output element is one f32 value multiplied by exactly 1.0 plus zeros,
  so results are bit-identical to indexing.
* **packed row gather** (large P): a single `table[idx]` row gather fetches
  all F columns in one pass (~4 ms vs F x 2-3 ms) — used for 100k-triangle
  tables where a [R, P] one-hot would explode.

Int32 columns ride along as f32 (exact for |v| < 2^24; material ids are
tiny) and are cast back on unpack.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# Measured crossover on v5e: one-hot matmul wins up to a few thousand rows;
# beyond that its R*P*F flops overtake the flat row-gather cost.
ONE_HOT_MAX = 2048


def pack_table(*cols) -> jnp.ndarray:
    """Stack [P] columns (f32/int) into one [P, F] f32 table. Loop-invariant
    when the columns are scene fields — XLA hoists it out of the bounce
    while_loop, so packing is free per-bounce."""
    return jnp.stack([jnp.asarray(c).astype(jnp.float32) for c in cols], axis=1)


def gather_rows(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """All F columns of `table` at rows `idx`: [R, F]. One-hot matmul for
    small tables, single row gather for large ones."""
    p = table.shape[0]
    if p <= ONE_HOT_MAX:
        oh = jax.nn.one_hot(idx, p, dtype=jnp.float32)
        # HIGHEST precision is required for bit-exactness: TPU f32 matmuls
        # default to bf16-rounded multiplies; with the 3-term bf16 split,
        # multiplying by exactly 1.0 reconstructs each f32 bit-for-bit
        # (verified on v5e: default=inexact, highest=exact, same speed).
        return jnp.matmul(oh, table, precision=jax.lax.Precision.HIGHEST)
    return table[idx]


def gather_cols(idx: jnp.ndarray, *cols):
    """Gather each of the [P] `cols` at `idx`, returned as a tuple of [R]
    f32 arrays — the drop-in replacement for `(c[idx] for c in cols)`."""
    out = gather_rows(pack_table(*cols), idx)
    return tuple(out[:, k] for k in range(len(cols)))
