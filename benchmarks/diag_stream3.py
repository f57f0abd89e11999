"""Test the ULP hypothesis for the stream-vs-resident hardware mismatch:
does `_tables_packed(cp)` computed INSIDE a jit program differ (by float
rounding) from the eager value / from `_tables(cp)` inside a different
program?  If yes, the diag_stream2 'missed closer hit' is a cross-program
float-contraction divergence in the Baldwin-Weber precompute, not a kernel
or DMA bug.

    python benchmarks/diag_stream3.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from cpu_raytracing_experiments_tpu.ops import clustered
from cpu_raytracing_experiments_tpu.ops.pallas import traverse_kernel as tk
from bench_stream import make_tris

P, K = 100000, 256


def main():
    print(f"device={jax.devices()[0].device_kind}")
    rng = np.random.default_rng(7)
    mins, maxs, rows = make_tris(P, rng)
    cp = clustered.build_clusters(mins, maxs, rows,
                                  num_clusters=-(-P // K), kind="triangle")

    eager_packed = np.asarray(tk._tables_packed(cp))
    eager_attrs = [np.asarray(a) for a in tk._tables(cp)]

    jit_packed = np.asarray(jax.jit(tk._tables_packed)(cp))
    jit_attrs = [np.asarray(a) for a in
                 jax.jit(lambda c: tuple(tk._tables(c)))(cp)]

    # in-context variants: packed computed inside a LARGER program (sum
    # tail forces it to stay live), mimicking the renderer composition
    jit_packed_ctx = np.asarray(jax.jit(
        lambda c, x: (tk._tables_packed(c), x * 2.0))(cp, jnp.ones(4))[0])

    def cmp(a, b, label):
        a64, b64 = a.astype(np.float64), b.astype(np.float64)
        diff = np.nonzero(a64 != b64)
        n = diff[0].size
        print(f"{label}: {n} differing cells"
              + (f", max rel {np.max(np.abs((a64 - b64) / np.where(b64 == 0, 1, b64))):.3e}"
                 if n else ""))
        return n

    f8 = tk._stream_rows(cp.kind)
    C = cp.num_clusters
    # packed rows back to per-attr planes for comparison
    def unpack(pk):
        return [pk.reshape(C, f8, K)[:, f, :] for f in range(12)]

    cmp(jit_packed, eager_packed, "jit(_tables_packed) vs eager")
    cmp(jit_packed_ctx, eager_packed, "jit(ctx _tables_packed) vs eager")
    up_j = unpack(jit_packed)
    for f in range(12):
        n = np.nonzero(up_j[f].astype(np.float64)
                       != jit_attrs[f].astype(np.float64))[0].size
        if n:
            print(f"  attr {f}: jit packed vs jit _tables differ in {n} cells")
    tot = sum(
        np.nonzero(up_j[f].astype(np.float64)
                   != jit_attrs[f].astype(np.float64))[0].size
        for f in range(12)
    )
    print(f"jit packed vs jit _tables total differing cells: {tot}")
    tot2 = sum(
        np.nonzero(eager_attrs[f].astype(np.float64)
                   != jit_attrs[f].astype(np.float64))[0].size
        for f in range(12)
    )
    print(f"eager _tables vs jit _tables total differing cells: {tot2}")


if __name__ == "__main__":
    main()
