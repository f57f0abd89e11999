"""How expensive is a [R] gather from a small [P] table on v5e, and what's
the fastest alternative?  Candidates: plain take, one-hot matmul (bf16/f32),
packed multi-attribute one-hot matmul."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def fence(x):
    float(jax.tree.leaves(x)[0].ravel()[0])


def bench(f, *a, n=16):
    @jax.jit
    def run(*a):
        def body(c, _):
            out = f(*a)
            leaves = jax.tree.leaves(out)
            c = c + 1e-9 * sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)
            return c, None

        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=n)
        return c

    fence(run(*a))
    best = 1e30
    for _ in range(3):
        t0 = time.perf_counter()
        fence(run(*a))
        best = min(best, time.perf_counter() - t0)
    return best / n * 1e3


def main():
    R = 262144
    rng = np.random.default_rng(0)
    for P in (16, 1024):
        idx = jnp.asarray(rng.integers(0, P, R).astype(np.int32))
        table1 = jnp.asarray(rng.normal(size=(P,)).astype(np.float32))
        table16 = jnp.asarray(rng.normal(size=(P, 16)).astype(np.float32))

        ms = bench(lambda i: table1[i], idx)
        print(f"P={P}: 1 gather [R] from [P]: {ms:.3f} ms", flush=True)

        ms = bench(lambda i: tuple(table16[:, f][i] for f in range(12)), idx)
        print(f"P={P}: 12 separate gathers: {ms:.3f} ms", flush=True)

        def onehot_f32(i):
            oh = jax.nn.one_hot(i, P, dtype=jnp.float32)
            return oh @ table16

        ms = bench(onehot_f32, idx)
        print(f"P={P}: one-hot f32 matmul [R,P]x[P,16]: {ms:.3f} ms", flush=True)

        def onehot_bf16(i):
            oh = jax.nn.one_hot(i, P, dtype=jnp.bfloat16)
            return (oh @ table16.astype(jnp.bfloat16)).astype(jnp.float32)

        ms = bench(onehot_bf16, idx)
        print(f"P={P}: one-hot bf16 matmul: {ms:.3f} ms", flush=True)

        # take_along_axis on [R, P] candidate matrix style (already have t)
        def tala(i):
            return jnp.take(table16, i, axis=0)

        ms = bench(tala, idx)
        print(f"P={P}: jnp.take axis=0 -> [R,16]: {ms:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
