"""Verify: inside a while_loop, N single-column gathers from separate [P]
arrays vs one row-gather from a packed [P,N] table vs one-hot matmul."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

R = 262144
P = 1000
NCOL = 12
ITERS = 16


def fence(x):
    float(jax.tree.leaves(x)[0].ravel()[0])


def timeit(f, *a):
    fence(f(*a))
    best = 1e30
    for _ in range(3):
        t0 = time.perf_counter()
        fence(f(*a))
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def main():
    rng = np.random.default_rng(0)
    cols = [jnp.asarray(rng.normal(size=P).astype(np.float32)) for _ in range(NCOL)]
    packed = jnp.stack(cols, axis=1)  # [P, NCOL]
    idx0 = jnp.asarray(rng.integers(0, P, R).astype(np.int32))

    def loop(body):
        @jax.jit
        def f(idx):
            def b(c):
                i, acc = c
                vals = body((idx + i) % P)
                return i + 1, acc + sum(vals) * 1e-9

            _, acc = jax.lax.while_loop(
                lambda c: c[0] < ITERS, b, (jnp.int32(0), jnp.zeros((R,))))
            return acc

        return f

    f = loop(lambda i: [c[i] for c in cols])
    ms = timeit(f, idx0)
    print(f"{NCOL} separate column gathers: {ms/ITERS:.2f} ms/iter", flush=True)

    f = loop(lambda i: [packed[i][:, k] for k in range(NCOL)])
    ms = timeit(f, idx0)
    print(f"1 packed row gather [P,{NCOL}]: {ms/ITERS:.2f} ms/iter", flush=True)

    def onehot(i):
        oh = jax.nn.one_hot(i, P, dtype=jnp.float32)
        out = oh @ packed
        return [out[:, k] for k in range(NCOL)]

    f = loop(onehot)
    ms = timeit(f, idx0)
    print(f"one-hot f32 matmul: {ms/ITERS:.2f} ms/iter", flush=True)

    f = loop(lambda i: [cols[0][i]])
    ms = timeit(f, idx0)
    print(f"single column gather: {ms/ITERS:.2f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
