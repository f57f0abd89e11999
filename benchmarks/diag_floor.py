"""Characterize the apparent ~2 ms fixed cost per sequential scan step on
this chip: body size, scan length, unrolling, array width."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


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
    R = 262144
    x0 = jnp.ones((R,), jnp.float32)

    for n in (16, 64):
        for unroll in (1, 4):
            @jax.jit
            def f(x, n=n, unroll=unroll):
                def body(c, _):
                    return c * 1.0000001 + 1e-9, None

                c, _ = jax.lax.scan(body, x, None, length=n, unroll=unroll)
                return c

            ms = timeit(f, x0)
            print(f"scan[{n}] unroll={unroll} trivial body [R]: "
                  f"{ms:.2f} ms = {ms/n:.3f} ms/iter", flush=True)

    # while_loop version (the renderer's actual construct)
    for n in (16,):
        @jax.jit
        def g(x):
            def body(c):
                i, v = c
                return i + 1, v * 1.0000001 + 1e-9

            _, v = jax.lax.while_loop(lambda c: c[0] < n, body, (jnp.int32(0), x))
            return v

        ms = timeit(g, x0)
        print(f"while[{n}] trivial body [R]: {ms:.2f} ms = {ms/n:.3f} ms/iter",
              flush=True)

    # single big fused op for scale
    @jax.jit
    def h(x):
        return jnp.sum(x * 1.0001 + 3.0)

    ms = timeit(h, x0)
    print(f"single fused elementwise+reduce [R]: {ms:.2f} ms", flush=True)

    # dispatch floor: jit of a scalar op
    @jax.jit
    def s(a):
        return a + 1.0

    ms = timeit(s, jnp.float32(1.0))
    print(f"scalar jit call round-trip: {ms:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
