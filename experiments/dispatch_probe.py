#!/usr/bin/env python
"""Measure per-dispatch overhead through the axon tunnel.

Chains K tiny jitted calls (data-dependent, donated) and times the wall per
call with ONE scalar device_get at the end, for several K; then repeats for
a moderately sized buffer to separate RTT from transfer effects.  If wall/K
is flat in K, dispatch pipelines; if wall/K ~ constant >> device time,
each execute pays a round trip.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


@jax.jit
def tiny(x):
    return x * 1.000001 + 0.000001


def timed(f, x, k):
    # warm
    y = f(x)
    float(y.sum()) if y.ndim else float(y)
    t0 = time.perf_counter()
    for _ in range(k):
        x = f(x)
    float(x.sum()) if x.ndim else float(x)
    return (time.perf_counter() - t0) / k * 1e3


def main():
    x = jnp.float32(1.0)
    for k in (1, 5, 20, 50):
        print(f"scalar chain k={k}: {timed(tiny, x, k):.2f} ms/call")

    big = jnp.ones((4 * 1024 * 1024,), jnp.float32)  # 16 MB

    @jax.jit
    def bigf(x):
        return x * 1.000001

    for k in (1, 5, 20):
        print(f"16MB chain  k={k}: {timed(bigf, big, k):.2f} ms/call")

    # scan of 10 tiny ops in one dispatch, for contrast
    @jax.jit
    def scanned(x):
        def body(c, _):
            return c * 1.000001 + 0.000001, None
        c, _ = jax.lax.scan(body, x, None, length=1000)
        return c

    print(f"scan-1000-in-one-dispatch: {timed(scanned, x, 5):.2f} ms/call")


if __name__ == "__main__":
    main()
