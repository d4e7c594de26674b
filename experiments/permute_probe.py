#!/usr/bin/env python
"""Microbenchmark: in-VMEM one-hot permutation of G-element groups.

The final stage of any Pallas shuffle (permutation-apply or sample sort)
places elements at exact positions within a VMEM-resident group.  TPU has
no vector scatter; the exact mechanism is a one-hot matmul:

    P[j, k] = (dest_local[j] == k)          (G, G) 0/1
    out     = P^T @ vals                    vals (G, R) f32

i32 payloads ride as two 16-bit halves (exact in f32).  This probe
measures ms/M-elements for the whole pipeline (load group + build one-hot
+ 2R half matmuls + repack + store) vs G, to compare against lax.sort's
~0.7 ms/M/operand and decide the group size of the real kernel.
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)


def make_permute(n, g, r, interpret=False):
    """vals (R, N) i32, dest (N,) i32 a permutation of [0, N) such that
    dest[j] // G == j // G (group-local): out[:, dest[j]] = vals[:, j]."""
    grid = n // g

    def kernel(dest_ref, v_ref, o_ref):
        d = dest_ref[0, :]  # (G,) i32 group-local dest
        # one-hot P[j, k] = (d[j] == k), built on lanes
        row = jax.lax.broadcasted_iota(jnp.int32, (g, g), 1)
        p = (d[:, None] == row).astype(jnp.float32)  # (G, G)
        v = v_ref[:, :]  # (R, G) i32
        hi = jax.lax.shift_right_logical(v, 16).astype(jnp.float32)
        lo = (v & 0xFFFF).astype(jnp.float32)
        halves = jnp.concatenate([hi, lo], axis=0)  # (2R, G)
        out = jax.lax.dot_general(
            halves, p, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (2R, G)
        oh = out[:r].astype(jnp.int32)
        ol = out[r:].astype(jnp.int32)
        o_ref[:, :] = jax.lax.shift_left(oh, 16) | ol

    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, g), lambda i: (i, 0)),
            pl.BlockSpec((r, g), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((r, g), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((r, n), jnp.int32),
        interpret=interpret,
    )


def timeit(fn, *args, iters=30):
    out = fn(*args)
    jax.device_get(out.ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(out.ravel()[0])
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    interpret = jax.default_backend() == "cpu"
    rng = np.random.default_rng(0)
    n = 1 << 21 if not interpret else 1 << 12
    r = 6
    vals = jnp.asarray(
        rng.integers(-(2**31), 2**31, size=(r, n), dtype=np.int64)
        .astype(np.int32)
    )
    for g in (256, 512, 1024, 2048):
        # group-local permutation
        dest_local = np.concatenate(
            [rng.permutation(g).astype(np.int32) for _ in range(n // g)]
        ).reshape(n // g, g)
        fn = jax.jit(make_permute(n, g, r, interpret))
        ms = timeit(fn, jnp.asarray(dest_local), vals)
        # correctness
        got = np.asarray(fn(jnp.asarray(dest_local), vals))
        want = np.empty_like(got)
        dl = dest_local.reshape(-1)
        idx = np.arange(n)
        gbase = (idx // g) * g
        want[:, gbase + dl] = np.asarray(vals)[:, idx]
        np.testing.assert_array_equal(got, want)
        print(
            f"G={g:5d}: {ms:7.3f} ms  "
            f"{ms / (n / 1e6):.3f} ms/M ({r} i32 rows)  OK",
            flush=True,
        )


if __name__ == "__main__":
    main()
