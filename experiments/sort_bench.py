#!/usr/bin/env python
"""Microbenchmark: lax.sort shapes/operand-count alternatives on one chip.

Questions this answers (round-3 sort attack):
 1. per-operand cost of the global 1-key sort at candidate width
 2. does a batched minor-axis sort (rows sorted independently) beat one
    global sort of the same total element count?
 3. how much does operand packing (bf16 pairs -> i32) save end to end?
 4. cost vs element width (2M vs 4M vs 8M)
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)


def timeit(fn, *args, iters=10):
    out = fn(*args)
    jax.tree_util.tree_map(
        lambda x: jax.device_get(x.ravel()[0]), out
    )  # sync
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.tree_util.tree_map(lambda x: jax.device_get(x.ravel()[0]), out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    rng = np.random.default_rng(0)

    def mk(n, n_ops, dtype=jnp.int32):
        key = jnp.asarray(
            rng.integers(0, 2**30, size=n, dtype=np.int32)
        )
        vals = [
            jnp.asarray(rng.integers(0, 2**30, size=n, dtype=np.int32))
            for _ in range(n_ops - 1)
        ]
        return tuple([key] + vals)

    @jax.jit
    def gsort(*ops):
        return jax.lax.sort(ops, num_keys=1, is_stable=False)

    for n in (1 << 21, 1 << 22):
        for n_ops in (1, 2, 3, 6, 9, 12):
            ops = mk(n, n_ops)
            ms = timeit(gsort, *ops)
            print(
                f"global n={n/1e6:.1f}M ops={n_ops:2d}: {ms:7.2f} ms "
                f"({ms/n_ops/(n/1e6):.3f} ms/M/op)",
                flush=True,
            )

    # i64 operand packing: if sort cost is per-OPERAND (comparator network
    # plumbing) rather than per-byte, riding two i32 value rows as one
    # bitcast i64 operand halves the big sorts' cost.  Requires x64 mode
    # (enabled here only; the package itself never uses i64).
    jax.config.update("jax_enable_x64", True)

    @jax.jit
    def gsort64(*ops):
        return jax.lax.sort(ops, num_keys=1, is_stable=False)

    for n in (1 << 21, 1 << 22):
        for n32, n64 in ((1, 3), (1, 0), (1, 1), (2, 6)):
            key = jnp.asarray(
                rng.integers(0, 2**30, size=n, dtype=np.int32)
            )
            ops32 = [
                jnp.asarray(
                    rng.integers(0, 2**30, size=n, dtype=np.int32)
                )
                for _ in range(n32 - 1)
            ]
            ops64 = [
                jnp.asarray(
                    rng.integers(0, 2**62, size=n, dtype=np.int64)
                )
                for _ in range(n64)
            ]
            ops = tuple([key] + ops32 + ops64)
            ms = timeit(gsort64, *ops)
            eq32 = n32 + 2 * n64  # equivalent i32 operand count by bytes
            print(
                f"i64pack n={n/1e6:.1f}M i32x{n32} i64x{n64} "
                f"(={eq32} i32-eq): {ms:7.2f} ms "
                f"({ms/eq32/(n/1e6):.3f} ms/M/i32-eq)",
                flush=True,
            )

    # batched minor-axis sorts: same totals, rows sorted independently
    @jax.jit
    def bsort(*ops):
        return jax.lax.sort(ops, dimension=1, num_keys=1, is_stable=False)

    for n in (1 << 22,):
        for rows in (8, 64, 512):
            w = n // rows
            for n_ops in (2, 12):
                ops = tuple(
                    o.reshape(rows, w) for o in mk(n, n_ops)
                )
                ms = timeit(bsort, *ops)
                print(
                    f"batched {rows}x{w//1024}K ops={n_ops:2d}: {ms:7.2f} ms",
                    flush=True,
                )


if __name__ == "__main__":
    main()
