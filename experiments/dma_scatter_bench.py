#!/usr/bin/env python
"""Microbenchmark: dynamic-offset DMA placement throughput inside Pallas.

The question that decides whether a bucket/radix sort can beat lax.sort on
TPU: how fast can a kernel move VMEM-resident rows to HBM at *data-dependent*
row offsets?  lax.sort costs ~0.6-0.7 ms per M elements per operand; a
2-pass bucket placement beats it only if a pass (read everything + write
everything at dynamic offsets) runs at a decent fraction of HBM bandwidth
and the per-DMA fixed cost doesn't dominate at ~10-100k descriptors.

Kernel: grid over input blocks of (ROWS, 128) f32; each block is split into
NSUB sub-ranges of ROWS//NSUB rows, each DMA'd to an out row offset read
from a prefetched scalar array (disjoint, precomputed on host — this
measures pure DMA cost, not the bucketing math).
"""
import functools
import time
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)


def make_scatter(n_rows, rows_blk, nsub, interpret=False):
    sub = rows_blk // nsub
    grid = n_rows // rows_blk

    def kernel(off_ref, x_ref, out_ref, sem):
        i = pl.program_id(0)

        def body(j, _):
            dst = off_ref[i * nsub + j]
            cp = pltpu.make_async_copy(
                x_ref.at[pl.ds(j * sub, sub), :],
                out_ref.at[pl.ds(dst, sub), :],
                sem,
            )
            cp.start()
            cp.wait()
            return 0

        jax.lax.fori_loop(0, nsub, body, 0)

    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(
                (rows_blk, 128), lambda i, off: (i, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((n_rows, 128), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )


def timeit(fn, *args, iters=20):
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
    n_rows = 1 << 15  # 32k rows x 128 lanes = 4.19M f32 = 16.8 MB
    x = jnp.asarray(rng.normal(size=(n_rows, 128)).astype(np.float32))
    for rows_blk in (2048, 512):
        for nsub in (1, 4, 16, 64):
            sub = rows_blk // nsub
            n_blocks = n_rows // rows_blk
            # random disjoint destinations at sub-granularity
            perm = rng.permutation(n_rows // sub).astype(np.int32) * sub
            off = jnp.asarray(perm)
            fn = jax.jit(make_scatter(n_rows, rows_blk, nsub, interpret))
            ms = timeit(fn, off, x)
            ndma = n_blocks * nsub
            gbps = (2 * n_rows * 128 * 4) / (ms / 1e3) / 1e9
            print(
                f"blk={rows_blk:5d} nsub={nsub:3d} sub_rows={sub:5d} "
                f"dmas={ndma:6d}: {ms:7.3f} ms  {gbps:6.1f} GB/s "
                f"({ms/ndma*1e3:.2f} us/dma)",
                flush=True,
            )
            # correctness (first config only per blk)
            if nsub == 1 or interpret:
                got = np.asarray(fn(off, x))
                want = np.zeros_like(got)
                for b in range(n_rows // sub):
                    want[perm[b] : perm[b] + sub] = np.asarray(
                        x[b * sub : (b + 1) * sub]
                    )
                np.testing.assert_allclose(got, want)
                print("  correctness OK", flush=True)


if __name__ == "__main__":
    main()
