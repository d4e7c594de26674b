#!/usr/bin/env python
"""Is a lane-axis cumsum cheaper than the triangular-ones matmul inside a
Pallas TPU kernel?  Mimics the render kernel's prefix-transmittance step:
(256, CHUNK) loma -> exclusive prefix along CHUNK."""
import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

P = 256


def timeit(fn, *args, iters=20):
    out = fn(*args)
    jax.device_get(out.ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(out.ravel()[0])
    return (time.perf_counter() - t0) / iters * 1e3


def mk_kernel(mode, chunk):
    def kernel(x_ref, o_ref):
        x = x_ref[:]
        if mode == "matmul":
            row = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
            col = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
            u_strict = (row < col).astype(x.dtype)
            o_ref[:] = jax.lax.dot_general(
                x, u_strict, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        elif mode == "cumsum":
            o_ref[:] = jnp.cumsum(x, axis=1) - x  # exclusive
        elif mode == "assoc":
            o_ref[:] = (
                jax.lax.associative_scan(jnp.add, x, axis=1) - x
            )

    return kernel


def run(mode, chunk, steps):
    f = pl.pallas_call(
        mk_kernel(mode, chunk),
        grid=(steps,),
        in_specs=[
            pl.BlockSpec((P, chunk), lambda s: (0, s),
                         memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((P, chunk), lambda s: (0, s),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((P, chunk * steps), jnp.float32),
    )
    return jax.jit(f)


def main():
    rng = jax.random.PRNGKey(0)
    total = 1 << 20  # splat-capacity scale
    for chunk in (256, 512):
        steps = total // chunk
        x = jax.random.uniform(rng, (P, total), jnp.float32)
        for mode in ("matmul", "cumsum", "assoc"):
            try:
                ms = timeit(run(mode, chunk, steps), x)
                print(f"{mode:8s} chunk={chunk}: {ms:7.2f} ms", flush=True)
            except Exception as e:
                print(f"{mode:8s} chunk={chunk}: FAIL {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
