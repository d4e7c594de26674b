import time, functools, jax, numpy as np
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

eps0 = jnp.zeros((), jnp.float32)
def timeit(name, f, args, iters=4):
    t0 = time.time()
    c = jax.jit(f).lower(eps0, *args).compile()
    ct = time.time() - t0
    e = c(eps0, *args); float(e)
    t0 = time.perf_counter()
    e = eps0
    for _ in range(iters):
        e = c(e, *args)
    float(e)
    print(f"{name:34s} {(time.perf_counter()-t0)/iters*1e3:9.2f} ms (compile {ct:.0f}s)", flush=True)

rng = np.random.default_rng(0)
# sort operand-count scaling at 8M
sz = 1 << 23
key = jnp.asarray(rng.integers(0, 4300, sz, dtype=np.int32))
zf = jnp.asarray(rng.uniform(0, 100, sz).astype(np.float32))
vals = [jnp.asarray(rng.uniform(0, 1, sz).astype(np.float32)) for _ in range(9)]

def sort3(e, key, zf, v0):
    r = jax.lax.sort((key + e.astype(jnp.int32), zf, v0), num_keys=2)
    return r[0].ravel()[0].astype(jnp.float32) * 0 + e + 1
timeit("sort 8M 2key+1val", sort3, (key, zf, vals[0]))

def sort12(e, key, zf, *vs):
    r = jax.lax.sort((key + e.astype(jnp.int32), zf) + vs, num_keys=2)
    return r[0].ravel()[0].astype(jnp.float32) * 0 + e + 1
timeit("sort 8M 2key+9val", sort12, (key, zf) + tuple(vals))

def sort17(e, key, *vs):
    r = jax.lax.sort((key + e.astype(jnp.int32),) + vs + vs[:7], num_keys=1)
    return r[0].ravel()[0].astype(jnp.float32) * 0 + e + 1
timeit("sort 8M 1key+16val", sort17, (key,) + tuple(vals))

# Pallas dynamic-offset DMA: gather (16, chunk) blocks from HBM at arbitrary lane offsets
FEAT = 16; SCAP = 1 << 23; CH = 256
feat = jnp.asarray(rng.uniform(0, 1, (FEAT, SCAP)).astype(np.float32))
n_chunks = SCAP // CH
starts = jnp.asarray(np.sort(rng.integers(0, SCAP - CH, n_chunks)).astype(np.int32))

def dyn_kernel(starts_ref, feat_hbm, out_ref, scratch, sem):
    w = pl.program_id(0)
    s = starts_ref[w]
    dma = pltpu.make_async_copy(feat_hbm.at[:, pl.ds(s, CH)], scratch, sem)
    dma.start()
    dma.wait()
    out_ref[:] = scratch[:] * 2.0

@functools.partial(jax.jit, static_argnames=())
def dyn_gather(starts, feat):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_chunks,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((FEAT, CH), lambda w, s: (0, w), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((FEAT, CH), jnp.float32), pltpu.SemaphoreType.DMA(())],
    )
    return pl.pallas_call(
        dyn_kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((FEAT, SCAP), jnp.float32),
    )(starts, feat)

def dg(e, starts, feat):
    out = dyn_gather(starts, feat + e)
    return out.ravel()[0] * 0 + e + 1
timeit("pallas dyn-DMA 32k chunks 8M", dg, (starts, feat))
