import time, jax, numpy as np
import jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

eps0 = jnp.zeros((), jnp.float32)
def timeit(name, f, args, iters=3):
    c = jax.jit(f).lower(eps0, *args).compile()
    e = c(eps0, *args); float(e)
    t0 = time.perf_counter()
    e = eps0
    for _ in range(iters):
        e = c(e, *args)
    float(e)
    print(f"{name:40s} {(time.perf_counter()-t0)/iters*1e3:9.2f} ms", flush=True)

rng = np.random.default_rng(0)
S = 1 << 23; CAP = 1 << 21
gid_rand = jnp.asarray(rng.integers(0, CAP, S, dtype=np.int32))
gid_sorted = jnp.sort(gid_rand)
grads = jnp.asarray(rng.uniform(0, 1, (16, S)).astype(np.float32))

def scat(idx, flags):
    def f(e, gid, grads):
        out = jnp.zeros((16, CAP + 2), jnp.float32).at[:, gid].add(grads + e, **flags)
        return out.ravel()[0] * 0 + e + 1
    return f
timeit("scatter-add 8M sorted idx", scat(None, {}), (gid_sorted, grads))
timeit("scatter-add 8M sorted idx (hint)", scat(None, dict(indices_are_sorted=True)), (gid_sorted, grads))

# segment_sum with sorted ids
def seg(e, gid, grads):
    out = jax.vmap(lambda g: jax.ops.segment_sum(g, gid, num_segments=CAP + 1, indices_are_sorted=True))(grads + e)
    return out.ravel()[0] * 0 + e + 1
timeit("segment_sum 8M sorted", seg, (gid_sorted, grads))

# sorted-unique scatter at 2M
uq = jnp.asarray(np.arange(CAP, dtype=np.int32))
vals2 = jnp.asarray(rng.uniform(0, 1, (16, CAP)).astype(np.float32))
def scatu(e, uq, vals2):
    out = jnp.zeros((16, CAP + 2), jnp.float32).at[:, uq].add(vals2 + e, indices_are_sorted=True, unique_indices=True)
    return out.ravel()[0] * 0 + e + 1
timeit("scatter-add 2M sorted unique", scatu, (uq, vals2))

# searchsorted 2M queries in 8M sorted array
q = jnp.asarray(np.arange(CAP, dtype=np.int32))
def ss(e, gid, q):
    r = jnp.searchsorted(gid, q + e.astype(jnp.int32), side="right")
    return r.ravel()[0].astype(jnp.float32) * 0 + e + 1
timeit("searchsorted 2M in 8M", ss, (gid_sorted, q))
