"""Compile-probe adaptive_density_control at reference scale on the chip.

The round-4 refscale run OOM'd COMPILING this executable at capacity 2^21:
(C, 3, 15) / (C, 4) select+copy temps pad their minor dims to the TPU tile
(11.4x / 32x HBM expansion; 21 GB > 15.75 GB).  The trainer now carries
FLAT 1-D leaves through the clone/split loops; this probe confirms the
executable compiles and runs within HBM before committing hours to the run.

    python experiments/adc_compile_probe.py [capacity_log2=21]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

# persistent cache: the probe's (long) ADC compile is the SAME HLO the
# refscale run will request, so this warms it
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

from gaussian_splatting_tpu import trainer as T
from gaussian_splatting_tpu.config import SplatConfig


def main():
    cap = 1 << (int(sys.argv[1]) if len(sys.argv) > 1 else 21)
    cfg = SplatConfig(max_gaussians=4_000_000)
    key = jax.random.PRNGKey(0)
    n = cap // 8
    params = dict(
        xyz=jax.random.normal(key, (cap, 3)) * 2.0,
        rgb=jnp.full((cap, 3), 0.5),
        opacity=jnp.full((cap, 1), 0.3),
        scale=jnp.full((cap, 3), -4.0),
        quaternion=jnp.tile(jnp.array([1.0, 0, 0, 0]), (cap, 1)),
        sh=jnp.zeros((cap, 3, 15)),
    )
    from gaussian_splatting_tpu import optim

    opt = optim.make_optimizer(cfg)
    alive = (jnp.arange(cap) < n)
    state = T.TrainState(
        params=params,
        alive=alive,
        opt_state=opt.init(params),
        uv_grad_accum=jnp.where(
            alive[:, None], 1e-3, 0.0
        ) * jnp.ones((cap, 2)),
        xyz_grad_accum=jnp.zeros((cap, 3)),
        grad_accum_count=alive.astype(jnp.int32) * 5,
    )
    t0 = time.time()
    lowered = T.adaptive_density_control.lower(
        state, jax.random.PRNGKey(1), jnp.float32(1000.0), config=cfg
    )
    compiled = lowered.compile()
    t1 = time.time()
    mem = compiled.memory_analysis()
    print(f"capacity {cap}: compiled in {t1 - t0:.1f}s")
    if mem is not None:
        print(
            "  temp {:.2f} GB  args {:.2f} GB  out {:.2f} GB".format(
                mem.temp_size_in_bytes / 2**30,
                mem.argument_size_in_bytes / 2**30,
                mem.output_size_in_bytes / 2**30,
            )
        )
    for trial in range(3):
        t0 = time.time()
        new_state, stats = compiled(
            state, jax.random.PRNGKey(1), jnp.float32(1000.0)
        )
        stats = jax.device_get(stats)
        t1 = time.time()
        print(
            "  ran in {:.2f}s: deleted {} cloned {} split {} alive {}".format(
                t1 - t0, int(stats["n_deleted"]), int(stats["n_clone"]),
                int(stats["n_split"]), int(stats["n_alive"]),
            )
        )

    # reset_opacity at the same capacity (the other schedule-boundary
    # executable the refscale run compiles; VERDICT r4 item 4)
    t0 = time.time()
    lowered = T.reset_opacity.lower(new_state, config=cfg)
    compiled_r = lowered.compile()
    t1 = time.time()
    mem = compiled_r.memory_analysis()
    print(f"reset_opacity capacity {cap}: compiled in {t1 - t0:.1f}s")
    if mem is not None:
        print(
            "  temp {:.2f} GB  args {:.2f} GB  out {:.2f} GB".format(
                mem.temp_size_in_bytes / 2**30,
                mem.argument_size_in_bytes / 2**30,
                mem.output_size_in_bytes / 2**30,
            )
        )
    t0 = time.time()
    rstate = compiled_r(new_state)
    jax.device_get(rstate.params["opacity"][0])
    print(f"  ran in {time.time() - t0:.2f}s OK")


if __name__ == "__main__":
    main()
