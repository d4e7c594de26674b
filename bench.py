#!/usr/bin/env python
"""Benchmark: full training-step throughput at garden-7k scale.

Runs the complete jitted train step (render fwd -> L1+SSIM loss -> backward
-> Adam) on a synthetic 1.5M-gaussian scene at 1296x840 (Mip-NeRF-360
garden at 1/4 resolution) on one TPU chip, and prints ONE json line.

Baseline: the reference trains garden-7k in 3:05 on an RTX 4090
(README.md:26) = 26.4 ms per training iteration at ~1.5M gaussians.
vs_baseline = baseline_ms / our_ms (>1 means faster than the reference).
"""

import json
import sys
import time

import numpy as np

BASELINE_ITER_MS = 185_000 / 7000.0  # 26.43 ms


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from gaussian_splatting_tpu import trainer as T
    from gaussian_splatting_tpu.config import SplatConfig
    from gaussian_splatting_tpu.structs import GaussianScene

    n = 1_500_000
    H, W = 840, 1296
    # splat capacity: the scene produces ~2.25M tile-gaussian pairs; a 4M
    # bucket holds them with headroom (the runner sizes this per scene and
    # re-jits when a bucket is crossed; overflow is flagged).  The visible
    # bucket likewise mirrors what the runner would settle on.
    config = SplatConfig(
        splat_capacity=1 << 22, chunk=256, visible_capacity=1 << 20
    )

    rng = np.random.default_rng(0)
    xyz = rng.uniform(-8, 8, (n, 3)).astype(np.float32) + np.array(
        [0, 0, 12.0], np.float32
    )
    rgb = rng.uniform(0, 1, (n, 3)).astype(np.float32) / 0.2821
    opacity = np.zeros((n, 1), np.float32)
    scale = np.log(rng.uniform(0.005, 0.03, (n, 3))).astype(np.float32)
    quat = rng.normal(size=(n, 4)).astype(np.float32)
    scene = GaussianScene.create(
        xyz, rgb, opacity, scale, quat, capacity=1 << 21
    )
    state = T.init_train_state(scene, config)

    K = jnp.array(
        [[1100.0, 0, W / 2], [0, 1100.0, H / 2], [0, 0, 1]], jnp.float32
    )
    pose = jnp.eye(4, dtype=jnp.float32)
    gt = jnp.asarray(rng.uniform(0, 1, (H, W, 3)), jnp.float32)
    bg = jnp.zeros(3, jnp.float32)

    def step(state):
        return T.train_step(
            state, gt, K, pose, bg, config=config, camera_hw=(H, W),
            n_sh_band=0, use_background=False,
        )

    state, info = step(state)  # compile
    # NOTE: jax.block_until_ready does not reliably block on the tunneled
    # axon backend; a scalar device_get is the only trustworthy sync.
    float(info["loss"])
    if bool(info["overflow"]):
        print(
            f"WARNING: bench layout overflowed (visible="
            f"{int(info['num_visible'])}, splats={int(info['num_splats'])})",
            file=sys.stderr,
        )

    n_iters = 10
    t0 = time.perf_counter()
    for _ in range(n_iters):
        state, info = step(state)
    float(info["loss"])
    ms = (time.perf_counter() - t0) / n_iters * 1e3

    print(
        json.dumps(
            dict(
                metric="train_iter_ms_garden_scale",
                value=round(ms, 2),
                unit="ms",
                vs_baseline=round(BASELINE_ITER_MS / ms, 4),
            )
        )
    )


if __name__ == "__main__":
    main()
