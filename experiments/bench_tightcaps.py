"""bench.py variant: exact-fit tier capacities (steady-state tight buckets)
to measure the sort-width savings before wiring a runner policy.
Usage: python experiments/bench_tightcaps.py [headroom_pct]"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
BASELINE_ITER_MS = 185_000 / 7000.0


def main():
    hr = int(sys.argv[1]) if len(sys.argv) > 1 else 105
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from gaussian_splatting_tpu import trainer as T
    from gaussian_splatting_tpu.config import SplatConfig
    from gaussian_splatting_tpu.structs import GaussianScene
    from gaussian_splatting_tpu import culling as cu

    n = 1_500_000
    H, W = 840, 1296
    rng = np.random.default_rng(0)
    xyz = rng.uniform(-8, 8, (n, 3)).astype(np.float32) + np.array([0, 0, 12.0], np.float32)
    rgb = rng.uniform(0, 1, (n, 3)).astype(np.float32) / 0.2821
    opacity = np.zeros((n, 1), np.float32)
    scale = np.log(rng.uniform(0.005, 0.03, (n, 3))).astype(np.float32)
    quat = rng.normal(size=(n, 4)).astype(np.float32)
    scene = GaussianScene.create(xyz, rgb, opacity, scale, quat, capacity=1 << 21)
    K = jnp.array([[1100.0, 0, W / 2], [0, 1100.0, H / 2], [0, 0, 1]], jnp.float32)
    pose = jnp.eye(4, dtype=jnp.float32)
    gt = jnp.asarray(rng.uniform(0, 1, (H, W, 3)), jnp.float32)
    bg = jnp.zeros(3, jnp.float32)

    # tight caps straight from the dumped area distribution
    area = np.load("/tmp/area.npy")
    n_visible = int((area > 0).sum())
    members = []
    prev = 0
    for k in cu.TIER_CELLS:
        members.append(int(((area > prev) & (area <= k)).sum()))
        prev = k
    members[-1] += int((area > cu.TIER_CELLS[-1]).sum())
    caps = tuple(
        max((m * hr // 100 + 7) // 8 * 8, f)
        for m, f in zip(members, cu.TIER_FLOORS)
    )
    vcap = max((n_visible * hr // 100 + 127) // 128 * 128, 1 << 16)
    cells = sum(k * cp for k, cp in zip(cu.TIER_CELLS, caps))
    print(f"hr={hr} caps={caps} cells={cells} vcap={vcap}", file=sys.stderr)
    config = SplatConfig(
        splat_capacity=1 << 22, chunk=256,
        visible_capacity=min(vcap, 1 << 21),
        tier_capacities=caps,
    )
    state = T.init_train_state(scene, config)

    def step(state):
        return T.train_step(
            state, gt, K, pose, bg, config=config, camera_hw=(H, W),
            n_sh_band=0, use_background=False,
        )

    state, info = step(state)
    float(info["loss"])
    if bool(info["overflow"]):
        print("WARNING: overflow", file=sys.stderr)

    n_iters = 10
    t0 = time.perf_counter()
    for _ in range(n_iters):
        state, info = step(state)
    float(info["loss"])
    ms = (time.perf_counter() - t0) / n_iters * 1e3
    print(json.dumps(dict(metric="tightcaps_iter_ms", value=round(ms, 2),
                          hr=hr, cells=cells,
                          vs_baseline=round(BASELINE_ITER_MS / ms, 4))))


main()
