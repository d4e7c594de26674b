#!/usr/bin/env python
"""Device-trace one train step at bench scale and print the per-op cost
breakdown (sorted, aggregated by op name)."""
import glob
import gzip
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    # monkeypatch: capture the step fn & state instead of timing
    import gaussian_splatting_tpu.trainer as T
    from gaussian_splatting_tpu.config import SplatConfig
    from gaussian_splatting_tpu.structs import GaussianScene
    from gaussian_splatting_tpu import geometry as geo
    from gaussian_splatting_tpu import culling as cu
    from gaussian_splatting_tpu.structs import TileGrid

    n = 1_500_000
    H, W = 840, 1296
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
    K = jnp.array(
        [[1100.0, 0, W / 2], [0, 1100.0, H / 2], [0, 0, 1]], jnp.float32
    )
    pose = jnp.eye(4, dtype=jnp.float32)
    gt = jnp.asarray(rng.uniform(0, 1, (H, W, 3)), jnp.float32)
    bg = jnp.zeros(3, jnp.float32)

    # same capacity probe as bench.py
    params = scene.params()
    xyz_cam = np.asarray(geo.transform_points(params["xyz"], pose))
    uv_p = np.asarray(geo.project_points(jnp.asarray(xyz_cam), K))
    sigma = geo.compute_sigma_world(params["quaternion"], params["scale"])
    J = geo.compute_projection_jacobian(jnp.asarray(xyz_cam), K)
    conic = np.asarray(geo.compute_conic(sigma, J, pose))
    grid = TileGrid(H, W)
    vis = np.asarray(
        cu.frustum_visible(
            jnp.asarray(xyz_cam), jnp.asarray(uv_p), (W, H), 0.3, 500.0,
            100.0,
        )
    ) & np.asarray(scene.alive)
    a = conic[:, 0] + 0.25
    b = conic[:, 1] * 0.5
    c = conic[:, 2] + 0.25
    mean = (a + c) * 0.5
    half = np.sqrt((a - c) ** 2 * 0.25 + b * b)
    r_major = 3.0 * np.sqrt(np.maximum(mean + half, 0.0))
    r_minor = 3.0 * np.sqrt(np.maximum(mean - half, 0.0))
    theta = np.where(
        np.abs(b) < 1e-16,
        np.where(a >= c, 0.0, np.pi / 2),
        np.arctan2(mean + half - a, b),
    )
    ext_x = r_major * np.abs(np.cos(theta)) + r_minor * np.abs(np.sin(theta))
    ext_y = r_major * np.abs(np.sin(theta)) + r_minor * np.abs(np.cos(theta))
    lo_x = np.clip(np.floor((uv_p[:, 0] - ext_x) / 16).astype(int), 0, grid.x_tiles)
    hi_x = np.clip(np.floor((uv_p[:, 0] + ext_x) / 16).astype(int) + 1, 0, grid.x_tiles)
    lo_y = np.clip(np.floor((uv_p[:, 1] - ext_y) / 16).astype(int), 0, grid.y_tiles)
    hi_y = np.clip(np.floor((uv_p[:, 1] + ext_y) / 16).astype(int) + 1, 0, grid.y_tiles)
    area = np.where(vis, np.maximum(hi_x - lo_x, 0) * np.maximum(hi_y - lo_y, 0), 0)
    n_visible = int((area > 0).sum())
    members = []
    prev = 0
    for k in cu.TIER_CELLS:
        members.append(int(((area > prev) & (area <= k)).sum()))
        prev = k
    members[-1] += int((area > cu.TIER_CELLS[-1]).sum())
    caps = tuple(
        cu.capacity_bucket(m * 23 // 20 + 1, f)
        for m, f in zip(members, cu.TIER_FLOORS)
    )
    vbucket = cu.capacity_bucket(n_visible * 23 // 20 + 1, 1 << 16)
    config = SplatConfig(
        splat_capacity=1 << 22, chunk=256,
        visible_capacity=min(vbucket, 1 << 21),
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

    tracedir = "/tmp/trace_step"
    import shutil, os
    shutil.rmtree(tracedir, ignore_errors=True)
    with jax.profiler.trace(tracedir):
        for _ in range(3):
            state, info = step(state)
        float(info["loss"])

    # parse the trace proto events
    files = glob.glob(f"{tracedir}/**/*.trace.json.gz", recursive=True)
    if not files:
        print("no trace json found; files:", glob.glob(f"{tracedir}/**/*", recursive=True))
        return
    with gzip.open(files[0], "rt") as f:
        trace = json.load(f)
    events = [
        e for e in trace.get("traceEvents", [])
        if e.get("ph") == "X" and "dur" in e
    ]
    # keep only device-lane events (XLA ops) — heuristics: pid names
    agg = {}
    for e in events:
        name = e.get("name", "?")
        agg.setdefault(name, [0, 0.0])
        agg[name][0] += 1
        agg[name][1] += e["dur"] / 1e3  # us -> ms
    rows = sorted(agg.items(), key=lambda kv: -kv[1][1])
    total = sum(v[1] for _, v in rows)
    print(f"total traced op time: {total:.1f} ms over 3 steps")
    print("      total  per-step")
    shown = 0.0
    for name, (cnt, ms) in rows[:90]:
        # NOTE: ms is the summed duration across ALL occurrences; per-step
        # is total/3 regardless of cnt (an op appearing once in the trace
        # ran once across the 3 steps, NOT once per step)
        print(f"{ms:9.2f}  {ms/3:9.2f} ms  x{cnt:3d}  {name[:100]}")
        shown += ms
    rest = total - shown
    print(f"rest (below top-90): {rest:.2f} total, {rest/3:.2f}/step over "
          f"{max(len(rows)-90, 0)} distinct names")


if __name__ == "__main__":
    main()
