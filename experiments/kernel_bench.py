#!/usr/bin/env python
"""Isolated timing of the Pallas render fwd/bwd kernels at bench scale.

Builds a synthetic tile-grouped splat layout shaped like bench.py's garden-
scale workload (4293 tiles x ~459 live splats each inside a padded cell
array) and times _render_fwd / _render_bwd alone, so kernel changes can be
iterated without paying the full train-step compile.

Usage: python experiments/kernel_bench.py [chunk] [precision]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from gaussian_splatting_tpu.ops import common as cc
    from gaussian_splatting_tpu.ops import render as R
    from gaussian_splatting_tpu.structs import TILE_PX, TileGrid

    chunk = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    precision = sys.argv[2] if len(sys.argv) > 2 else "bf16"
    bf16 = precision == "bf16"

    H, W = 840, 1296
    grid = TileGrid(H, W)
    n_tiles, x_tiles = grid.tile_count, grid.x_tiles
    depth = 459  # live splats per tile (bench probe: ~1.97M/4293)
    s_live = n_tiles * depth
    s_cap = -(-(4_119_040) // chunk) * chunk  # bench cell count, padded

    rng = np.random.default_rng(0)
    # splat centres inside their tile, plausible conic scales
    tile_of = np.repeat(np.arange(n_tiles), depth)
    tx = tile_of % x_tiles
    ty = tile_of // x_tiles
    u = tx * TILE_PX + rng.uniform(-4, 20, s_live)
    v = ty * TILE_PX + rng.uniform(-4, 20, s_live)
    op = rng.uniform(0.1, 0.9, s_live)
    sa = rng.uniform(1.0, 40.0, s_live)
    sc = rng.uniform(1.0, 40.0, s_live)
    sb = rng.uniform(-0.3, 0.3, s_live) * np.sqrt(sa * sc)
    rgbs = rng.uniform(0, 3.5, (3, s_live))
    feat = np.zeros((cc.FEAT_ROWS, s_cap), np.float32)
    feat[cc.FEAT_U, :s_live] = u
    feat[cc.FEAT_V, :s_live] = v
    feat[cc.FEAT_OPACITY, :s_live] = op
    feat[cc.FEAT_A, :s_live] = sa + 0.25
    feat[cc.FEAT_B, :s_live] = sb
    feat[cc.FEAT_C, :s_live] = sc + 0.25
    feat[cc.FEAT_R : cc.FEAT_B_COL + 1, :s_live] = rgbs
    feat = jnp.asarray(feat)

    starts = jnp.asarray(
        np.concatenate([np.arange(n_tiles) * depth, [s_live]]).astype(
            np.int32
        )
    )

    class L:
        tile_starts = starts
        gaussian_idx = jnp.zeros((s_cap,), jnp.int32)

    meta = R.build_step_meta(L, n_tiles, chunk)
    meta = jax.tree_util.tree_map(jnp.asarray, meta)

    gi = jnp.asarray(
        rng.uniform(-1, 1, (cc.OUT_ROWS, (n_tiles + 1) * 256)), jnp.float32
    )

    def fwd(feat):
        return R._render_fwd(
            feat, meta, n_tiles=n_tiles, x_tiles=x_tiles, chunk=chunk,
            interpret=False, bf16=bf16,
        )

    def bwd(feat, gi):
        return R._render_bwd(
            feat, meta, gi, n_tiles=n_tiles, x_tiles=x_tiles, chunk=chunk,
            interpret=False, bf16=bf16,
        )

    def sync(x):
        return float(jnp.sum(x[0, ::1000]))

    out = fwd(feat)
    sync(out)
    t0 = time.perf_counter()
    reps = 10
    for _ in range(reps):
        out = fwd(feat)
    sync(out)
    fwd_ms = (time.perf_counter() - t0) / reps * 1e3

    g = bwd(feat, gi)
    sync(g)
    t0 = time.perf_counter()
    for _ in range(reps):
        g = bwd(feat, gi)
    sync(g)
    bwd_ms = (time.perf_counter() - t0) / reps * 1e3

    print(
        f"chunk={chunk} precision={precision} s_cap={s_cap} "
        f"live={s_live}: fwd {fwd_ms:.2f} ms  bwd {bwd_ms:.2f} ms"
    )


if __name__ == "__main__":
    main()
