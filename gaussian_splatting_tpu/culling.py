"""Frustum culling, tile assignment, depth ordering, and splat layout.

This re-expresses the reference's variable-shaped tile-culling pipeline
(src/tile_culling.cu:244-340 ``get_sorted_gaussian_list``) with fully static
shapes so it jit-compiles for TPU:

1. Every gaussian gets an oriented bounding box of its mh_dist-sigma ellipse
   and a clipped candidate tile window, exactly like ``compute_obb``
   (src/tile_culling.cu:69-122).
2. Instead of a dynamic per-gaussian tile loop, candidate (gaussian, tile)
   pairs are produced by a *tiered expansion*: gaussians are routed by
   clipped window area into tiers with K in (4, 16, 256, 4096) padded cells;
   invalid cells (outside the window or failing the separating-axis test,
   src/tile_culling.cu:8-66) key to a sentinel.
3. ONE lexicographic ``lax.sort`` over all padded (tile_idx, depth, id)
   candidates replaces the fp64 key sort ``z + tile_idx * (max_z + 1)``
   (src/tile_culling.cu:236-237, 327-329); invalid cells sink to the tail.
   Order is identical whenever depths are distinct.

Performance note (the design driver): on TPU, element-wise irregular data
movement (gather / scatter / segment_sum) lowers to a scalar-core loop at
~8-10 ms per million indices, while ``lax.sort`` is a data-oblivious
vectorised network at ~2-3 ms per million elements carrying several operands.
Everything here therefore rides one big sort over *padded* candidates; the
only per-splat gather left is the final chunk-aligned regroup (one gather),
plus the feature gather in the renderer.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from gaussian_splatting_tpu.structs import TILE_PX, TileGrid

# Tier cell widths: a gaussian whose clipped window has at most K cells is
# handled by the first tier with capacity left.  Tier 0 admits every
# gaussian (4 padded cells); the big-gaussian tiers admit the largest
# gaussians by window area, with per-frame capacities derived from
# splat_capacity in build_splat_layout.
TIER_CELLS = (4, 16, 256, 4096)
# Floor on big-tier capacities so tiny scenes (e.g. the 6-gaussian test
# fixture) still route their large gaussians somewhere.
TIER_MIN = 64
# Sentinel tile id for invalid candidate cells (sorts after any real tile).
SENTINEL = jnp.int32(2**30)


class SplatLayout(NamedTuple):
    """Static-capacity, depth-sorted, chunk-aligned splat list.

    All arrays have static shapes; `chunk` is the rasterizer chunk length.

    gaussian_idx : (S,) i32   gaussian id per splat slot (capacity id = pad)
    tile_of_chunk: (S/chunk,) i32   owning tile per chunk (tile_count = pad)
    chunk_in_tile: (S/chunk,) i32   position of the chunk within its tile
    valid_in_chunk: (S/chunk,) i32  number of live splats in the chunk
    tile_counts  : (tile_count,) i32  splats per tile
    tile_has_output: (tile_count,) bool  kernel will write this tile's block
                   (false for empty tiles and capacity-truncated tiles)
    num_splats   : () i32   total live splats (before any capacity drop)
    overflow     : () bool  true if work was dropped (capacity/tier limits)
    """

    gaussian_idx: jax.Array
    tile_of_chunk: jax.Array
    chunk_in_tile: jax.Array
    valid_in_chunk: jax.Array
    tile_counts: jax.Array
    tile_has_output: jax.Array
    num_splats: jax.Array
    overflow: jax.Array


def frustum_visible(
    xyz_camera: jax.Array,
    uv: jax.Array,
    grid_wh: tuple,
    near_thresh: float,
    far_thresh: float,
    cull_mask_padding: float,
) -> jax.Array:
    """Visibility mask; the complement of the reference's culling_mask
    (splat_py/rasterize.py:33-49).  `far_thresh=inf` reproduces the depth
    renderer's no-far-cull behaviour (splat_py/depth.py:30)."""
    width, height = grid_wh
    z = xyz_camera[:, 2]
    u, v = uv[:, 0], uv[:, 1]
    culled = (z < near_thresh) | (z > far_thresh)
    culled |= (u < -cull_mask_padding) | (u > width + cull_mask_padding)
    culled |= (v < -cull_mask_padding) | (v > height + cull_mask_padding)
    return ~culled


def _obb_and_radius(u, v, a, b, c, mh_dist):
    """Ellipse OBB corners and tile search radius per gaussian.

    Mirrors compute_obb (src/tile_culling.cu:69-122): a/b/c are the
    *regularised* 2D covariance entries (a = conic0+0.25, b = conic1/2,
    c = conic2+0.25).  Returns obb (N, 8) packed
    [tlx,tly,trx,try,blx,bly,brx,bry] and radius_tiles (N,) i32.
    """
    mean = (a + c) * 0.5
    half = jnp.sqrt((a - c) * (a - c) * 0.25 + b * b)
    lam1 = mean + half
    lam2 = mean - half
    r_major = mh_dist * jnp.sqrt(jnp.maximum(lam1, 0.0))
    r_minor = mh_dist * jnp.sqrt(jnp.maximum(lam2, 0.0))

    theta = jnp.where(
        jnp.abs(b) < 1e-16,
        jnp.where(a >= c, 0.0, math.pi / 2),
        jnp.arctan2(lam1 - a, b),
    )
    ct, st = jnp.cos(theta), jnp.sin(theta)
    obb = jnp.stack(
        [
            -r_major * ct + r_minor * st + u,
            -r_major * st - r_minor * ct + v,
            r_major * ct + r_minor * st + u,
            r_major * st - r_minor * ct + v,
            -r_major * ct - r_minor * st + u,
            -r_major * st + r_minor * ct + v,
            r_major * ct - r_minor * st + u,
            r_major * st + r_minor * ct + v,
        ],
        axis=-1,
    )
    radius_tiles = jnp.ceil(r_major / TILE_PX).astype(jnp.int32) + 1
    return obb, radius_tiles


def _split_axis_test(obb, tile_x, tile_y):
    """Vectorised separating-axis test of OBBs vs 16px tiles.

    obb: (..., 8); tile_x/tile_y: (...) i32 tile coordinates.
    Mirrors split_axis_test (src/tile_culling.cu:8-66).
    """
    left = tile_x.astype(obb.dtype) * TILE_PX
    right = left + TILE_PX
    top = tile_y.astype(obb.dtype) * TILE_PX
    bottom = top + TILE_PX

    xs = obb[..., 0::2]
    ys = obb[..., 1::2]
    # axis 0: X
    ok = ~((jnp.min(xs, -1) > right) | (jnp.max(xs, -1) < left))
    # axis 1: Y
    ok &= ~((jnp.min(ys, -1) > bottom) | (jnp.max(ys, -1) < top))

    def axis_overlap(ax, ay, p0x, p0y, p1x, p1y):
        tl = ax * left + ay * top
        tr = ax * right + ay * top
        bl = ax * left + ay * bottom
        br = ax * right + ay * bottom
        tmin = jnp.minimum(jnp.minimum(tl, tr), jnp.minimum(bl, br))
        tmax = jnp.maximum(jnp.maximum(tl, tr), jnp.maximum(bl, br))
        o0 = ax * p0x + ay * p0y
        o1 = ax * p1x + ay * p1y
        omin = jnp.minimum(o0, o1)
        omax = jnp.maximum(o0, o1)
        return ~((tmin > omax) | (tmax < omin))

    # axis 2: OBB major axis (top-right - top-left)
    ok &= axis_overlap(
        obb[..., 2] - obb[..., 0],
        obb[..., 3] - obb[..., 1],
        obb[..., 0],
        obb[..., 1],
        obb[..., 2],
        obb[..., 3],
    )
    # axis 3: OBB minor axis (top-right - bottom-right)
    ok &= axis_overlap(
        obb[..., 2] - obb[..., 6],
        obb[..., 3] - obb[..., 7],
        obb[..., 2],
        obb[..., 3],
        obb[..., 6],
        obb[..., 7],
    )
    return ok


def _window(obb, x_tiles, y_tiles):
    """Clipped candidate tile window from the OBB's axis-aligned bounds.

    The reference enumerates a looser radius-based window
    (tile_culling.cu:146-156) but only SAT-passing tiles are emitted; since
    the SAT's first two axes are exactly this AABB check, shrinking the
    enumeration window to the AABB changes nothing about which tiles hit —
    it only keeps small gaussians in the small-K tiers (the radius window
    is never under 4x4 tiles, which overflowed the tier capacities).
    """
    xs = obb[:, 0::2]
    ys = obb[:, 1::2]
    sx = jnp.clip(
        jnp.floor(jnp.min(xs, axis=1) / TILE_PX).astype(jnp.int32), 0, x_tiles
    )
    ex = jnp.clip(
        jnp.floor(jnp.max(xs, axis=1) / TILE_PX).astype(jnp.int32) + 1,
        0, x_tiles,
    )
    sy = jnp.clip(
        jnp.floor(jnp.min(ys, axis=1) / TILE_PX).astype(jnp.int32), 0, y_tiles
    )
    ey = jnp.clip(
        jnp.floor(jnp.max(ys, axis=1) / TILE_PX).astype(jnp.int32) + 1,
        0, y_tiles,
    )
    wx = jnp.maximum(0, ex - sx)
    wy = jnp.maximum(0, ey - sy)
    return sx, sy, wx, wy


def _tier_tiles(sx, sy, wx, wy, obb, member, k_cells, x_tiles):
    """SAT-test up to k_cells window cells for a tier's gaussians.

    Returns (K, M) i32 tile ids; cells outside the window / failing the SAT
    / of non-member columns hold SENTINEL.  Cell enumeration is tile_x outer
    / tile_y inner like the reference loops (tile_culling.cu:159-160).

    The cell axis is the MAJOR axis on purpose: (M, K) arrays with K ≪ 128
    get catastrophic TPU layouts (the lane dim underfills), which blew up
    generated code ~20x and runtime; (K, M) keeps the big M on lanes.
    """
    k = jnp.arange(k_cells, dtype=jnp.int32)
    wy_safe = jnp.maximum(wy, 1)
    ix = k[:, None] // wy_safe[None, :]
    iy = k[:, None] % wy_safe[None, :]
    tx = sx[None, :] + ix
    ty = sy[None, :] + iy
    in_window = k[:, None] < (wx * wy)[None, :]
    hit = in_window & member[None, :] & _split_axis_test(obb[None, :, :], tx, ty)
    return jnp.where(hit, ty * x_tiles + tx, SENTINEL)


def _tier_capacities(n: int, splat_capacity: int):
    """Per-frame candidate capacities for the big-gaussian tiers.

    Tier 0 (<=4 cells) admits every gaussian.  Each later tier's padded
    candidate contribution is capped at splat_capacity//4, bounding the
    big sort at 4N + 0.75*splat_capacity entries.
    """
    caps = [n]
    for k in TIER_CELLS[1:]:
        caps.append(min(n, max(TIER_MIN, splat_capacity // (4 * k))))
    return tuple(caps)


def _layout_impl(
    uv: jax.Array,
    conic: jax.Array,
    z_camera: jax.Array,
    visible: jax.Array,
    feat_g,  # (R, N) per-gaussian feature rows carried through the sorts
    grid: TileGrid,
    mh_dist: float,
    splat_capacity: int,
    chunk: int,
):
    """Assign gaussians to tiles, depth-sort per tile, chunk-align.

    Replaces get_sorted_gaussian_list (src/tile_culling.cu:244-340).
    Returns (SplatLayout, feat (R, splat_capacity) or None): per-gaussian
    feature rows are expanded to chunk-aligned per-splat columns by CARRYING
    them as sort operands (extra sort operands are nearly free on TPU,
    while a per-splat gather costs ~10-30x more).
    """
    n = uv.shape[0]
    n_tiles = grid.tile_count
    s_cap = splat_capacity
    u, v = uv[:, 0], uv[:, 1]
    a = conic[:, 0] + 0.25
    b = conic[:, 1] * 0.5
    c = conic[:, 2] + 0.25

    # NaN tripwire: the reference hard-exits on non-finite camera xyz
    # (splat_py/tile_culling.py:15-18); here non-finite entries are treated
    # as invisible so the sort keys stay well ordered.
    finite = jnp.isfinite(u) & jnp.isfinite(v) & jnp.isfinite(z_camera)
    finite &= jnp.isfinite(a) & jnp.isfinite(b) & jnp.isfinite(c)
    visible = visible & finite

    u = jnp.where(finite, u, 0.0)
    v = jnp.where(finite, v, 0.0)
    a = jnp.where(finite, a, 1.0)
    b = jnp.where(finite, b, 0.0)
    c = jnp.where(finite, c, 1.0)
    # barrier: stops XLA re-fusing the caller's per-gaussian geometry chain
    # (sigma/J/conic einsums, feature packing) into every consumer below
    # (code-size and runtime blowup from duplicated producers)
    if feat_g is None:
        u, v, a, b, c, z_camera, visible = jax.lax.optimization_barrier(
            (u, v, a, b, c, z_camera, visible)
        )
    else:
        u, v, a, b, c, z_camera, visible, feat_g = (
            jax.lax.optimization_barrier(
                (u, v, a, b, c, z_camera, visible, feat_g)
            )
        )

    obb, _ = _obb_and_radius(u, v, a, b, c, mh_dist)
    sx, sy, wx, wy = _window(obb, grid.x_tiles, grid.y_tiles)
    area = jnp.where(visible, wx * wy, 0)

    k0 = TIER_CELLS[0]
    caps = _tier_capacities(n, s_cap)

    # Big gaussians (window > k0 cells), largest first.  Tier membership is
    # then a contiguous segment of this ordering: descending area means all
    # tier-i members precede tier-(i-1) members, so each tier takes a
    # dynamic_slice of static capacity at its boundary.
    n_big_total = jnp.sum((area > k0).astype(jnp.int32))
    m_big = min(n, max(TIER_MIN, sum(caps[1:])))
    big_area, big_idx = jax.lax.top_k(area, m_big)
    big_idx = big_idx.astype(jnp.int32)

    n_rows = 0 if feat_g is None else feat_g.shape[0]
    tier_tiles = [
        _tier_tiles(sx, sy, wx, wy, obb, visible & (area <= k0), k0,
                    grid.x_tiles)
    ]
    tier_gid = [jnp.arange(n, dtype=jnp.int32)]
    tier_feat = [feat_g]
    dropped = n_big_total > m_big
    # boundary[i] = #gaussians with area > TIER_CELLS[i]
    for i, k_cells in enumerate(TIER_CELLS[1:], start=1):
        k_prev = TIER_CELLS[i - 1]
        last_tier = i == len(TIER_CELLS) - 1
        start = jnp.sum((big_area > k_cells).astype(jnp.int32))
        cap_i = caps[i]
        if last_tier:
            # the last tier admits everything larger than the previous tier
            # (one-sided) so gaussians whose window exceeds TIER_CELLS[-1]
            # still render their first k_cells window cells instead of
            # disappearing (and losing all gradient); their tail cells are
            # truncated, which the overflow flag below reports
            start = jnp.int32(0)
        idx_i = jax.lax.dynamic_slice(big_idx, (start,), (cap_i,))
        area_i = jax.lax.dynamic_slice(big_area, (start,), (cap_i,))
        member = area_i > k_prev
        if not last_tier:
            member &= area_i <= k_cells
        # segment longer than the tier capacity -> tail members dropped
        upper = True if last_tier else (big_area <= k_cells)
        n_member = jnp.sum(
            ((big_area > k_prev) & upper).astype(jnp.int32)
        )
        dropped |= n_member > cap_i
        sel = lambda arr: arr[idx_i]
        tier_tiles.append(
            _tier_tiles(sel(sx), sel(sy), sel(wx), sel(wy), sel(obb),
                        member, k_cells, grid.x_tiles)
        )
        tier_gid.append(idx_i)
        tier_feat.append(None if feat_g is None else feat_g[:, idx_i])
    # gaussians too big for the last tier render only their first
    # TIER_CELLS[-1] window cells (tail cells truncated)
    dropped |= jnp.any(big_area > TIER_CELLS[-1])

    # ---- SORT 1 over all padded candidates: keys (tile, z), values
    # (gid, feature rows).  z / gid / features are regular row broadcasts
    # (no per-candidate gathers).
    def flat(arrs):
        return jnp.concatenate([x.reshape(-1) for x in arrs])

    cand_tile = flat(tier_tiles)
    cand_gid = flat(
        [
            jnp.broadcast_to(g[None, :], t.shape)
            for g, t in zip(tier_gid, tier_tiles)
        ]
    )
    cand_z = flat(
        [
            jnp.broadcast_to(z_camera[g][None, :], t.shape)
            for g, t in zip(tier_gid, tier_tiles)
        ]
    )
    cand_feat = [
        flat(
            [
                jnp.broadcast_to(f[r][None, :], t.shape)
                for f, t in zip(tier_feat, tier_tiles)
            ]
        )
        for r in range(n_rows)
    ]
    # barrier: without it XLA fuses a copy of the whole SAT/obb producer
    # chain into each sort operand, bloating generated code several-fold
    ops = jax.lax.optimization_barrier(
        tuple([cand_tile, cand_z, cand_gid] + cand_feat)
    )
    sorted1 = jax.lax.sort(ops, num_keys=2, is_stable=False)
    sort_tile, sort_gid = sorted1[0], sorted1[2]
    sort_feat = list(sorted1[3:])
    c_cand = sort_tile.shape[0]
    num_splats = jnp.sum((sort_tile < n_tiles).astype(jnp.int32))
    overflow = dropped | (num_splats > s_cap)
    if c_cand < s_cap:
        sort_tile = jnp.pad(sort_tile, (0, s_cap - c_cand),
                            constant_values=2**30)
        sort_gid = jnp.pad(sort_gid, (0, s_cap - c_cand), constant_values=n)
        sort_feat = [jnp.pad(f, (0, s_cap - c_cand)) for f in sort_feat]
    else:
        sort_tile = sort_tile[:s_cap]
        sort_gid = sort_gid[:s_cap]
        sort_feat = [f[:s_cap] for f in sort_feat]
    sort_gid = jnp.where(sort_tile < n_tiles, sort_gid, n)

    # ---- per-tile boundaries via binary search (n_tiles-scale, cheap)
    tile_ids = jnp.arange(n_tiles + 1, dtype=jnp.int32)
    starts = jnp.searchsorted(sort_tile, tile_ids, side="left").astype(
        jnp.int32
    )
    tile_counts = starts[1:] - starts[:-1]
    start_of_tile = starts[:-1]

    tile_chunks = -(-tile_counts // chunk)  # ceil
    chunk_offset = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(tile_chunks, dtype=jnp.int32)]
    )
    # chunk alignment can inflate past capacity even when num_splats fits
    overflow |= chunk_offset[n_tiles] * chunk > s_cap

    # ---- chunk metadata (n_chunks-scale, cheap)
    n_chunks = s_cap // chunk
    chunk_ids = jnp.arange(n_chunks, dtype=jnp.int32)
    used_chunks = chunk_offset[n_tiles]
    # tile_of_chunk via inverse of chunk_offset: scatter tile starts, cummax
    marker = jnp.zeros((n_chunks + 1,), jnp.int32).at[chunk_offset[:n_tiles]].max(
        jnp.arange(n_tiles, dtype=jnp.int32)
        * (tile_chunks > 0)  # only tiles that own chunks place markers
    )
    tile_of_chunk = jax.lax.cummax(marker[:n_chunks])
    tile_of_chunk = jnp.where(chunk_ids < used_chunks, tile_of_chunk, n_tiles)
    toc_safe = jnp.minimum(tile_of_chunk, n_tiles - 1)
    chunk_in_tile = chunk_ids - chunk_offset[toc_safe]
    chunk_in_tile = jnp.where(chunk_ids < used_chunks, chunk_in_tile, 0)
    remaining = tile_counts[toc_safe] - chunk_in_tile * chunk
    valid_in_chunk = jnp.clip(remaining, 0, chunk)
    valid_in_chunk = jnp.where(chunk_ids < used_chunks, valid_in_chunk, 0)

    # a tile's block is only written if at least its first chunk is within
    # the (static) chunk array — truncation can only cut the tail tiles
    tile_has_output = (tile_chunks > 0) & (chunk_offset[:n_tiles] < n_chunks)

    # ---- SORT 2: spread the tile-sorted splats into chunk-aligned slots.
    # Every destination in [0, used_chunks*chunk) is covered exactly once —
    # real splats go to chunk_base[tile] + rank_in_tile, and per-tile gap
    # dummies fill the chunk-padding tail — so sorting by destination IS the
    # spread (no per-splat gather/scatter).
    #
    # dest_i = i + shift[tile_i] with shift[t] = chunk_base[t] - start[t]
    # (non-decreasing in t), realised as a step function over sorted slots
    # via a tiny scatter + cummax.
    chunk_base = chunk_offset[:n_tiles] * chunk
    shift = chunk_base - start_of_tile  # (n_tiles,) non-decreasing
    m = jnp.zeros((s_cap + 1,), jnp.int32).at[
        jnp.minimum(start_of_tile, s_cap)
    ].max(shift, mode="drop")
    shift_step = jax.lax.cummax(m[:s_cap])
    slot = jnp.arange(s_cap, dtype=jnp.int32)
    real_valid = sort_tile < n_tiles
    dest_real = slot + shift_step
    dest_real = jnp.where(
        real_valid & (dest_real < s_cap), dest_real, SENTINEL
    )
    # gap dummies: tile t owns gap_t = chunks*chunk - count padding slots
    gap = tile_chunks * chunk - tile_counts  # (n_tiles,), in [0, chunk)
    j = jnp.arange(chunk, dtype=jnp.int32)
    dest_gap = (chunk_base + tile_counts)[:, None] + j[None, :]
    gap_ok = (j[None, :] < gap[:, None]) & (dest_gap < s_cap)
    dest_gap = jnp.where(gap_ok, dest_gap, SENTINEL).reshape(-1)

    keys2 = jnp.concatenate([dest_real, dest_gap])
    gid2 = jnp.concatenate(
        [sort_gid, jnp.full((n_tiles * chunk,), n, jnp.int32)]
    )
    feat2 = [
        jnp.concatenate([f, jnp.zeros((n_tiles * chunk,), f.dtype)])
        for f in sort_feat
    ]
    sorted2 = jax.lax.sort(
        tuple([keys2, gid2] + feat2), num_keys=1, is_stable=False
    )
    ok2 = sorted2[0][:s_cap] < SENTINEL
    gaussian_idx = jnp.where(ok2, sorted2[1][:s_cap], n)
    feat = None
    if n_rows:
        feat = jnp.stack([jnp.where(ok2, f[:s_cap], 0.0) for f in sorted2[2:]])

    layout = SplatLayout(
        gaussian_idx=gaussian_idx,
        tile_of_chunk=tile_of_chunk,
        chunk_in_tile=chunk_in_tile,
        valid_in_chunk=valid_in_chunk,
        tile_counts=tile_counts,
        tile_has_output=tile_has_output,
        num_splats=num_splats,
        overflow=overflow,
    )
    return layout, feat


def build_splat_layout(
    uv: jax.Array,
    conic: jax.Array,
    z_camera: jax.Array,
    visible: jax.Array,
    grid: TileGrid,
    mh_dist: float,
    splat_capacity: int,
    chunk: int,
) -> SplatLayout:
    """Layout only (no feature carry) — tests and tooling."""
    layout, _ = _layout_impl(
        uv, conic, z_camera, visible, None, grid, mh_dist, splat_capacity,
        chunk,
    )
    return layout


def reduce_rows_by_gid(rows: jax.Array, gid: jax.Array, cap: int) -> jax.Array:
    """Sum per-splat rows (R, S) into per-gaussian rows (R, cap).

    This is the transpose of the feature expansion — the replacement for a
    scatter-add (which lowers to a ~100ms/M-index scalar loop on TPU).
    All-sort formulation: group by gid (sort 1), running-sum, then compact
    one per-gid total to its dense slot (sort 2) and difference:

      1. sort (gid, rows...) with one zero-valued DUMMY entry per gaussian
         keyed to sort after its real entries;
      2. cumulative sum along the sorted axis — each dummy now holds the
         inclusive prefix total up to and including its gaussian's run;
      3. sort dummies to the front by gid (unique keys -> dense positions)
         and take adjacent differences: out[g] = csum@dummy_g - csum@dummy_{g-1}.
    """
    r, s = rows.shape
    valid = gid < cap
    key1 = jnp.where(valid, gid, SENTINEL)
    flag = jnp.concatenate(
        [jnp.zeros((s,), jnp.int32), jnp.ones((cap,), jnp.int32)]
    )
    keys = jnp.concatenate([key1, jnp.arange(cap, dtype=jnp.int32)])
    # sanitise: dead-lane grads can be NaN (harmless in the scatter design,
    # fatal in a cumsum)
    rows = jnp.where(valid[None, :], rows, 0.0)
    ops = [keys, flag] + [
        jnp.concatenate([rows[i], jnp.zeros((cap,), rows.dtype)])
        for i in range(r)
    ]
    sorted1 = jax.lax.sort(tuple(ops), num_keys=2, is_stable=False)
    skey, sflag = sorted1[0], sorted1[1]
    # one (R, S+cap) cumsum (sublane-vectorised) instead of R separate scans
    csum = jnp.cumsum(jnp.stack(sorted1[2:]), axis=1)
    key2 = jnp.where((sflag == 1) & (skey < SENTINEL), skey, SENTINEL)
    sorted2 = jax.lax.sort(
        tuple([key2] + [csum[i] for i in range(r)]),
        num_keys=1, is_stable=False,
    )
    dense = jnp.stack([x[:cap] for x in sorted2[1:]])  # (R, cap)
    prev = jnp.concatenate(
        [jnp.zeros((r, 1), dense.dtype), dense[:, :-1]], axis=1
    )
    return dense - prev


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def layout_with_features(
    uv, conic, z_camera, visible, feat_g, grid, mh_dist, splat_capacity,
    chunk,
):
    """(layout, feat): tile assignment + per-splat feature expansion.

    Differentiable in ``feat_g`` only (R, N) -> (R, splat_capacity); the
    discrete tile assignment gives no gradient to uv/conic/z (matching the
    reference, where the splat list is built outside autograd,
    splat_py/rasterize.py:84).  The custom VJP turns the expansion's
    transpose (a scatter-add over splat->gaussian ids) into the all-sort
    reduction ``reduce_rows_by_gid``.
    """
    return _layout_impl(
        uv, conic, z_camera, visible, feat_g, grid, mh_dist, splat_capacity,
        chunk,
    )


def _lwf_fwd(uv, conic, z_camera, visible, feat_g, grid, mh_dist,
             splat_capacity, chunk):
    out = _layout_impl(
        uv, conic, z_camera, visible, feat_g, grid, mh_dist, splat_capacity,
        chunk,
    )
    layout, _ = out
    res = (
        layout.gaussian_idx,
        uv.shape, conic.shape, z_camera.shape, visible.shape,
        feat_g.shape,
    )
    return out, res


def _lwf_bwd(grid, mh_dist, splat_capacity, chunk, res, cot):
    import numpy as np

    gidx, uv_s, conic_s, z_s, vis_s, feat_s = res
    _, feat_cot = cot
    g_feat_g = reduce_rows_by_gid(feat_cot, gidx, feat_s[1])
    return (
        jnp.zeros(uv_s, jnp.float32),
        jnp.zeros(conic_s, jnp.float32),
        jnp.zeros(z_s, jnp.float32),
        np.zeros(vis_s, jax.dtypes.float0),
        g_feat_g,
    )


layout_with_features.defvjp(_lwf_fwd, _lwf_bwd)


def sorted_splat_list(layout: SplatLayout, grid: TileGrid, chunk: int):
    """Reference-parity view of the layout: the dense depth-sorted gaussian
    list and the (tile_count+1,) start/end boundaries, as returned by
    get_sorted_gaussian_list (src/tile_culling.cu:244-340).

    Returns numpy arrays (host); for tests/debugging, not the hot path.
    """
    import numpy as np

    gid = np.asarray(layout.gaussian_idx)
    counts = np.asarray(layout.tile_counts)
    n_tiles = grid.tile_count
    starts = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
    out = np.empty(starts[-1], dtype=np.int32)
    chunk_offsets = np.concatenate(
        [[0], np.cumsum(-(-counts // chunk))]
    ).astype(np.int32)
    for t in range(n_tiles):
        s = chunk_offsets[t] * chunk
        out[starts[t] : starts[t + 1]] = gid[s : s + counts[t]]
    return out, starts
