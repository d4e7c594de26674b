"""Frustum culling, tile assignment, depth ordering, and splat layout.

This re-expresses the reference's variable-shaped tile-culling pipeline
(src/tile_culling.cu:244-340 ``get_sorted_gaussian_list``) with fully static
shapes so it jit-compiles for TPU:

1. Every gaussian gets an oriented bounding box of its mh_dist-sigma ellipse
   and a clipped candidate tile window, exactly like ``compute_obb``
   (src/tile_culling.cu:69-122).
2. Instead of a dynamic per-gaussian tile loop, candidate (gaussian, tile)
   pairs are produced by a *tiered expansion*: all gaussians enumerate up to
   K1 window cells; the top-M gaussians by window area additionally
   enumerate up to K2/K3 cells.  Invalid cells (outside the window or
   failing the separating-axis test, src/tile_culling.cu:8-66) are masked.
3. One lexicographic ``lax.sort`` over (tile_idx, depth) replaces the fp64
   key sort ``z + tile_idx * (max_z + 1)`` (src/tile_culling.cu:236-237,
   327-329); order is identical whenever depths are distinct.
4. The sorted list is re-scattered into a CHUNK-aligned flat layout so the
   Pallas rasterizer can walk it with a 1-D chunk grid (see ops/render.py).
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from gaussian_splatting_tpu.structs import TILE_PX, TileGrid

# Tiered expansion limits: (max window cells, fraction of capacity admitted).
# Tier 1 admits every gaussian; later tiers admit the top gaussians by
# (clipped) window area.  A gaussian is handled by exactly one tier.
TIER_CELLS = (16, 256, 4096)
TIER_FRACTION = (1.0, 1 / 8, 1 / 64)
# Floor on later-tier capacity so tiny scenes (e.g. the 6-gaussian test
# fixture) still route their large gaussians somewhere.
TIER_MIN = 128


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


def _window(u, v, radius_tiles, x_tiles, y_tiles):
    """Clipped candidate tile window (reference: tile_culling.cu:146-156)."""
    px = jnp.floor(u / TILE_PX).astype(jnp.int32)
    py = jnp.floor(v / TILE_PX).astype(jnp.int32)
    sx = jnp.maximum(0, px - radius_tiles)
    ex = jnp.minimum(x_tiles, px + radius_tiles)
    sy = jnp.maximum(0, py - radius_tiles)
    ey = jnp.minimum(y_tiles, py + radius_tiles)
    wx = jnp.maximum(0, ex - sx)
    wy = jnp.maximum(0, ey - sy)
    return sx, sy, wx, wy


def _tier_candidates(sx, sy, wx, wy, obb, member, k_cells, x_tiles):
    """SAT-test up to k_cells window cells for a tier's gaussians.

    Returns (valid (M, K) bool, tile_id (M, K) i32).  Cell enumeration is
    tile_x outer / tile_y inner like the reference loops
    (tile_culling.cu:159-160).
    """
    k = jnp.arange(k_cells, dtype=jnp.int32)
    wy_safe = jnp.maximum(wy, 1)
    ix = k[None, :] // wy_safe[:, None]
    iy = k[None, :] % wy_safe[:, None]
    tx = sx[:, None] + ix
    ty = sy[:, None] + iy
    in_window = k[None, :] < (wx * wy)[:, None]
    hit = in_window & member[:, None] & _split_axis_test(obb[:, None, :], tx, ty)
    return hit, ty * x_tiles + tx


@functools.partial(
    jax.jit,
    static_argnames=("grid", "splat_capacity", "chunk"),
)
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
    """Assign gaussians to tiles, depth-sort per tile, chunk-align.

    Replaces get_sorted_gaussian_list (src/tile_culling.cu:244-340).
    """
    n = uv.shape[0]
    n_tiles = grid.tile_count
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

    obb, radius_tiles = _obb_and_radius(u, v, a, b, c, mh_dist)
    sx, sy, wx, wy = _window(u, v, radius_tiles, grid.x_tiles, grid.y_tiles)
    area = jnp.where(visible, wx * wy, 0)

    k1, k2, k3 = TIER_CELLS
    m2 = min(n, max(TIER_MIN, int(n * TIER_FRACTION[1])))
    m3 = min(n, max(TIER_MIN, int(n * TIER_FRACTION[2])))
    s_cap = splat_capacity

    # --- pass 1: SAT masks + per-gaussian counts per tier.  Each gaussian
    # belongs to exactly one tier (by clipped window area); candidates are
    # compacted by an exact count -> cumsum -> scatter before the sort, so
    # the sort runs over splat_capacity keys instead of all N*K candidates
    # (the reference's two-pass count/fill structure,
    # tile_culling.cu:124-242, re-expressed with static shapes).
    all_idx = jnp.arange(n, dtype=jnp.int32)
    big_area, big_idx = jax.lax.top_k(area, m2)
    big_idx = big_idx.astype(jnp.int32)
    huge_idx = big_idx[:m3]
    huge_area = big_area[:m3]

    tiers = []
    v1, t1 = _tier_candidates(
        sx, sy, wx, wy, obb, visible & (area <= k1), k1, grid.x_tiles
    )
    tiers.append((all_idx, v1, t1))
    sel = lambda arr: arr[big_idx]
    v2, t2 = _tier_candidates(
        sel(sx), sel(sy), sel(wx), sel(wy), sel(obb),
        (big_area > k1) & (big_area <= k2), k2, grid.x_tiles,
    )
    tiers.append((big_idx, v2, t2))
    selh = lambda arr: arr[huge_idx]
    v3, t3 = _tier_candidates(
        selh(sx), selh(sy), selh(wx), selh(wy), selh(obb),
        huge_area > k2, k3, grid.x_tiles,
    )
    tiers.append((huge_idx, v3, t3))

    # tier-3 gaussians with windows beyond k3 cells lose their tail cells;
    # gaussians bigger than k1 that miss the top-m2 cut are dropped entirely
    tier_overflow = (jnp.sum((area > k1).astype(jnp.int32)) > m2) | jnp.any(
        (huge_area > k2) & (huge_area > k3)
    )

    counts = jnp.zeros((n,), jnp.int32)
    for idx_t, valid_t, _ in tiers:
        counts = counts.at[idx_t].add(jnp.sum(valid_t, axis=1, dtype=jnp.int32))
    offsets = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts, dtype=jnp.int32)]
    )
    valid_total = offsets[n]
    overflow = tier_overflow | (valid_total > s_cap)

    # --- pass 2: scatter candidates into the compact array
    sort_tile = jnp.full((s_cap,), 2**30, jnp.int32)
    sort_gid = jnp.full((s_cap,), n, jnp.int32)
    for idx_t, valid_t, tile_t in tiers:
        rank = jnp.cumsum(valid_t, axis=1, dtype=jnp.int32) - valid_t
        dest = offsets[idx_t][:, None] + rank
        dest = jnp.where(valid_t, dest, s_cap).reshape(-1)
        sort_tile = sort_tile.at[dest].set(
            tile_t.reshape(-1), mode="drop", unique_indices=True
        )
        sort_gid = sort_gid.at[dest].set(
            jnp.broadcast_to(idx_t[:, None], valid_t.shape).reshape(-1),
            mode="drop", unique_indices=True,
        )

    sort_z = z_camera[jnp.minimum(sort_gid, n - 1)]
    sort_tile, _, sort_gid = jax.lax.sort(
        (sort_tile, sort_z, sort_gid), num_keys=2, is_stable=False
    )

    valid = sort_tile < n_tiles
    sort_tile = jnp.where(valid, sort_tile, n_tiles)

    # per-tile counts and chunk-aligned destination offsets
    ones = valid.astype(jnp.int32)
    tile_counts = jax.ops.segment_sum(ones, sort_tile, num_segments=n_tiles + 1)[
        :n_tiles
    ]
    tile_chunks = -(-tile_counts // chunk)  # ceil
    chunk_offset = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(tile_chunks, dtype=jnp.int32)]
    )
    # rank of each sorted splat within its tile
    start_of_tile = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(tile_counts, dtype=jnp.int32)]
    )
    rank = jnp.arange(s_cap, dtype=jnp.int32) - start_of_tile[sort_tile]
    dest = chunk_offset[sort_tile] * chunk + rank
    dest = jnp.where(valid & (dest < s_cap), dest, s_cap)
    # chunk alignment can inflate past capacity even when valid_total fits
    overflow |= chunk_offset[n_tiles] * chunk > s_cap

    gaussian_idx = jnp.full((s_cap + 1,), n, dtype=jnp.int32)
    gaussian_idx = gaussian_idx.at[dest].set(jnp.where(valid, sort_gid, n))[:s_cap]

    # chunk metadata
    n_chunks = s_cap // chunk
    chunk_ids = jnp.arange(n_chunks, dtype=jnp.int32)
    used_chunks = chunk_offset[n_tiles]
    # tile_of_chunk via inverse of chunk_offset: scatter tile starts, cummax
    marker = jnp.zeros((n_chunks + 1,), jnp.int32).at[chunk_offset[:n_tiles]].max(
        jnp.arange(n_tiles, dtype=jnp.int32)
        * (tile_chunks > 0)  # only tiles that own chunks place markers
    )
    # tiles with zero chunks must not move the marker; cummax over starts
    tile_of_chunk = jax.lax.cummax(marker[:n_chunks])
    tile_of_chunk = jnp.where(chunk_ids < used_chunks, tile_of_chunk, n_tiles)
    chunk_in_tile = chunk_ids - chunk_offset[jnp.minimum(tile_of_chunk, n_tiles - 1)]
    chunk_in_tile = jnp.where(chunk_ids < used_chunks, chunk_in_tile, 0)
    remaining = tile_counts[jnp.minimum(tile_of_chunk, n_tiles - 1)] - chunk_in_tile * chunk
    valid_in_chunk = jnp.clip(remaining, 0, chunk)
    valid_in_chunk = jnp.where(chunk_ids < used_chunks, valid_in_chunk, 0)

    # a tile's block is only written if at least its first chunk is within
    # the (static) chunk array — truncation can only cut the tail tiles
    tile_has_output = (tile_chunks > 0) & (chunk_offset[:n_tiles] < n_chunks)

    return SplatLayout(
        gaussian_idx=gaussian_idx,
        tile_of_chunk=tile_of_chunk,
        chunk_in_tile=chunk_in_tile,
        valid_in_chunk=valid_in_chunk,
        tile_counts=tile_counts,
        tile_has_output=tile_has_output,
        num_splats=valid_total,
        overflow=overflow,
    )


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
