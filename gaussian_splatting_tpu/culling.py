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
3. ONE ``lax.sort`` over a single packed int32 key ``tile << z_bits | zq``
   per padded candidate replaces the fp64 key sort
   ``z + tile_idx * (max_z + 1)`` (src/tile_culling.cu:236-237, 327-329);
   invalid cells sink to the tail.  Order is identical whenever quantised
   depths are distinct (zq keeps 8 exponent + (z_bits-8) mantissa bits).

Performance note (the design driver): on TPU, element-wise irregular data
movement (gather / scatter / segment_sum) lowers to a scalar-core loop at
~8-10 ms per million indices, while ``lax.sort`` is a data-oblivious
vectorised network whose cost is dominated by comparator/key work (extra
value operands are nearly free).  Everything here therefore rides ONE big
single-key sort over *padded* candidates; its output IS the rasterizer's
input — the kernels walk the tile-grouped array in 128-aligned windows
with lane masks (ops/render.build_step_meta), so there is no per-tile
alignment pass and no per-splat gather anywhere.
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
# compacted visible gaussian (2 padded cells — most trained splats hit 1-2
# tiles); the big-gaussian tiers admit contiguous segments of the
# area-descending compacted ordering, with per-frame capacities derived
# from splat_capacity in build_splat_layout.
TIER_CELLS = (2, 4, 16, 256, 4096)
# Floor on big-tier capacities so tiny scenes (e.g. the 6-gaussian test
# fixture) still route their large gaussians somewhere.
TIER_MIN = 64
# Sentinel tile id for invalid candidate cells (sorts after any real tile).
SENTINEL = jnp.int32(2**30)
# Sentinel for packed (tile << z_bits | zq) candidate keys: int32 max, so
# the extracted tile (all-ones) sorts after every real tile id.
KEY_SENTINEL = jnp.int32(2**31 - 1)


class SplatLayout(NamedTuple):
    """Static-capacity, tile-grouped, depth-sorted splat list.

    All arrays have static shapes.  The list is the direct output of the
    (tile, z) candidate sort — tile t's splats occupy the contiguous slot
    range [tile_starts[t], tile_starts[t+1]) in front-to-back depth order,
    with NO per-tile alignment padding (the rasterizer walks 128-aligned
    windows of this array and lane-masks each tile's range; see
    ops/render.build_step_meta).

    gaussian_idx : (S,) i32   gaussian id per splat slot (capacity id = pad)
    tile_starts  : (tile_count+1,) i32  slot range boundaries per tile
    tile_counts  : (tile_count,) i32  splats per tile (= diff of starts)
    tile_has_output: (tile_count,) bool  kernel will write this tile's block
                   (false for empty tiles and capacity-truncated tiles)
    num_splats   : () i32   total live splats (before any capacity drop)
    num_visible  : () i32   contributing gaussians this frame (drives the
                   runner's visible_capacity bucket)
    overflow     : () bool  true if work was dropped because a *capacity*
                   limit was hit (visible compaction, candidate tiers,
                   splat capacity) — growing the capacities fixes these
    truncated    : () bool  true if a gaussian's clipped window exceeded
                   TIER_CELLS[-1] cells, so only its leading window cells
                   rendered — no capacity growth can fix this (the runner
                   must not grow the bucket for it)
    """

    gaussian_idx: jax.Array
    tile_starts: jax.Array
    tile_counts: jax.Array
    tile_has_output: jax.Array
    num_splats: jax.Array
    num_visible: jax.Array
    overflow: jax.Array
    truncated: jax.Array


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


def _z_bits_for(n_tiles: int) -> int:
    """Bit split of the packed (tile, z) sort key.

    The key is a single non-negative int32 ``tile << z_bits | zq`` — one
    key halves comparator work vs the reference's fp64 key
    ``z + tile * (max_z + 1)`` (src/tile_culling.cu:236-237) re-expressed
    as a 2-key lexicographic sort.  zq is the top z_bits of the float32 bit
    pattern of z (monotone for z > 0), i.e. depth quantised to
    (z_bits - 8) mantissa bits; equal-key splats composite in arbitrary
    order, which only matters for coincident-depth overlaps.
    """
    tile_bits = max(int(math.ceil(math.log2(n_tiles + 2))), 1)
    return 31 - tile_bits


def _tier_keys(sx, sy, wx, wy, obb, member, zq, k_cells, x_tiles, z_bits):
    """SAT-test up to k_cells window cells for a tier's gaussians.

    Returns (K, M) i32 packed sort keys (tile << z_bits | zq); cells
    outside the window / failing the SAT / of non-member columns hold
    SENTINEL.  Cell enumeration is tile_x outer / tile_y inner like the
    reference loops (tile_culling.cu:159-160).

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
    key = jax.lax.shift_left(ty * x_tiles + tx, jnp.int32(z_bits)) | zq[None, :]
    return jnp.where(hit, key, KEY_SENTINEL)


def _tier_capacities(m_comp: int, splat_capacity: int):
    """Per-frame candidate capacities for the big-gaussian tiers.

    Tier 0 (<= TIER_CELLS[0] cells) admits every compacted visible
    gaussian.  Each later tier's padded candidate contribution is capped at
    splat_capacity//4, bounding the big sort at
    TIER_CELLS[0]*m_comp + (len(TIER_CELLS)-1)/4*splat_capacity entries.
    """
    caps = [m_comp]
    for k in TIER_CELLS[1:]:
        caps.append(min(m_comp, max(TIER_MIN, splat_capacity // (4 * k))))
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
    visible_capacity: int = 0,
):
    """Assign gaussians to tiles and depth-sort per tile.

    Replaces get_sorted_gaussian_list (src/tile_culling.cu:244-340).
    Returns (SplatLayout, feat (R, splat_capacity) or None): per-gaussian
    feature rows are expanded to per-splat columns by CARRYING them as sort
    operands (extra sort operands are nearly free on TPU, while a per-splat
    gather costs ~10-30x more).

    Two sorts total:
    1. a COMPACTION sort over the N capacity slots, keyed by descending
       clipped window area (invisible / empty-window slots last), truncated
       to ``visible_capacity`` columns.  This makes every tier a contiguous
       segment of one ordering (no top_k) and shrinks all downstream
       candidate work from capacity scale to visible scale;
    2. THE candidate sort over the padded tier cells with one packed
       (tile, z) i32 key — its output IS the rasterizer input (the kernels
       walk the tile-grouped array with lane masks, ops/render
       .build_step_meta), so no chunk-alignment spread pass exists.
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

    # per-gaussian quantised depth for the packed sort key: the top z_bits
    # of the float32 bit pattern (monotone for z > 0; invisible/garbage z
    # never reaches a key because `hit` masks it to the sentinel)
    z_bits = _z_bits_for(n_tiles)
    zq = jax.lax.shift_right_logical(
        jax.lax.bitcast_convert_type(
            jnp.maximum(z_camera.astype(jnp.float32), 1e-30), jnp.int32
        ),
        jnp.int32(31 - z_bits),
    )

    # ---- COMPACTION sort: order capacity slots by descending clipped
    # window area (contributing slots first), carrying everything the tier
    # expansion needs.  After truncation to m_comp columns, every tier is a
    # contiguous segment: [0, #area>k) boundaries by simple counts.
    AREA_CLIP = TIER_CELLS[-1] + 2  # above the last tier boundary
    contributes = visible & (area > 0)
    n_vis = jnp.sum(contributes.astype(jnp.int32))
    comp_key = jnp.where(
        contributes, AREA_CLIP - jnp.minimum(area, AREA_CLIP - 1),
        KEY_SENTINEL,
    )
    m_comp = min(n, max(visible_capacity, TIER_MIN)) if visible_capacity \
        else n
    n_rows = 0 if feat_g is None else feat_g.shape[0]
    comp_ops = [
        comp_key, zq, jnp.arange(n, dtype=jnp.int32),
        sx, sy, wx, wy,
    ] + [obb[:, j] for j in range(8)]
    if n_rows:
        comp_ops += [feat_g[r] for r in range(n_rows)]
    comp = jax.lax.sort(
        tuple(jax.lax.optimization_barrier(tuple(comp_ops))),
        num_keys=1, is_stable=False,
    )
    zq_c, gid_c = comp[1][:m_comp], comp[2][:m_comp]
    sx_c, sy_c = comp[3][:m_comp], comp[4][:m_comp]
    wx_c, wy_c = comp[5][:m_comp], comp[6][:m_comp]
    obb_c = jnp.stack([comp[7 + j][:m_comp] for j in range(8)], axis=-1)
    feat_c = None
    if n_rows:
        feat_c = jnp.stack([comp[15 + r][:m_comp] for r in range(n_rows)])
    slot = jnp.arange(m_comp, dtype=jnp.int32)
    in_vis = slot < jnp.minimum(n_vis, m_comp)
    area_c = jnp.where(in_vis, wx_c * wy_c, 0)  # non-increasing (clipped)
    dropped = n_vis > m_comp  # visible-capacity overflow (grow to fix)

    k0 = TIER_CELLS[0]
    caps = _tier_capacities(m_comp, s_cap)

    tier_keys = [
        _tier_keys(sx_c, sy_c, wx_c, wy_c, obb_c, in_vis & (area_c <= k0),
                   zq_c, k0, grid.x_tiles, z_bits)
    ]
    tier_gid = [gid_c]
    tier_feat = [feat_c]
    # boundary[i] = #compacted gaussians with area > TIER_CELLS[i]
    for i, k_cells in enumerate(TIER_CELLS[1:], start=1):
        k_prev = TIER_CELLS[i - 1]
        last_tier = i == len(TIER_CELLS) - 1
        start = jnp.sum((area_c > k_cells).astype(jnp.int32))
        cap_i = caps[i]
        if last_tier:
            # the last tier admits everything larger than the previous tier
            # (one-sided) so gaussians whose window exceeds TIER_CELLS[-1]
            # still render their first k_cells window cells instead of
            # disappearing (and losing all gradient); their tail cells are
            # truncated, which the `truncated` flag below reports
            start = jnp.int32(0)
        sel = lambda arr: jax.lax.dynamic_slice_in_dim(arr, start, cap_i, 0)
        area_i = sel(area_c)
        member = area_i > k_prev
        if not last_tier:
            member &= area_i <= k_cells
        # segment longer than the tier capacity -> tail members dropped
        upper = True if last_tier else (area_c <= k_cells)
        n_member = jnp.sum(
            ((area_c > k_prev) & upper).astype(jnp.int32)
        )
        dropped |= n_member > cap_i
        tier_keys.append(
            _tier_keys(sel(sx_c), sel(sy_c), sel(wx_c), sel(wy_c),
                       jax.lax.dynamic_slice_in_dim(obb_c, start, cap_i, 0),
                       member, sel(zq_c), k_cells, grid.x_tiles, z_bits)
        )
        tier_gid.append(sel(gid_c))
        tier_feat.append(
            None if feat_c is None
            else jax.lax.dynamic_slice_in_dim(feat_c, start, cap_i, 1)
        )
    # gaussians too big for the last tier render only their first
    # TIER_CELLS[-1] window cells (tail cells truncated) — reported
    # separately from `dropped` because no capacity growth can fix it
    truncated = jnp.any(area_c > TIER_CELLS[-1])

    # ---- THE sort, over all padded candidates: one packed (tile, z) i32
    # key, values (gid, feature rows).  gid / features are regular row
    # broadcasts (no per-candidate gathers).
    def flat(arrs):
        return jnp.concatenate([x.reshape(-1) for x in arrs])

    cand_key = flat(tier_keys)
    cand_gid = flat(
        [
            jnp.broadcast_to(g[None, :], t.shape)
            for g, t in zip(tier_gid, tier_keys)
        ]
    )
    cand_feat = [
        flat(
            [
                jnp.broadcast_to(f[r][None, :], t.shape)
                for f, t in zip(tier_feat, tier_keys)
            ]
        )
        for r in range(n_rows)
    ]
    # barrier: without it XLA fuses a copy of the whole SAT/obb producer
    # chain into each sort operand, bloating generated code several-fold
    ops = jax.lax.optimization_barrier(
        tuple([cand_key, cand_gid] + cand_feat)
    )
    sorted1 = jax.lax.sort(ops, num_keys=1, is_stable=False)
    sort_key, sort_gid = sorted1[0], sorted1[1]
    sort_feat = list(sorted1[2:])
    c_cand = sort_key.shape[0]
    sort_tile = jax.lax.shift_right_logical(sort_key, jnp.int32(z_bits))
    num_splats = jnp.sum((sort_tile < n_tiles).astype(jnp.int32))
    overflow = dropped | (num_splats > s_cap)
    if c_cand < s_cap:
        sort_tile = jnp.pad(
            sort_tile, (0, s_cap - c_cand),
            constant_values=int(KEY_SENTINEL) >> z_bits,
        )
        sort_gid = jnp.pad(sort_gid, (0, s_cap - c_cand), constant_values=n)
        sort_feat = [jnp.pad(f, (0, s_cap - c_cand)) for f in sort_feat]
    else:
        sort_tile = sort_tile[:s_cap]
        sort_gid = sort_gid[:s_cap]
        sort_feat = [f[:s_cap] for f in sort_feat]
    valid_slot = sort_tile < n_tiles
    gaussian_idx = jnp.where(valid_slot, sort_gid, n)
    feat = None
    if n_rows:
        feat = jnp.stack(
            [jnp.where(valid_slot, f, 0.0) for f in sort_feat]
        )

    # ---- per-tile boundaries via binary search (n_tiles-scale, cheap)
    tile_ids = jnp.arange(n_tiles + 1, dtype=jnp.int32)
    starts = jnp.searchsorted(sort_tile, tile_ids, side="left").astype(
        jnp.int32
    )
    tile_counts = starts[1:] - starts[:-1]
    tile_has_output = tile_counts > 0

    layout = SplatLayout(
        gaussian_idx=gaussian_idx,
        tile_starts=starts,
        tile_counts=tile_counts,
        tile_has_output=tile_has_output,
        num_splats=num_splats,
        num_visible=n_vis,
        overflow=overflow,
        truncated=truncated,
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
    visible_capacity: int = 0,
) -> SplatLayout:
    """Layout only (no feature carry) — tests and tooling."""
    layout, _ = _layout_impl(
        uv, conic, z_camera, visible, None, grid, mh_dist, splat_capacity,
        chunk, visible_capacity,
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

    The prefix sum is *compensated*: a plain f32 running sum over S+cap
    entries makes the adjacent difference cancel to ~ulp(global prefix),
    a scale-dependent relative error of up to ~10% per gaussian at
    multi-million splat counts with one-signed rows (the reference's
    scatter-add, render_backward.cu:238-282, only ever adds per-gaussian
    terms).  A Fast2Sum residual cumsum (`lo`) is carried alongside and
    both differences are taken before recombining, so the error is bounded
    by the *residual* magnitude, not the global prefix.
    """
    r, s = rows.shape
    valid = gid < cap
    # one packed key: gid*2 for real entries, gid*2+1 for the dummies, so
    # each dummy sorts directly after its gaussian's run (invalid reals key
    # past every dummy)
    key1 = jnp.where(valid, gid * 2, jnp.int32(2**31 - 2))
    keys = jnp.concatenate(
        [key1, jnp.arange(cap, dtype=jnp.int32) * 2 + 1]
    )
    flag = jnp.concatenate(
        [jnp.zeros((s,), jnp.int32), jnp.ones((cap,), jnp.int32)]
    )
    # sanitise: dead-lane grads can be NaN (harmless in the scatter design,
    # fatal in a cumsum)
    rows = jnp.where(valid[None, :], rows, 0.0)
    ops = [keys, flag] + [
        jnp.concatenate([rows[i], jnp.zeros((cap,), rows.dtype)])
        for i in range(r)
    ]
    sorted1 = jax.lax.sort(tuple(ops), num_keys=1, is_stable=False)
    skey, sflag = sorted1[0] >> 1, sorted1[1]
    # one (R, S+cap) cumsum (sublane-vectorised) instead of R separate scans
    vals = jnp.stack(sorted1[2:])
    hi = jnp.cumsum(vals, axis=1)
    # Fast2Sum residual of each running add: err_i = v_i - (hi_i - hi_{i-1})
    # (exact when |hi_{i-1}| >= |v_i|, ~ulp(v_i) otherwise); its cumsum is
    # the small-magnitude correction of the prefix
    hi_prev = jnp.concatenate([jnp.zeros((r, 1), hi.dtype), hi[:, :-1]], 1)
    lo = jnp.cumsum(vals - (hi - hi_prev), axis=1)
    key2 = jnp.where(sflag == 1, skey, SENTINEL)
    sorted2 = jax.lax.sort(
        tuple([key2] + [hi[i] for i in range(r)] + [lo[i] for i in range(r)]),
        num_keys=1, is_stable=False,
    )
    dense_hi = jnp.stack([x[:cap] for x in sorted2[1 : 1 + r]])
    dense_lo = jnp.stack([x[:cap] for x in sorted2[1 + r :]])

    def adj_diff(d):
        prev = jnp.concatenate([jnp.zeros((r, 1), d.dtype), d[:, :-1]], 1)
        return d - prev

    return adj_diff(dense_hi) + adj_diff(dense_lo)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def layout_with_features(
    uv, conic, z_camera, visible, feat_g, grid, mh_dist, splat_capacity,
    chunk, visible_capacity=0,
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
        chunk, visible_capacity,
    )


def _lwf_fwd(uv, conic, z_camera, visible, feat_g, grid, mh_dist,
             splat_capacity, chunk, visible_capacity=0):
    out = _layout_impl(
        uv, conic, z_camera, visible, feat_g, grid, mh_dist, splat_capacity,
        chunk, visible_capacity,
    )
    layout, _ = out
    res = (
        layout.gaussian_idx,
        uv.shape, conic.shape, z_camera.shape, visible.shape,
        feat_g.shape,
    )
    return out, res


def _lwf_bwd(grid, mh_dist, splat_capacity, chunk, visible_capacity, res,
             cot):
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


def sorted_splat_list(layout: SplatLayout, grid: TileGrid, chunk: int = 0):
    """Reference-parity view of the layout: the dense depth-sorted gaussian
    list and the (tile_count+1,) start/end boundaries, as returned by
    get_sorted_gaussian_list (src/tile_culling.cu:244-340).  The layout IS
    this list now (tile-grouped, no alignment padding), so this is a slice.

    Returns numpy arrays (host); for tests/debugging, not the hot path.
    """
    import numpy as np

    del chunk  # layout no longer depends on the rasterizer chunk length
    gid = np.asarray(layout.gaussian_idx)
    starts = np.asarray(layout.tile_starts)
    return gid[: starts[-1]], starts
