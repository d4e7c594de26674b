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

from gaussian_splatting_tpu.ops import common as _cc
from gaussian_splatting_tpu.structs import TILE_PX, TileGrid

# Tier cell widths: gaussians are routed by clipped window area into the
# tier whose K bounds it (tier i holds areas in (TIER_CELLS[i-1],
# TIER_CELLS[i]]).  Every tier is a contiguous segment of the
# area-descending compacted ordering; per-tier capacities come from
# config.tier_capacities (the runner right-sizes them from the observed
# per-tier member counts) or a splat_capacity-derived default.  Rungs sit
# on the common wx*wy window products (4, 6, 9=3x3, 12=3x4, 16, 20, 24 …)
# so within-tier cell padding stays ~1.1x where the mass of a trained
# scene lives — sort cost AND kernel window count are linear in the
# padded cell count, so tier fill is step time (round-4 refscale run:
# the coarse 13-rung ladder padded 1.34M live splats to 3.44M cells;
# the area-9 gap alone cost ~170k cells and the 1024/4096 caps ~450k).
TIER_CELLS = (
    1, 2, 3, 4, 6, 8, 9, 12, 16, 20, 24, 32, 40, 48, 64, 96, 128, 192,
    256, 512, 1024, 2048, 4096,
)
# Floor on tier capacities: small-cell tiers keep at least 256 cells so
# tiny scenes (the 6-gaussian test fixture) route their gaussians
# somewhere, and every tier can always hold a handful of members (the
# DEFAULT budget split leaves big tiers only ~20 members at
# splat_capacity 2^17).  Big-K tiers floor at 8 members, NOT 32: a
# 32-member floor on the 1024..4096 tiers alone would burn ~230k padded
# cells on tiers that hold a few dozen transient gaussians (measured on
# the round-4 refscale run), and a floor-overflow only drops those
# frames' largest windows until the runner's next rebucket grows the
# explicit cap past the floor.
TIER_MIN = 64
TIER_FLOORS = tuple(
    max(256 // k, 32 if k <= 64 else 8) for k in TIER_CELLS
)
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
    tier_members : (len(TIER_CELLS),) i32  gaussians routed to each tier
                   (drives the runner's per-tier capacity buckets)
    overflow     : () bool  true if work was dropped because a *capacity*
                   limit was hit (visible compaction or a tier capacity) —
                   growing the capacities fixes these
    truncated    : () i32   number of candidate tile cells DROPPED because
                   a gaussian's clipped window exceeded TIER_CELLS[-1]
                   cells (only the leading window cells rendered) — no
                   capacity growth can fix this (the runner must not grow
                   the bucket for it); nonzero means truncation happened,
                   and the count bounds the lost work per frame
    """

    gaussian_idx: jax.Array
    tile_starts: jax.Array
    tile_counts: jax.Array
    tile_has_output: jax.Array
    num_splats: jax.Array
    num_visible: jax.Array
    tier_members: jax.Array
    overflow: jax.Array
    truncated: jax.Array


def frustum_visible_rows(
    u: jax.Array,
    v: jax.Array,
    z: jax.Array,
    grid_wh: tuple,
    near_thresh: float,
    far_thresh: float,
    cull_mask_padding: float,
) -> jax.Array:
    """Visibility mask from (N,) rows; the complement of the reference's
    culling_mask (splat_py/rasterize.py:33-49).  `far_thresh=inf`
    reproduces the depth renderer's no-far-cull (splat_py/depth.py:30)."""
    width, height = grid_wh
    culled = (z < near_thresh) | (z > far_thresh)
    culled |= (u < -cull_mask_padding) | (u > width + cull_mask_padding)
    culled |= (v < -cull_mask_padding) | (v > height + cull_mask_padding)
    return ~culled


def frustum_visible(
    xyz_camera: jax.Array,
    uv: jax.Array,
    grid_wh: tuple,
    near_thresh: float,
    far_thresh: float,
    cull_mask_padding: float,
) -> jax.Array:
    """(N, C)-array wrapper over ``frustum_visible_rows``."""
    return frustum_visible_rows(
        uv[:, 0], uv[:, 1], xyz_camera[:, 2], grid_wh,
        near_thresh, far_thresh, cull_mask_padding,
    )


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
    (z_bits - 8) MANTISSA bits — the quantisation is therefore
    RESOLUTION-DEPENDENT: more tiles -> fewer z bits.  At 1-2 MP frames
    (garden: 4.3k tiles -> 13 tile bits -> 10 mantissa bits) the relative
    depth resolution is ~0.1%, comfortably under splat extent; equal-key
    splats composite in arbitrary (unstable-sort) order, which only
    matters for near-coincident-depth overlaps.  When a frame is big
    enough that mantissa bits would drop below _MIN_Z_MANTISSA (>~8 MP),
    the layout switches to a true 2-key lexicographic sort (full-precision
    zq as a second key operand) instead of silently coarsening depth
    (ADVICE r2).
    """
    tile_bits = max(int(math.ceil(math.log2(n_tiles + 2))), 1)
    return 31 - tile_bits


# below this many mantissa bits in the packed key, the candidate sort
# spends one extra operand on an exact second depth key instead
_MIN_Z_MANTISSA = 10


def _tier_keys(sx, sy, wx, wy, obb, member, zq, k_cells, x_tiles, z_bits):
    """SAT-test up to k_cells window cells for a tier's gaussians.

    Returns ((K, M) i32 packed sort keys (tile << z_bits | zq), (K, M) i32
    tx, (K, M) i32 ty); cells outside the window / failing the SAT / of
    non-member columns hold KEY_SENTINEL in the key.  Cell enumeration is
    tile_x outer / tile_y inner like the reference loops
    (tile_culling.cu:159-160).  tx/ty are returned so the bf16 packing can
    carry TILE-LOCAL splat centres (see _layout_impl).

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
    return jnp.where(hit, key, KEY_SENTINEL), tx, ty


def capacity_bucket(want: int, floor: int = 8) -> int:
    """Smallest quarter-step power-of-two bucket (4, 5, 6 or 7 times 2^k)
    at or above ``want``; EIGHTH steps above 2^14 and SIXTEENTH steps
    above 2^18.  Coarse enough that runner re-bucketing (and so the
    minutes-long TPU sort recompiles) stays rare — the recompile cadence
    is set by RELATIVE growth, so finer absolute steps on wide buckets
    don't change it — fine enough that the padded splat-list width stays
    within a few % of the live work where the cells actually are (sort
    cost is linear in that width; a spare 12% of a 500k-member tier is
    60k dead sort cells every step).  The deterministic growth of a
    seeded run replays the same bucket sequence, so the persistent
    compilation cache absorbs the extra recompiles on reruns."""
    want = max(int(want), int(floor), 1)
    if want >= 1 << 18:
        steps: tuple = tuple(range(16, 32))
    elif want >= 1 << 14:
        steps = (8, 9, 10, 11, 12, 13, 14, 15)
    else:
        steps = (4, 5, 6, 7)
    c = 1
    while True:
        for m in steps:
            if m * c >= want:
                return m * c
        c <<= 1


def capacity_want(members: int) -> int:
    """Member-capacity target from an observed per-tier peak: the peak
    plus variance-scaled headroom.  Large populations are relatively
    stable across views (their view-to-view jitter is ~sqrt(m)), so they
    get a small relative margin; sparse tiers are volatile and keep a
    generous one.  Replaces the flat 1.15x margin, which burned ~10% of
    the candidate-sort width on the two biggest tiers alone."""
    m = int(members)
    return m + max(int(0.04 * m), int(3.0 * math.sqrt(m)) + 2)


def _compacted_width(n: int, visible_capacity: int) -> int:
    """Number of compacted columns the layout keeps after the area sort."""
    return min(n, max(visible_capacity, TIER_MIN)) if visible_capacity else n


def _tier_capacities(
    m_comp: int, splat_capacity: int, explicit=None
):
    """Per-frame member capacities for each tier.

    ``explicit`` (config.tier_capacities, runner-bucketed from observed
    member counts) wins; otherwise a conservative default is derived from
    splat_capacity: tier 0 (1-cell windows — the bulk of a trained scene)
    admits every compacted gaussian, and the remaining tiers share a
    2x splat_capacity CELL budget weighted toward small windows
    (cells_i ∝ k_i^-0.5, so member caps fall off as k^-1.5) — matching
    the area distribution of real scenes, where nearly all members live
    at k <= 16 (refscale peaks: 86k @ k=4, 67k @ k=12, 30 @ k=4096).  An
    equal-cells-per-tier split starves the crowded small tiers as the
    ladder gains rungs.  All capacities are floored at TIER_FLOORS (tiny
    test scenes) and clipped to m_comp.
    """
    if explicit is not None:
        if len(explicit) != len(TIER_CELLS):
            raise ValueError(
                f"tier_capacities needs {len(TIER_CELLS)} entries "
                f"(one per {TIER_CELLS}), got {len(explicit)}"
            )
        return tuple(
            min(m_comp, max(f, int(c)))
            for f, c in zip(TIER_FLOORS, explicit)
        )
    caps = [m_comp]
    ks = TIER_CELLS[1:]
    z = sum(k ** -0.5 for k in ks)
    budget = 2 * splat_capacity
    for k, f in zip(ks, TIER_FLOORS[1:]):
        caps.append(min(m_comp, max(f, int(budget / (z * k ** 1.5)))))
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
    tier_capacities=None,
    precision: str = "f32",
    carry_gid: bool = True,
):
    """Assign gaussians to tiles and depth-sort per tile.

    Replaces get_sorted_gaussian_list (src/tile_culling.cu:244-340).
    Returns (SplatLayout, feat (R, S) or None, aux): per-gaussian feature
    rows are expanded to per-splat columns by CARRYING them as sort
    operands (extra sort operands are nearly free on TPU, while a per-splat
    gather costs ~10-30x more).  S = sum(TIER_CELLS[i] * cap_i) rounded up
    to a whole number of chunks: the sorted candidate array IS the splat
    list (full width — no truncation pass; the kernels only walk live
    tile ranges, so the sentinel tail costs nothing).

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

    With ``precision="bf16"`` (and a full >= 6-row feature bundle) the
    feature rows ride BOTH sorts as bf16 pairs packed into i32 operands
    (sort cost is linear in operand count; see PERF.md).  The splat centre
    rows are packed TILE-LOCALLY — (u - cell_tile_origin) fits bf16's 8
    mantissa bits at ~0.1% of the splat's own extent, while global pixel
    coordinates would lose whole pixels — and the global centre is
    rebuilt after the sort from the key's tile id.  Only the compaction
    sort keeps u, v in f32 (the tile WINDOW recomputation needs sub-pixel
    global precision; everything else there tolerates the ~0.4% bf16
    rounding that kernel_precision="bf16" already accepts elsewhere).
    """
    # uv / conic accepted as (N, C) arrays (tests, reference-parity API) or
    # as component tuples (the hot path — avoids minor-dim column pulls)
    if isinstance(uv, tuple):
        u, v = uv
    else:
        u, v = uv[:, 0], uv[:, 1]
    if isinstance(conic, tuple):
        ca, cb, cc = conic
    else:
        ca, cb, cc = conic[:, 0], conic[:, 1], conic[:, 2]
    n = u.shape[0]
    n_tiles = grid.tile_count
    s_cap = splat_capacity
    a = ca + 0.25
    b = cb * 0.5
    c = cc + 0.25

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
    # CONTRACT with ops.render.splat_features / ops.render_sh
    # .sh_splat_features / ops.depth.depth_features: rows 0..5 of a
    # full feature bundle are (u, v, opacity, a+0.25, b/2, c+0.25) —
    # identical to the regularised values above for finite entries.
    # Overriding them with the sanitised copies lets the post-compaction
    # geometry be RECOMPUTED from the carried feature rows instead of
    # carrying obb + window through the sort (TPU sort compile time
    # grows quadratically with operand count).  Shorter bundles (tests,
    # tooling) fall back to carrying u, v, a, b, c explicitly.
    geom_from_feat = feat_g is not None and feat_g.shape[0] >= 6
    if geom_from_feat:
        feat_g = jnp.concatenate(
            [
                jnp.stack([u, v, feat_g[2], a, b, c]),
                feat_g[6:],
            ]
        )
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

    # opacity-aware window shrink: the kernels (and the reference,
    # src/render.cu per-pixel skip) treat alpha = op * exp(-q/2) below
    # ALPHA_SKIP as exactly zero, so any cell whose whole tile lies beyond
    # the iso-alpha ellipse {q = 2 ln(op / ALPHA_SKIP)} provably
    # contributes nothing (forward OR backward).  Shrinking the mh_dist
    # ellipse to that radius removes those cells from the sorts and the
    # kernel walk with NO change to the rendered image beyond the skip
    # approximation both implementations already make.  Low-opacity
    # gaussians (op ~ 0.05) lose ~40% of their window area; op <=
    # ALPHA_SKIP gaussians are invisible outright.  Only the hot path
    # (full feature bundle, post-sigmoid opacity on row 2) engages it —
    # layout-only calls (tests/tooling golden splat lists) keep the pure
    # mh_dist window.
    if geom_from_feat:
        op_row = feat_g[2]
        q_max = 2.0 * jnp.log(
            jnp.maximum(op_row, 1e-12) * (1.0 / _cc.ALPHA_SKIP)
        )
        mh_eff = jnp.minimum(
            jnp.sqrt(jnp.maximum(q_max, 0.0)), mh_dist
        )
        visible &= op_row > _cc.ALPHA_SKIP
    else:
        mh_eff = mh_dist

    obb, _ = _obb_and_radius(u, v, a, b, c, mh_eff)
    sx, sy, wx, wy = _window(obb, grid.x_tiles, grid.y_tiles)
    area = jnp.where(visible, wx * wy, 0)

    # per-gaussian quantised depth for the packed sort key: the top z_bits
    # of the float32 bit pattern (monotone for z > 0; invisible/garbage z
    # never reaches a key because `hit` masks it to the sentinel).  Very
    # large tile counts leave too few mantissa bits in the packed key, so
    # the candidate sort falls back to an exact 2-key lexicographic sort
    # (see _z_bits_for).
    z_bits = _z_bits_for(n_tiles)
    two_key = (z_bits - 8) < _MIN_Z_MANTISSA
    if two_key:
        z_bits = 31  # zq keeps the full f32 depth ordering
    zq = jax.lax.shift_right_logical(
        jax.lax.bitcast_convert_type(
            jnp.maximum(z_camera.astype(jnp.float32), 1e-30), jnp.int32
        ),
        jnp.int32(31 - z_bits),
    )

    # ---- COMPACTION sort: order capacity slots into tier-bucket groups
    # (largest-window tiers first, contributing slots before empty ones).
    # After truncation to m_comp columns, every tier is a contiguous
    # segment: [0, #area>k) boundaries by simple counts.  Within a tier the
    # order is arbitrary — only the SEGMENTATION matters, so the key
    # quantises area to its tier index, which frees enough low bits to
    # carry zq inside the key (one sort operand fewer; zq is recovered by
    # masking the sorted key).
    contributes = visible & (area > 0)
    n_vis = jnp.sum(contributes.astype(jnp.int32))
    nt = len(TIER_CELLS)
    tier_bits = max(int(math.ceil(math.log2(nt + 2))), 1)
    zc_bits = min(z_bits, 31 - tier_bits)  # only < z_bits on tiny grids
    # ti = #(area > K_i) = tier index of this gaussian (nt for oversize)
    ti = sum(
        ((area > k).astype(jnp.int32)) for k in TIER_CELLS
    )
    if two_key:
        # full-precision zq doesn't fit beside the tier bucket: carry it
        # as its own sort operand instead
        comp_key = jnp.where(contributes, nt - ti, KEY_SENTINEL)
    else:
        comp_key = jnp.where(
            contributes,
            jax.lax.shift_left(nt - ti, jnp.int32(zc_bits))
            | jax.lax.shift_right_logical(zq, jnp.int32(z_bits - zc_bits)),
            KEY_SENTINEL,
        )
    m_comp = _compacted_width(n, visible_capacity)
    n_rows = 0 if feat_g is None else feat_g.shape[0]
    # bf16 operand packing only applies to full bundles whose rows 0..5
    # are the geometry contract (see the override above)
    bf16 = precision == "bf16" and geom_from_feat
    # geometry is recomputed from the carried rows after the sort (see
    # the rows-0..5 override above), so the sort carries no obb/window
    # operands
    comp_ops = [comp_key]
    if two_key:
        comp_ops.append(zq)
    comp_ops.append(jnp.arange(n, dtype=jnp.int32))
    # the DC hot-path bundle (exactly 9 rows: u,v,op,a,b,c,r,g,b — SH
    # rides precomputed per-view colour here, depth is 7 rows, per-pixel
    # SH >= 18) additionally packs its three colour rows into ONE
    # 11/11/10-bit operand: both big sorts drop a full operand
    rgb10 = bf16 and n_rows == 9
    if bf16:
        # u, v stay f32 (window recompute); rows 2.. ride as bf16 pairs
        if rgb10:
            packs_g = _pack_rows(
                [feat_g[r] for r in range(2, 6)], True
            ) + [_pack_rgb10(feat_g[6], feat_g[7], feat_g[8])]
        else:
            packs_g = _pack_rows(
                [feat_g[r] for r in range(2, n_rows)], True
            )
        comp_ops += [feat_g[0], feat_g[1]] + packs_g
    elif n_rows:
        comp_ops += [feat_g[r] for r in range(n_rows)]
    if not geom_from_feat:
        comp_ops += [u, v, a, b, c]
    comp = jax.lax.sort(
        tuple(jax.lax.optimization_barrier(tuple(comp_ops))),
        num_keys=1, is_stable=False,
    )
    co = 1 if two_key else 0  # operand offset for the explicit zq carry
    if two_key:
        zq_c = comp[1][:m_comp]
    else:
        zq_c = jax.lax.shift_left(
            comp[0][:m_comp] & jnp.int32((1 << zc_bits) - 1),
            jnp.int32(z_bits - zc_bits),
        )
    gid_c = comp[1 + co][:m_comp]
    feat_c = None
    if bf16:
        packed_tail = [p[:m_comp] for p in comp[4 + co :]]
        if rgb10:
            rest = _unpack_rows(packed_tail[:-1], 4, True) + list(
                _unpack_rgb10(packed_tail[-1])
            )
        else:
            rest = _unpack_rows(packed_tail, n_rows - 2, True)
        feat_c = jnp.stack(
            [comp[2 + co][:m_comp], comp[3 + co][:m_comp]] + rest
        )
    elif n_rows:
        feat_c = jnp.stack(
            [comp[2 + co + r][:m_comp] for r in range(n_rows)]
        )
    if geom_from_feat:
        u_c, v_c = feat_c[0], feat_c[1]
        a_c, b_c, c_c = feat_c[3], feat_c[4], feat_c[5]
    else:
        u_c, v_c, a_c, b_c, c_c = (
            comp[2 + co + n_rows + j][:m_comp] for j in range(5)
        )
    if geom_from_feat:
        # same opacity-aware shrink as the pre-compaction window, from the
        # carried opacity row (bf16-roundtripped under kernel_precision=
        # "bf16" — the same rounding the carried a/b/c geometry already
        # accepts for the window recompute)
        q_max_c = 2.0 * jnp.log(
            jnp.maximum(feat_c[2], 1e-12) * (1.0 / _cc.ALPHA_SKIP)
        )
        mh_eff_c = jnp.minimum(
            jnp.sqrt(jnp.maximum(q_max_c, 0.0)), mh_dist
        )
    else:
        mh_eff_c = mh_dist
    obb_c, _ = _obb_and_radius(u_c, v_c, a_c, b_c, c_c, mh_eff_c)
    sx_c, sy_c, wx_c, wy_c = _window(obb_c, grid.x_tiles, grid.y_tiles)
    slot = jnp.arange(m_comp, dtype=jnp.int32)
    n_vis_c = jnp.minimum(n_vis, m_comp).astype(jnp.int32)
    in_vis = slot < n_vis_c
    area_c = jnp.where(in_vis, wx_c * wy_c, 0)  # tier-grouped (clipped)
    dropped = n_vis > m_comp  # visible-capacity overflow (grow to fix)

    caps = _tier_capacities(m_comp, s_cap, tier_capacities)

    # tier i covers areas (TIER_CELLS[i-1], TIER_CELLS[i]] — a contiguous
    # segment [#(area > K_i), #(area > K_{i-1})) of the area-descending
    # compacted ordering; gt[i] = #compacted gaussians with area > K_i
    gt = [
        jnp.sum((area_c > k).astype(jnp.int32)) for k in TIER_CELLS
    ]
    tier_keys, tier_tx, tier_ty, tier_gid, tier_feat = [], [], [], [], []
    tier_zq: list = []
    tier_starts, tier_members = [], []
    for i, k_cells in enumerate(TIER_CELLS):
        k_prev = 0 if i == 0 else TIER_CELLS[i - 1]
        last_tier = i == len(TIER_CELLS) - 1
        cap_i = caps[i]
        if last_tier:
            # the last tier admits everything larger than the previous tier
            # (one-sided) so gaussians whose window exceeds TIER_CELLS[-1]
            # still render their first k_cells window cells instead of
            # disappearing (and losing all gradient); their tail cells are
            # truncated, which the `truncated` flag below reports
            start = jnp.int32(0)
            n_member = gt[i - 1]
        else:
            start = gt[i].astype(jnp.int32)
            prev_gt = n_vis_c if i == 0 else gt[i - 1]
            n_member = prev_gt - gt[i]
        tier_starts.append(start)
        tier_members.append(n_member)
        # segment longer than the tier capacity -> tail members dropped
        dropped |= n_member > cap_i
        sel = lambda arr: jax.lax.dynamic_slice_in_dim(arr, start, cap_i, 0)
        area_i = sel(area_c)
        # area_c is zero at non-contributing columns (and only group-wise
        # ordered within a tier segment), so > k_prev also excludes them
        # in tier 0 (k_prev = 0)
        member = area_i > k_prev
        if not last_tier:
            member &= area_i <= k_cells
        zq_i = sel(zq_c)
        key_i, tx_i, ty_i = _tier_keys(
            sel(sx_c), sel(sy_c), sel(wx_c), sel(wy_c),
            jax.lax.dynamic_slice_in_dim(obb_c, start, cap_i, 0),
            member, zq_i * 0 if two_key else zq_i, k_cells, grid.x_tiles,
            0 if two_key else z_bits,
        )
        tier_keys.append(key_i)
        if two_key:
            tier_zq.append(jnp.broadcast_to(zq_i[None, :], key_i.shape))
        tier_tx.append(tx_i)
        tier_ty.append(ty_i)
        tier_gid.append(sel(gid_c))
        tier_feat.append(
            None if feat_c is None
            else jax.lax.dynamic_slice_in_dim(feat_c, start, cap_i, 1)
        )
    # gaussians too big for the last tier render only their first
    # TIER_CELLS[-1] window cells (tail cells truncated) — reported
    # separately from `dropped` because no capacity growth can fix it.
    # The COUNT of dropped cells (not just a flag) bounds the lost work:
    # the runner accumulates it so a long run can quantify the quality
    # cost of the reference-analogous cap (splat_py/tile_culling.py:20
    # max_tiles_per_gaussian=1024 drops the same tail silently).
    truncated = jnp.sum(jnp.maximum(area_c - TIER_CELLS[-1], 0))

    # ---- THE sort, over all padded candidates: one packed (tile, z) i32
    # key, values (gid, cell position, feature rows).  gid / features are
    # regular row broadcasts (no per-candidate gathers); the carried cell
    # position records the sort permutation so the VJP can invert it with
    # one sort (see _reduce_splat_grads).
    def flat(arrs):
        flats = tuple(x.reshape(-1) for x in arrs)
        # materialise the per-tier pieces: without this barrier XLA fuses
        # each tier's whole producer chain (SAT/key/broadcast/bitcasts)
        # into the concat's one loop fusion, whose scoped-VMEM working set
        # can blow past the 16 MB limit at some capacity tuples (observed
        # in the wild: a 26-operand s32[3990912] fusion wanting 19.4 MB —
        # a hard COMPILE error that killed a training run at a rebucket)
        flats = jax.lax.optimization_barrier(flats)
        return jnp.concatenate(flats)

    cand_key = flat(tier_keys)
    # the hot training path (rasterize._render_dc) never reads per-splat
    # gaussian ids — gradients reach gaussians by inverting the carried
    # sort permutations (_reduce_splat_grads), not by id — so it skips
    # this operand entirely (sort cost is linear in operand count).
    # Tests / tooling (sorted_splat_list) keep it.
    cand_gid = None
    if carry_gid:
        cand_gid = flat(
            [
                jnp.broadcast_to(g[None, :], t.shape)
                for g, t in zip(tier_gid, tier_keys)
            ]
        )
    cand_pos = jnp.arange(cand_key.shape[0], dtype=jnp.int32)

    def cand_row(r):
        return flat(
            [
                jnp.broadcast_to(f[r][None, :], t.shape)
                for f, t in zip(tier_feat, tier_keys)
            ]
        )

    half_px = (TILE_PX - 1) / 2
    if bf16:
        # splat centres ride TILE-LOCALLY as one bf16 pair (rebuilt from
        # the key's tile id after the sort); rows 2.. ride as bf16 pairs
        # PACKED ON THE COMPACTED COLUMNS (m_comp scale) and broadcast as
        # i32 rows — packing after the broadcast paid the bitcast/shift
        # chain on every padded cell instead of once per gaussian
        ulo = flat(
            [
                f[0][None, :] - (tx.astype(jnp.float32) * TILE_PX + half_px)
                for f, tx in zip(tier_feat, tier_tx)
            ]
        )
        vlo = flat(
            [
                f[1][None, :] - (ty.astype(jnp.float32) * TILE_PX + half_px)
                for f, ty in zip(tier_feat, tier_ty)
            ]
        )
        # rows 2.. rode the compaction sort as these exact bf16 pairs —
        # reuse them as-is (unpack->repack is the identity on bf16 pairs)
        packed_c = [p[:m_comp] for p in comp[4 + co :]]
        cand_feat = [_pack2_bf16(ulo, vlo)] + [
            flat(
                [
                    jnp.broadcast_to(
                        jax.lax.dynamic_slice_in_dim(
                            p, start, t.shape[1], 0
                        )[None, :],
                        t.shape,
                    )
                    for start, t in zip(tier_starts, tier_keys)
                ]
            )
            for p in packed_c
        ]
    else:
        cand_feat = [cand_row(r) for r in range(n_rows)]
    # barrier: without it XLA fuses a copy of the whole SAT/obb producer
    # chain into each sort operand, bloating generated code several-fold
    keys = [cand_key] + ([flat(tier_zq)] if two_key else [])
    gid_ops = [cand_gid] if carry_gid else []
    ops = jax.lax.optimization_barrier(
        tuple(keys + gid_ops + [cand_pos] + cand_feat)
    )
    sorted1 = jax.lax.sort(
        ops, num_keys=2 if two_key else 1, is_stable=False
    )
    ko = (1 if two_key else 0) + (1 if carry_gid else 0)
    kz_bits = 0 if two_key else z_bits  # tile shift inside the first key
    sort_key = sorted1[0]
    sort_gid = sorted1[ko] if carry_gid else None
    pos_sorted = sorted1[1 + ko]  # (c_cand,) cell id per splat slot
    c_cand = sort_key.shape[0]
    sort_tile = jax.lax.shift_right_logical(sort_key, jnp.int32(kz_bits))
    if bf16:
        if rgb10:
            unp = _unpack_rows(
                list(sorted1[2 + ko : -1]), 6, True
            ) + list(_unpack_rgb10(sorted1[-1]))
        else:
            unp = _unpack_rows(list(sorted1[2 + ko :]), n_rows, True)
        # rebuild global centres from the key's tile id + the local offset
        # (sentinel slots give garbage, zeroed by the valid_slot mask below)
        txs = (sort_tile % grid.x_tiles).astype(jnp.float32)
        tys = (sort_tile // grid.x_tiles).astype(jnp.float32)
        sort_feat = [
            unp[0] + txs * TILE_PX + half_px,
            unp[1] + tys * TILE_PX + half_px,
        ] + unp[2:n_rows]
    else:
        sort_feat = list(sorted1[2 + ko :])
    num_splats = jnp.sum((sort_tile < n_tiles).astype(jnp.int32))
    overflow = dropped
    # full-width layout: every candidate cell has a splat slot (the kernels
    # only walk tiles' live ranges, so sentinel-tail slots cost nothing);
    # pad to a whole number of rasterizer chunks
    s_out = -(-c_cand // chunk) * chunk
    if s_out > c_cand:
        sort_tile = jnp.pad(
            sort_tile, (0, s_out - c_cand),
            constant_values=int(KEY_SENTINEL) >> kz_bits,
        )
        if carry_gid:
            sort_gid = jnp.pad(
                sort_gid, (0, s_out - c_cand), constant_values=n
            )
        sort_feat = [jnp.pad(f, (0, s_out - c_cand)) for f in sort_feat]
    valid_slot = sort_tile < n_tiles
    if carry_gid:
        gaussian_idx = jnp.where(valid_slot, sort_gid, n)
    else:
        # ids were not carried (hot path): every slot reads as the pad id
        # n so an accidental consumer indexes the scene's sentinel slot
        # instead of silently reading a wrong gaussian
        gaussian_idx = jnp.full(sort_tile.shape, n, jnp.int32)
    feat = None
    if n_rows:
        # NO sanitising mask over the (R, S) splat rows: sentinel slots
        # carry real (finite) gaussian features — only their rebuilt u/v
        # centres are wrong (sentinel tile id), and every kernel masks
        # those lanes via the tile's [lo, hi) range before any cross-lane
        # reduction, so garbage never propagates.  The old full-width
        # where() was ~4 ms/step at bench scale.
        feat = jnp.stack(sort_feat)

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
        tier_members=jnp.stack(
            [m.astype(jnp.int32) for m in tier_members]
        ),
        overflow=overflow,
        truncated=truncated,
    )
    # aux: everything the feature-expansion VJP needs to run without a
    # scatter or a global prefix sum (see _reduce_splat_grads).  valid_slot
    # (not gaussian_idx) is what the VJP keeps alive: the hot path never
    # reads gaussian_idx, so XLA's sort simplifier strips the gid value
    # operand from the candidate sort entirely.
    aux = dict(
        pos_sorted=pos_sorted,
        gid_full=comp[1 + co],  # (n,) compaction permutation, full width
        tier_starts=tuple(tier_starts),
        valid_slot=valid_slot,
    )
    return layout, feat, aux


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
    tier_capacities=None,
) -> SplatLayout:
    """Layout only (no feature carry) — tests and tooling."""
    layout, _, _ = _layout_impl(
        uv, conic, z_camera, visible, None, grid, mh_dist, splat_capacity,
        chunk, visible_capacity, tier_capacities,
    )
    return layout


def _pack2_bf16(a: jax.Array, b: jax.Array) -> jax.Array:
    """Two f32 rows -> one i32 row of packed bf16 halves (a low, b high)."""
    ah = jax.lax.bitcast_convert_type(
        a.astype(jnp.bfloat16), jnp.uint16
    ).astype(jnp.uint32)
    bh = jax.lax.bitcast_convert_type(
        b.astype(jnp.bfloat16), jnp.uint16
    ).astype(jnp.uint32)
    return (ah | (bh << 16)).astype(jnp.int32)


def _unpack2_bf16(p: jax.Array):
    """Inverse of _pack2_bf16: one i32 row -> two f32 rows."""
    pu = p.astype(jnp.uint32)
    a = jax.lax.bitcast_convert_type(
        (pu & jnp.uint32(0xFFFF)).astype(jnp.uint16), jnp.bfloat16
    ).astype(jnp.float32)
    b = jax.lax.bitcast_convert_type(
        (pu >> 16).astype(jnp.uint16), jnp.bfloat16
    ).astype(jnp.float32)
    return a, b


def _pack_rgb10(r: jax.Array, g: jax.Array, b: jax.Array) -> jax.Array:
    """Three f32 colour rows -> ONE i32 row of 11/11/10-bit signed
    fixed-point fields in [-4, 4).

    r/g get step 1/256 (= pixel quantisation 1/255), b gets 1/128; values
    clamp at the range ends.  The absolute error (<= 0.002/0.004) matches
    the ~0.4% relative noise the bf16 pair packing already accepts on
    colour, but costs ONE sort operand instead of 1.5 — the candidate
    sort (the widest op in the step) drops a full operand.
    """
    ri = jnp.clip(jnp.round(r * 256.0), -1024, 1023).astype(jnp.int32)
    gi = jnp.clip(jnp.round(g * 256.0), -1024, 1023).astype(jnp.int32)
    bi = jnp.clip(jnp.round(b * 128.0), -512, 511).astype(jnp.int32)
    return (
        (ri & jnp.int32(0x7FF))
        | ((gi & jnp.int32(0x7FF)) << 11)
        | (bi << 22)
    )


def _unpack_rgb10(p: jax.Array):
    """Inverse of _pack_rgb10 (sign-extension via arithmetic shifts)."""
    r = jax.lax.shift_right_arithmetic(
        jax.lax.shift_left(p, jnp.int32(21)), jnp.int32(21)
    ).astype(jnp.float32) * (1.0 / 256.0)
    g = jax.lax.shift_right_arithmetic(
        jax.lax.shift_left(p, jnp.int32(10)), jnp.int32(21)
    ).astype(jnp.float32) * (1.0 / 256.0)
    b = jax.lax.shift_right_arithmetic(p, jnp.int32(22)).astype(
        jnp.float32
    ) * (1.0 / 128.0)
    return r, g, b


def _pack_rows(rows, bf16: bool):
    """List of (S,) f32 rows -> sort value operands (pairs packed to i32
    when bf16; identity otherwise)."""
    if not bf16:
        return list(rows)
    out = []
    for i in range(0, len(rows), 2):
        b = rows[i + 1] if i + 1 < len(rows) else jnp.zeros_like(rows[i])
        out.append(_pack2_bf16(rows[i], b))
    return out


def _unpack_rows(packed, r: int, bf16: bool):
    if not bf16:
        return list(packed)
    rows = []
    for p in packed:
        a, b = _unpack2_bf16(p)
        rows += [a, b]
    return rows[:r]


def _reduce_splat_grads(
    feat_cot: jax.Array,
    valid: jax.Array,
    pos_sorted: jax.Array,
    gid_full: jax.Array,
    tier_starts,
    caps,
    m_comp: int,
    bf16: bool = False,
    packed_rows: int | None = None,
) -> jax.Array:
    """VJP of the per-splat feature expansion: (R, S) splat-slot gradient
    rows -> (R, n) per-gaussian sums, with no scatter (a ~100ms/M-index
    scalar loop on TPU) and no global prefix sum (whose adjacent-difference
    cancellation grows with total splat count — the round-1 compensated
    cumsum existed to fight exactly that).

    The candidate sort is a *permutation* of the padded tier cell grids, and
    it carried each cell's flat position (``pos_sorted``).  So the transpose
    of "expand features to splats" factors into three exactly-invertible or
    dense steps:

      1. UNDO the candidate sort: sort the gradient rows by ``pos_sorted``
         (one sort) — gradients land on their tier cells, giving dense
         (K, M) grids per tier;
      2. reduce each tier over its K cell axis (a dense tree sum — error is
         bounded per gaussian, matching the reference's scatter-add which
         only ever adds per-gaussian terms, render_backward.cu:238-282) and
         add tier segments onto the compacted columns they were sliced from;
      3. UNDO the compaction sort: sort the per-column sums by the carried
         compaction permutation ``gid_full`` back to original gaussian order.

    With ``bf16`` (kernel_precision="bf16"), gradient rows ride the two
    permutation sorts as bf16 PAIRS packed into i32 operands — half the
    sort operands — and are unpacked to f32 for the dense reductions.
    Each value is rounded to bf16 twice (once per sort), a ~0.4% relative
    noise consistent with the bf16 kernel matmuls that produced it.
    """
    c_cand = pos_sorted.shape[0]
    n = gid_full.shape[0]
    if packed_rows is not None:
        # feat_cot is ALREADY the inversion sort's operand format: (P, S)
        # i32 rows of bf16 pairs, zero-filled in-kernel for every dead
        # window (ops/render._render_bwd packed=True) — no sanitise, no
        # pack pass
        r = packed_rows
        s_cap = feat_cot.shape[1]
        n_packs = (r + 1) // 2
        if c_cand > s_cap:
            g = jnp.pad(feat_cot, ((0, 0), (0, c_cand - s_cap)))
        else:
            g = feat_cot[:, :c_cand]
        packs = [g[i] for i in range(n_packs)]
        bf16 = True
    else:
        r, s_cap = feat_cot.shape
        # sanitise: slots past num_splats are never written by the backward
        # kernel (their windows are unvisited), so their rows can be garbage
        g = jnp.where(valid[None, :s_cap], feat_cot, 0.0)
        if c_cand > s_cap:
            # cells whose slots were truncated by splat_capacity get zero
            # grad
            g = jnp.pad(g, ((0, 0), (0, c_cand - s_cap)))
        else:
            g = g[:, :c_cand]
        packs = _pack_rows([g[i] for i in range(r)], bf16)
    inv = jax.lax.sort(
        tuple([pos_sorted] + packs),
        num_keys=1, is_stable=False,
    )
    cells = _unpack_rows(inv[1:], r, bf16)

    acc = jnp.zeros((r, m_comp), cells[0].dtype)
    off = 0
    for k_cells, cap_i, start in zip(TIER_CELLS, caps, tier_starts):
        seg = jnp.stack(
            [cells[j][off : off + k_cells * cap_i] for j in range(r)]
        )
        seg = seg.reshape(r, k_cells, cap_i).sum(axis=1)
        # dynamic_slice clamps start exactly like the forward's tier
        # selection (dynamic_slice_in_dim), so fwd/bwd stay consistent
        zero = jnp.zeros_like(start)
        cur = jax.lax.dynamic_slice(acc, (zero, start), (r, cap_i))
        acc = jax.lax.dynamic_update_slice(acc, cur + seg, (zero, start))
        off += k_cells * cap_i

    accn = jnp.pad(acc, ((0, 0), (0, n - m_comp)))
    out = jax.lax.sort(
        tuple(
            [gid_full] + _pack_rows([accn[i] for i in range(r)], bf16)
        ),
        num_keys=1, is_stable=False,
    )
    return jnp.stack(_unpack_rows(out[1:], r, bf16))


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10, 11, 12)
)
def layout_with_features(
    uv, conic, z_camera, visible, feat_g, grid, mh_dist, splat_capacity,
    chunk, visible_capacity=0, tier_capacities=None, precision="f32",
    carry_gid=True,
):
    """(layout, feat): tile assignment + per-splat feature expansion.

    Differentiable in ``feat_g`` only (R, N) -> (R, S); the discrete tile
    assignment gives no gradient to uv/conic/z (matching the reference,
    where the splat list is built outside autograd,
    splat_py/rasterize.py:84).  The custom VJP inverts the layout's two
    sort permutations instead of scatter-adding over splat->gaussian ids
    (see ``_reduce_splat_grads``).
    """
    layout, feat, _ = _layout_impl(
        uv, conic, z_camera, visible, feat_g, grid, mh_dist, splat_capacity,
        chunk, visible_capacity, tier_capacities, precision,
        carry_gid=carry_gid,
    )
    return layout, feat


def _lwf_fwd(uv, conic, z_camera, visible, feat_g, grid, mh_dist,
             splat_capacity, chunk, visible_capacity=0,
             tier_capacities=None, precision="f32", carry_gid=True):
    layout, feat, aux = _layout_impl(
        uv, conic, z_camera, visible, feat_g, grid, mh_dist, splat_capacity,
        chunk, visible_capacity, tier_capacities, precision,
        carry_gid=carry_gid,
    )
    zero_tpl = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
        (uv, conic, z_camera, visible),
    )
    res = (
        aux["valid_slot"],
        aux["pos_sorted"],
        aux["gid_full"],
        aux["tier_starts"],
        zero_tpl,
        feat_g.shape,
    )
    return (layout, feat), res


def _lwf_bwd(grid, mh_dist, splat_capacity, chunk, visible_capacity,
             tier_capacities, precision, carry_gid, res, cot):
    import numpy as np

    valid_slot, pos_sorted, gid_full, tier_starts, zero_tpl, feat_s = res
    _, feat_cot = cot
    n = feat_s[1]
    m_comp = _compacted_width(n, visible_capacity)
    caps = _tier_capacities(m_comp, splat_capacity, tier_capacities)
    g_feat_g = _reduce_splat_grads(
        feat_cot, valid_slot, pos_sorted, gid_full, tier_starts, caps,
        m_comp, bf16=precision == "bf16",
    )

    def zero_cot(s):
        if s.dtype == jnp.bool_:
            return np.zeros(s.shape, jax.dtypes.float0)
        return jnp.zeros(s.shape, s.dtype)

    g_uv, g_conic, g_z, g_vis = jax.tree_util.tree_map(zero_cot, zero_tpl)
    return (g_uv, g_conic, g_z, g_vis, g_feat_g)


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
