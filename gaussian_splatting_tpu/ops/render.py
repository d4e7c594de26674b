"""Pallas TPU tile rasterizer: forward + analytic backward, jax.custom_vjp.

TPU-native redesign of the reference CUDA rasterizer
(src/render.cu, src/render_backward.cu).  Key structural differences from
the CUDA kernels, driven by the TPU execution model:

- The CUDA kernels parallelise over pixels (one thread each) and loop over
  splats; here each grid step processes one CHUNK of splats against all 256
  pixels of a tile as dense (256, CHUNK) vector ops on the VPU, with colour
  accumulation as an MXU matmul.
- The sequential per-pixel transmittance recurrence becomes a per-chunk
  exclusive cumulative product along the splat axis, evaluated as
  exp(log(1-alpha) @ U_strict) on the MXU, with a (256, 1) carried
  transmittance column across a tile's chunks.
- The grid is one-dimensional over (tile, window) pairs of the flat
  tile-grouped splat list (see culling.build_splat_layout): the splat array
  is NOT chunk-aligned per tile — each tile walks the 128-aligned windows
  overlapping its slot range with lane masks (build_step_meta), so the
  layout needs no alignment spread pass.  Per-step metadata arrives via
  scalar prefetch, and a tile's steps are consecutive so its output block
  stays resident in VMEM.
- The backward pass walks front-to-back (not back-to-front like
  render_backward.cu): per-splat gradients follow from prefix sums of the
  premultiplied colour, so no atomics are needed; per-splat gradients are
  reduced over pixels in-kernel and scattered to gaussians by the autodiff
  transpose of the feature gather (an XLA segment-sum).

Gradient formulas match MATH.md:341-499 and render_backward.cu:120-283.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gaussian_splatting_tpu.ops import common as cc
from gaussian_splatting_tpu.structs import TILE_PX

# per-tile info rows (scalar-prefetched (3, n_tiles+1) i32 array):
# row 0 = first slot, row 1 = one-past-last slot of the tile's range in the
# tile-grouped splat array, row 2 = the tile's first grid step (exclusive
# cumsum of per-tile step counts; entry n_tiles = total used steps).
# SMEM is the binding budget (~1MB/core): the first draft prefetched 8 rows
# per chunk, and rounds 1-3 prefetched three full (G,) per-step arrays,
# which blew SMEM at reference-scale capacities (G ~ 140k steps at a 35M-
# cell layout = 1.6MB).  The kernels now derive each step's input/output
# window from this per-tile table (see _step_windows) and read the step ->
# tile map from ONE array with two 16-ish-bit tile ids packed per i32.
INFO_START, INFO_END, INFO_OFF = 0, 1, 2


def _tile_pack_base(n_tiles: int) -> int:
    """Radix for packing two step-tile ids (values 0..n_tiles) per i32.

    base^2 - 1 must stay within i32 so the arithmetic unpack (div/mod by
    the static base — Mosaic's scalar core has no unsigned ops in index
    maps) never overflows: n_tiles <= 46339, i.e. images up to ~11.9MP at
    16px tiles (the packed-key sort's own exact-fallback domain boundary
    is 8MP; see culling.py)."""
    base = n_tiles + 1
    if base * base > 2**31 - 1:
        raise ValueError(
            f"{n_tiles} tiles exceeds the packed step-meta limit of 46339 "
            "(~11.9MP at 16px tiles)"
        )
    return base


def _unpack_tile(tile_ref, s, base):
    """Step s's tile id from the packed 2-per-i32 step->tile array."""
    q = tile_ref[s // 2]
    b = jnp.int32(base)
    return jnp.where(s % 2 == 0, jax.lax.rem(q, b), jax.lax.div(q, b))


def _step_windows(info_ref, s, tile, chunk, n_tiles, n_win):
    """Derive step s's (input window, output window) from the per-tile
    info table — the in-kernel twin of the arrays build_step_meta used to
    materialise.

    Live steps (tile < n_tiles): tile t's steps are consecutive from
    info[OFF, t], walking windows floor(start_t/chunk).. in order, so
    win = start_t // chunk + (s - off_t), and in == out.
    Dead steps (tile == n_tiles): the tail SWEEP visits every window past
    the live prefix once in ascending order so the backward zero-fills
    them (win_out ascends to the n_win dummy block; win_in clamps to a
    real block so the input index stays in range)."""
    ck = jnp.int32(chunk)
    start_t = info_ref[INFO_START, tile]
    off_t = info_ref[INFO_OFF, tile]
    w_live = jax.lax.div(start_t, ck) + (s - off_t)
    used = info_ref[INFO_OFF, n_tiles]
    end_last = info_ref[INFO_END, n_tiles - 1]  # starts[n_tiles]
    cover = jnp.where(
        end_last > 0, jax.lax.div(end_last - 1, ck) + 1, 0
    )
    tail = jnp.minimum(cover + (s - used), n_win)
    live = tile < n_tiles
    win_in = jnp.where(live, w_live, jnp.minimum(tail, n_win - 1))
    win_out = jnp.where(live, w_live, tail)
    return win_in, win_out


def _im_input_window(s, tile_ref, info_ref, *, chunk, n_tiles, n_win, base):
    """Index map: step -> input window block."""
    t = _unpack_tile(tile_ref, s, base)
    wi, _ = _step_windows(info_ref, s, t, chunk, n_tiles, n_win)
    return 0, wi


def _im_output_window(s, tile_ref, info_ref, *, chunk, n_tiles, n_win,
                      base):
    """Index map: step -> output window block (backward gradient rows)."""
    t = _unpack_tile(tile_ref, s, base)
    _, wo = _step_windows(info_ref, s, t, chunk, n_tiles, n_win)
    return 0, wo


def _im_tile(s, tile_ref, info_ref, *, base):
    """Index map: step -> tile block (image-layout operands/outputs)."""
    return 0, _unpack_tile(tile_ref, s, base)


def default_interpret() -> bool:
    return jax.default_backend() == "cpu"


def num_steps(splat_capacity: int, n_tiles: int, chunk: int) -> int:
    """Static grid size of the window-walk kernels: every tile needs at
    most one extra (boundary) window beyond its ceil(count/chunk) share."""
    return splat_capacity // chunk + n_tiles


def build_step_meta(layout, n_tiles: int, chunk: int):
    """Kernel scalar metadata for the window-walk grid.

    The splat array is tile-grouped but NOT chunk-aligned (the spread pass
    that aligned it was ~20% of the round-1 step time), so the grid
    enumerates (tile, window) pairs: tile t is walked over the 128-aligned
    ``chunk``-wide windows floor(start_t/chunk)..floor((end_t-1)/chunk),
    lane-masking [start_t, end_t) within each.  A window straddling a tile
    boundary is visited once per tile with complementary masks.

    Returns (step_tile_packed (ceil(G/2),), tile_info (3, n_tiles+1)) with
    G = num_steps(...) rounded up to even: the step -> tile map with two
    ids packed per i32 (radix n_tiles+1; the dummy id n_tiles marks unused
    trailing steps), plus the per-tile table the kernels derive everything
    else from (_step_windows).  Unused trailing steps SWEEP the windows
    past the live prefix so the backward kernel zero-fills every output
    window (its packed-bf16 rows would otherwise unpack stale-HBM garbage
    into the gradient reduction); steps past n_win pile onto the dummy
    output block, which the caller slices off.  There are always enough
    unused steps: used <= covered_windows + n_tiles and G >= n_win +
    n_tiles.
    """
    starts = layout.tile_starts  # (n_tiles+1,)
    s_cap = layout.gaussian_idx.shape[0]
    g_steps = num_steps(s_cap, n_tiles, chunk)
    g_steps += g_steps % 2
    base = _tile_pack_base(n_tiles)
    counts = starts[1:] - starts[:-1]
    wfirst = starts[:-1] // chunk
    wlast = jnp.maximum(starts[1:] - 1, 0) // chunk
    nsteps = jnp.where(counts > 0, wlast - wfirst + 1, 0)
    off = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(nsteps, dtype=jnp.int32)]
    )
    used = off[n_tiles]
    sids = jnp.arange(g_steps, dtype=jnp.int32)
    # step -> tile: scatter each stepped tile's id at its first step, cummax
    marker = jnp.zeros((g_steps + 1,), jnp.int32).at[off[:n_tiles]].max(
        jnp.arange(n_tiles, dtype=jnp.int32) * (nsteps > 0), mode="drop"
    )
    step_tile = jax.lax.cummax(marker[:g_steps])
    step_tile = jnp.where(sids < used, step_tile, n_tiles)
    packed = step_tile[0::2] + step_tile[1::2] * jnp.int32(base)
    zero = jnp.zeros((1,), jnp.int32)
    tile_info = jnp.stack(
        [
            jnp.concatenate([starts[:-1], zero]),
            jnp.concatenate([starts[1:], zero]),
            off,
        ]
    )
    return packed, tile_info


def expand_step_meta(meta, n_tiles: int, chunk: int, splat_capacity: int):
    """Expand compact step meta back to per-step (tile, win_in, win_out)
    arrays via the SAME derivation the kernels' scalar reads use — for
    tests and debugging (tests/test_culling.py pins the derivation against
    the layout)."""
    tile_packed, tile_info = meta
    base = _tile_pack_base(n_tiles)
    g_steps = 2 * tile_packed.shape[0]
    n_win = splat_capacity // chunk
    s = jnp.arange(g_steps, dtype=jnp.int32)
    q = tile_packed[s // 2]
    tile = jnp.where(s % 2 == 0, q % base, q // base)
    win_in, win_out = _step_windows(
        tile_info, s, tile, chunk, n_tiles, n_win
    )
    return tile, win_in, win_out


def _step_scalars(tile_ref, info_ref, s, chunk, x_tiles, n_tiles, n_win,
                  base):
    """Derive one grid step's scalars from the compact SMEM metadata.

    Returns (tile, first, last, new_window, lo, hi, tx, ty): first/last
    flag the tile's first/last step (carry init / output flush),
    new_window flags the first step touching this input window (backward
    read-modify-write), [lo, hi) is the tile's lane range in the window.
    """
    g_steps = 2 * tile_ref.shape[0]
    tile = _unpack_tile(tile_ref, s, base)
    sm = jnp.maximum(s - 1, 0)
    prev_tile = _unpack_tile(tile_ref, sm, base)
    next_tile = _unpack_tile(tile_ref, jnp.minimum(s + 1, g_steps - 1), base)
    first = jnp.logical_or(s == 0, prev_tile != tile)
    last = jnp.logical_or(s == g_steps - 1, next_tile != tile)
    w, _ = _step_windows(info_ref, s, tile, chunk, n_tiles, n_win)
    prev_w, _ = _step_windows(info_ref, sm, prev_tile, chunk, n_tiles, n_win)
    new_window = jnp.logical_or(s == 0, prev_w != w)
    cell0 = w * chunk
    lo = jnp.clip(info_ref[INFO_START, tile] - cell0, 0, chunk)
    hi = jnp.clip(info_ref[INFO_END, tile] - cell0, 0, chunk)
    tx = jax.lax.rem(tile, jnp.int32(x_tiles))
    ty = jax.lax.div(tile, jnp.int32(x_tiles))
    return tile, first, last, new_window, lo, hi, tx, ty


def splat_feature_rows(u, v, opacity_v, c0, c1, c2, r, g, b):
    """Pack per-gaussian render rows ((N,) each) into the (9, N) feature
    matrix.  Includes the +0.25 diagonal regularisation and the conic[1]/2
    halving the CUDA kernels apply inline (src/render.cu:113-121), so the
    kernels consume a/b/c directly and JAX autodiff chains these affine
    maps.  Rows are padded to FEAT_ROWS with `pad_feature_rows` after
    per-splat expansion."""
    return jnp.stack(
        [u, v, opacity_v, c0 + 0.25, c1 * 0.5, c2 + 0.25, r, g, b]
    )


def splat_features(uv, opacity, conic, rgb):
    """(N, C)-array wrapper over ``splat_feature_rows``."""
    return splat_feature_rows(
        uv[:, 0], uv[:, 1], opacity[:, 0],
        conic[:, 0], conic[:, 1], conic[:, 2],
        rgb[:, 0], rgb[:, 1], rgb[:, 2],
    )


def pad_feature_rows(feat, rows: int | None = None):
    """Pad (R, S) data rows to the kernels' (rows, S) contract
    (default: the DC kernel's FEAT_ROWS)."""
    r, s = feat.shape
    rows = cc.FEAT_ROWS if rows is None else rows
    return jnp.concatenate([feat, jnp.zeros((rows - r, s), feat.dtype)])


# ---------------------------------------------------------------------------
# in-kernel helpers
# ---------------------------------------------------------------------------


def _pixel_local_coords(dtype):
    """(256, 1) tile-LOCAL pixel-centre coordinates (0..15 each axis).

    The kernels work in tile-local coordinates: per-splat centres are
    shifted by the tile origin (a row op) instead of building global pixel
    coordinates.  du/dv then subtract ~16-scale numbers instead of
    ~1000-scale ones, which both removes ~7 bits of cancellation loss and
    lets the backward reduce gradients with a small-magnitude polynomial
    pixel basis (see _bwd_kernel)."""
    p = jax.lax.broadcasted_iota(jnp.int32, (cc.PIXELS_PER_TILE, 1), 0)
    # centred on the tile (±7.5) so the backward's pixel-moment basis keeps
    # the smallest possible magnitudes (least cancellation in the central-
    # moment expansion)
    half = dtype.type((TILE_PX - 1) / 2)
    return (
        (p % TILE_PX).astype(dtype) - half,
        (p // TILE_PX).astype(dtype) - half,
    )


def _pixel_basis(dtype):
    """(256, 6) constant polynomial pixel basis [1, up, vp, up^2, vp^2,
    up*vp] over the tile-centred pixel coordinates.  Every entry is a
    half-integer product <= 56.25 = 225/4, i.e. exactly representable in
    bfloat16's 8 significand bits — so a bf16 cast of this matrix is
    EXACT."""
    up, vp = _pixel_local_coords(dtype)
    return jnp.concatenate(
        [jnp.ones_like(up), up, vp, up * up, vp * vp, up * vp], axis=1
    )


def _alpha_terms(f, tx, ty, lo, hi, clamp=False, mx=False):
    """Per splat-pixel alpha math shared by fwd/bwd.  f: (FEAT_ROWS, CHUNK);
    only lanes in [lo, hi) belong to the current tile (tx, ty).

    ``clamp=True`` (backward) caps ``at`` at ALPHA_CLAMP — the reference's
    backward clamps alpha to 0.9999 before every use (weights, reciprocal,
    rgb grads; src/render_backward.cu:167), so the one clamped field serves
    all of them.

    ``mx=True`` (kernel_precision="bf16" production mode) evaluates the
    Mahalanobis quadratic on the MXU: mh separates into the fixed pixel
    basis [1, up, vp, up^2, vp^2, up*vp] contracted with six per-splat
    coefficient ROWS, so one (256, 6) @ (6, CHUNK) matmul (basis exact in
    bf16, coefficients as an exact-against-0/1... hi/lo bf16 split pair)
    replaces the ~9 full (256, CHUNK) VPU ops of the du/dv chain.  The
    split residual puts ~2^-16 relative noise on mh's terms — same order
    as the bf16 prefix matmuls this mode already accepts.  The one
    semantic wrinkle: the reference's mh > 0 test (prob = 0 at an EXACT
    splat-centre pixel, src/render.cu:137) is evaluated on the rounded
    mh, so a pixel within ~1e-5 of a splat centre can flip sides — a
    measure-zero event in training data, and f32/golden mode keeps the
    exact du/dv chain."""
    chunk = f.shape[1]
    up, vp = _pixel_local_coords(f.dtype)
    # per-splat centres relative to the tile CENTRE (row ops; the pixel
    # coords are centred the same way)
    half = f.dtype.type((TILE_PX - 1) / 2)
    ul = (
        f[cc.FEAT_U : cc.FEAT_U + 1, :]
        - (tx * TILE_PX).astype(f.dtype) - half
    )
    vl = (
        f[cc.FEAT_V : cc.FEAT_V + 1, :]
        - (ty * TILE_PX).astype(f.dtype) - half
    )
    op = f[cc.FEAT_OPACITY : cc.FEAT_OPACITY + 1, :]
    a = f[cc.FEAT_A : cc.FEAT_A + 1, :]
    b = f[cc.FEAT_B : cc.FEAT_B + 1, :]
    c = f[cc.FEAT_C : cc.FEAT_C + 1, :]

    det = a * c - b * b
    rdet = 1.0 / det
    if mx:
        # nh = -mh/2 = basis @ K, with the -1/2 folded into the (1, CHUNK)
        # coefficient rows (row algebra is ~1/256 the cost of a full op)
        ra = rdet * a
        rb = rdet * b
        rc = rdet * c
        k0 = rc * ul * ul - 2.0 * (rb * ul) * vl + ra * vl * vl
        K = jnp.concatenate(
            [
                -0.5 * k0,
                rc * ul - rb * vl,
                ra * vl - rb * ul,
                -0.5 * rc,
                -0.5 * ra,
                rb,
            ],
            axis=0,
        )  # (6, CHUNK)
        basis = _pixel_basis(f.dtype).astype(jnp.bfloat16)  # exact cast
        kh = K.astype(jnp.bfloat16)
        kl = (K - kh.astype(jnp.float32)).astype(jnp.bfloat16)
        nh = _mm(basis, kh, (((1,), (0,)))) + _mm(
            basis, kl, (((1,), (0,)))
        )  # (256, CHUNK) f32
        mh = None
        prob = jnp.where(nh < 0.0, jnp.exp(nh), 0.0)
    else:
        du = up - ul  # (256, CHUNK)
        dv = vp - vl
        mh = (c * du * du - 2.0 * b * du * dv + a * dv * dv) * rdet
        prob = jnp.where(mh > 0.0, jnp.exp(-0.5 * mh), 0.0)
    alpha = op * prob

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
    in_range = (lane >= lo) & (lane < hi)
    av = jnp.minimum(alpha, cc.ALPHA_CLAMP) if clamp else alpha
    at = jnp.where((alpha >= cc.ALPHA_SKIP) & in_range, av, 0.0)
    return dict(
        det=det, rdet=rdet, mh=mh, prob=prob, alpha=alpha,
        at=at, op=op, a=a, b=b, c=c, in_range=in_range, ul=ul, vl=vl,
        up=up, vp=vp,
    )


def _tri_matrices(chunk, dtype):
    row = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
    u_strict = (row < col).astype(dtype)
    u_incl = (row <= col).astype(dtype)
    return u_strict, u_incl


def _mm(a, b, contract):
    return jax.lax.dot_general(
        a, b, dimension_numbers=(contract, ((), ())),
        preferred_element_type=jnp.float32,
    )


def _mm_acc(a, b, contract, bf16):
    """Accumulation matmuls (colour/gradient reductions over the chunk or
    pixel axis).  bf16 production mode keeps the default single-pass
    (noise class it already accepts everywhere); f32 accuracy mode forces
    the exact multi-pass product — the TPU default would round these f32
    inputs to one bf16 pass and put ~1e-3 relative error straight on the
    image/gradients (measured on-chip, round 5)."""
    if bf16:
        return _mm(a, b, contract)
    return jax.lax.dot_general(
        a, b, dimension_numbers=(contract, ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _mmp(a, b, contract, bf16):
    """dot_general with optionally bf16-cast inputs (single-pass MXU) and
    f32 accumulation.  NOT used by production paths even under
    kernel_precision="bf16": single-pass bf16 on the real (colour/gradient)
    matmuls puts ~2^-9 relative noise directly on the image (measured
    1.1e-2 max pixel delta on the fixture) for a tiny MXU saving — the
    prefix matmuls are ~98% of the MXU work and get the tight hi/lo split
    in _mm_scan instead.  Kept as a benchmarking-only knob."""
    if bf16:
        a = a.astype(jnp.bfloat16)
        b = b.astype(jnp.bfloat16)
    return _mm(a, b, contract)


def _mm_scan(x, u01, contract, bf16):
    """x @ u01 where u01 is a 0/1 (triangular) matrix — the kernels'
    prefix-sum-as-matmul.  These matmuls are ~98% of the kernels' MXU
    work, so under kernel_precision="bf16" x rides as a hi/lo bf16 SPLIT
    (x = hi + lo + eps, |eps| <= 2^-16 |x|): two single-pass bf16 matmuls
    with f32 accumulation cost ~half an f32 multi-pass matmul and keep
    ~16 mantissa bits of the operand — each hi/lo product against a 0/1
    matrix is EXACT, so the only loss is the split residual (~100x
    tighter than single-pass bf16 inputs).  f32 mode is untouched
    (golden-pixel parity tests pin it)."""
    if not bf16:
        # f32 mode is the accuracy/golden mode: the TPU's DEFAULT matmul
        # precision runs f32 inputs as one bf16 pass (~1e-3 relative error
        # measured on-chip, round 5), which would silently degrade the
        # mode's whole point — force the exact multi-pass product here
        return jax.lax.dot_general(
            x, u01, dimension_numbers=(contract, ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    ub = u01.astype(jnp.bfloat16)
    return _mm(hi, ub, contract) + _mm(lo, ub, contract)


# sub-block width of the hierarchical prefix scan: the MXU's native 128
# contraction (a narrower block underfills the systolic array)
_SCAN_BLK = 128


def _prefix_scan_strict(x, bf16):
    """STRICT prefix sum of (P, C) ``x`` along the lane (chunk) axis.

    A flat triangular matmul costs P*C^2 MACs; splitting the chunk into
    128-lane sub-blocks costs P*C*128 plus one (P, 1) carry per block —
    4x less MXU work at the production chunk=256 (measured round 5: bwd
    kernel 30.5 -> see PERF.md).  Sub-block results are exact partial
    sums; the carry is an f32 row reduction, so the error structure
    matches the flat matmul's (hi/lo split exact against 0/1, f32
    accumulation).  Lane slices/concats at 128 alignment are whole
    lane-tiles (no relayout)."""
    c = x.shape[1]
    if c <= _SCAN_BLK or c % _SCAN_BLK:
        u_strict, _ = _tri_matrices(c, x.dtype)
        return _mm_scan(x, u_strict, (((1,), (0,))), bf16)
    u_strict, _ = _tri_matrices(_SCAN_BLK, x.dtype)
    blocks = []
    carry = None
    for k in range(c // _SCAN_BLK):
        xb = jax.lax.slice_in_dim(
            x, k * _SCAN_BLK, (k + 1) * _SCAN_BLK, axis=1
        )
        pb = _mm_scan(xb, u_strict, (((1,), (0,))), bf16)
        if carry is not None:
            pb = pb + carry
        bsum = jnp.sum(xb, axis=1, keepdims=True)
        carry = bsum if carry is None else carry + bsum
        blocks.append(pb)
    return jnp.concatenate(blocks, axis=1)


def _col_to_row(col):
    """(P, 1) -> (1, P) via an MXU identity contraction (cheap, once/tile).
    HIGHEST precision: the default would round the value operand to bf16
    even though the other operand is an exact 0/1 identity."""
    p = col.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, (p, p), 0)
    coli = jax.lax.broadcasted_iota(jnp.int32, (p, p), 1)
    eye = (row == coli).astype(col.dtype)
    return _mm_acc(col, eye, (((0,), (0,))), False)  # (1, P)


def _row_to_col(rowv):
    p = rowv.shape[1]
    row = jax.lax.broadcasted_iota(jnp.int32, (p, p), 0)
    coli = jax.lax.broadcasted_iota(jnp.int32, (p, p), 1)
    eye = (row == coli).astype(rowv.dtype)
    return _mm_acc(eye, rowv, (((1,), (1,))), False)  # (P, 1)


def _log_one_minus(at):
    return jnp.log1p(-jnp.minimum(at, 0.999999))


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------


def _fwd_kernel(chunk, x_tiles, n_tiles, n_win, base, bf16, tile_ref,
                info_ref, feat_ref, out_ref, t_col, acc, sat_ref):
    s = pl.program_id(0)
    _, first, last, _, lo, hi, tx, ty = _step_scalars(
        tile_ref, info_ref, s, chunk, x_tiles, n_tiles, n_win, base
    )

    @pl.when(first)
    def _():
        t_col[:] = jnp.ones_like(t_col)
        acc[:] = jnp.zeros_like(acc)
        sat_ref[0] = 0

    # chunk-level early exit: once every pixel of the tile is saturated
    # (T < T_EPS) the remaining splats contribute exactly zero (the
    # `active` mask below already zeroes them), so skip their math
    # entirely — the analogue of the reference's per-pixel loop break
    # (src/render.cu:106).  The flag lives in SMEM, set at the end of a
    # body run, so the per-step gate is a scalar read.
    @pl.when((hi > lo) & (sat_ref[0] == 0))
    def _():
        f = feat_ref[:]
        chunk = f.shape[1]
        t = _alpha_terms(f, tx, ty, lo, hi, mx=False)
        at = t["at"]
        loma = _log_one_minus(at)
        # exclusive prefix transmittance within the chunk, times the carry
        tpref = t_col[:] * jnp.exp(_prefix_scan_strict(loma, bf16))
        active = tpref >= cc.T_EPS
        wgt = jnp.where(active, at * tpref, 0.0)  # (256, CHUNK)
        rgb = f[cc.FEAT_R : cc.FEAT_B_COL + 1, :]  # (3, CHUNK)
        acc[0:3, :] += _mm_acc(rgb, wgt, (((1,), (1,))), bf16)  # (3, 256)
        t_col[:] *= jnp.exp(jnp.sum(loma, axis=1, keepdims=True))
        sat_ref[0] = (jnp.max(t_col[:]) < cc.T_EPS).astype(jnp.int32)

    @pl.when(last)
    def _():
        out_ref[0:3, :] = acc[0:3, :]
        out_ref[3:4, :] = _col_to_row(t_col[:])
        out_ref[4:, :] = jnp.zeros_like(out_ref[4:, :])


@functools.partial(
    jax.jit,
    static_argnames=("n_tiles", "x_tiles", "chunk", "interpret", "bf16"),
)
def _render_fwd(feat, meta, *, n_tiles, x_tiles, chunk, interpret,
                bf16=False):
    step_tile_packed, tile_info = meta
    n_splats = feat.shape[1]
    g_steps = 2 * step_tile_packed.shape[0]
    n_win = n_splats // chunk
    base = _tile_pack_base(n_tiles)
    dims = dict(chunk=chunk, n_tiles=n_tiles, n_win=n_win, base=base)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(g_steps,),
        in_specs=[
            pl.BlockSpec(
                (cc.FEAT_ROWS, chunk),
                functools.partial(_im_input_window, **dims),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (cc.OUT_ROWS, cc.PIXELS_PER_TILE),
            functools.partial(_im_tile, base=base),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((cc.PIXELS_PER_TILE, 1), jnp.float32),
            pltpu.VMEM((cc.OUT_ROWS, cc.PIXELS_PER_TILE), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
        ],
    )
    return pl.pallas_call(
        functools.partial(
            _fwd_kernel, chunk, x_tiles, n_tiles, n_win, base, bf16
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (cc.OUT_ROWS, (n_tiles + 1) * cc.PIXELS_PER_TILE), jnp.float32
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=40 * n_splats * cc.PIXELS_PER_TILE,
            bytes_accessed=4 * n_splats * cc.FEAT_ROWS,
            transcendentals=2 * n_splats * cc.PIXELS_PER_TILE,
        ),
    )(step_tile_packed, tile_info, feat)


# ---------------------------------------------------------------------------
# backward kernel
# ---------------------------------------------------------------------------


def _pack2_bf16_kernel(x, y):
    """Two (1, CHUNK) f32 rows -> one i32 row of bf16 halves (x low, y
    high) — the in-kernel twin of culling._pack2_bf16, so the backward can
    emit gradient rows already in the inversion sort's operand format."""
    xh = jax.lax.bitcast_convert_type(
        x.astype(jnp.bfloat16), jnp.uint16
    ).astype(jnp.uint32)
    yh = jax.lax.bitcast_convert_type(
        y.astype(jnp.bfloat16), jnp.uint16
    ).astype(jnp.uint32)
    return (xh | (yh << 16)).astype(jnp.int32)


def _bwd_kernel(chunk_len, x_tiles, n_tiles, n_win, base, bf16, packed,
                tile_ref, info_ref, feat_ref, gi_ref, gout_ref, t_col,
                pg_col, e_col, sat_ref):
    s = pl.program_id(0)
    _, first, _, new_window, lo, hi, tx, ty = _step_scalars(
        tile_ref, info_ref, s, chunk_len, x_tiles, n_tiles, n_win, base
    )

    @pl.when(first)
    def _():
        t_col[:] = jnp.ones_like(t_col)
        pg_col[:] = jnp.zeros_like(pg_col)
        e_col[:] = _row_to_col(gi_ref[3:4, :])
        sat_ref[0] = 0

    # chunk-level early exit (see _fwd_kernel): fully-saturated tiles give
    # every remaining splat zero gradient, so only the zero-write of the
    # output block remains.  Empty steps (unused tail sweep, lo == hi)
    # likewise skip straight to the zero-write — they are ~30% of the grid
    # at bench scale.
    compute = (hi > lo) & (sat_ref[0] == 0)

    @pl.when(compute)
    def _():
        f = feat_ref[:]
        chunk = f.shape[1]
        t = _alpha_terms(f, tx, ty, lo, hi, clamp=True, mx=bf16)
        at, op = t["at"], t["op"]
        rdet = t["rdet"]
        a, b, c = t["a"], t["b"], t["c"]
        ul, vl = t["ul"], t["vl"]

        # at <= ALPHA_CLAMP < 0.999999, so _log_one_minus's guard min is
        # redundant here
        loma = jnp.log1p(-at)
        tpref = t_col[:] * jnp.exp(_prefix_scan_strict(loma, bf16))
        active = tpref >= cc.T_EPS
        # at is pre-clamped (clamp=True) and pre-masked, so this weight
        # already IS the reference backward's clamped weight
        # (render_backward.cu:193-196)
        wgt = jnp.where(active, at * tpref, 0.0)

        g = gi_ref[0:3, :]  # (3, 256) upstream image gradient, tile layout
        rgb = f[cc.FEAT_R : cc.FEAT_B_COL + 1, :]  # (3, CHUNK)
        # A[p, s] = sum_ch g[ch, p] * rgb[ch, s]
        A = _mm_acc(g, rgb, (((0,), (0,))), bf16)  # (256, CHUNK), f32
        cw = A * wgt
        # inclusive prefix = strict prefix + cw (one scan serves both)
        pg_incl = pg_col[:] + _prefix_scan_strict(cw, bf16) + cw
        # D = sum_ch color_accum * g  (colour behind this splat + background)
        D = e_col[:] - pg_incl

        roma = 1.0 / (1.0 - at)  # at <= ALPHA_CLAMP, and 0 on masked lanes
        # q = -2 dL/d(mh): alpha * grad_alpha with the -1/2 deferred to the
        # T6 rows.  Multiplying by the pre-masked, pre-clamped `at` applies
        # both the active&at>0 mask and the reference backward's alpha
        # clamp in one op.
        q = at * jnp.where(active, A * tpref - D * roma, 0.0)

        # Every per-splat gradient row is a pixel sum of q times a
        # polynomial in (du, dv) with per-splat coefficients, and
        # du = up - ul separates into per-pixel and per-splat parts — so
        # ALL six gradient rows reduce through ONE (6, 256) @ (256, CHUNK)
        # moment matmul against the fixed basis {1, up, vp, up^2, vp^2,
        # up*vp}, followed by (1, CHUNK) row algebra.  This replaces five
        # full (256, CHUNK) gradient fields and six vector reductions of
        # the round-2 kernel (the CUDA analogue reduces with warp
        # shuffles, render_backward.cu:238-282).
        basis = _pixel_basis(f.dtype)  # (256, 6)
        # raw moments of dL/dmh = -q/2 (the deferred -1/2 lands here, on
        # (6, CHUNK) rows instead of a full (256, CHUNK) field)
        T6 = -0.5 * _mm_acc(basis, q, (((0,), (0,))), bf16)  # (6, CHUNK)
        m1, su, sv = T6[0:1, :], T6[1:2, :], T6[2:3, :]
        suu, svv, suv = T6[3:4, :], T6[4:5, :], T6[5:6, :]
        # central moments about the splat centre (tile-local, so the
        # shift terms stay O(16)-scale and lose no precision)
        mu = su - ul * m1
        mv = sv - vl * m1
        muu = suu - ul * (2.0 * su - ul * m1)
        mvv = svv - vl * (2.0 * sv - vl * m1)
        muv = suv - ul * sv - vl * (su - ul * m1)
        smh = rdet * (c * muu - 2.0 * b * muv + a * mvv)  # sum mh*q
        gu_row = -2.0 * rdet * (c * mu - b * mv)
        gv_row = -2.0 * rdet * (a * mv - b * mu)
        gop_row = -2.0 * m1 / jnp.maximum(op, 1e-30)
        ga_row = rdet * (mvv - c * smh)
        gb_row = 2.0 * rdet * (b * smh - muv)
        gc_row = rdet * (muu - a * smh)

        # grad rgb: the reference uses the clamped alpha here
        # (render_backward.cu:193-196)
        grgb = _mm_acc(g, wgt, (((1,), (0,))), bf16)  # (3, CHUNK)
        if packed:
            # emit the rows already as the inversion sort's bf16-pair i32
            # operands: half the output DMA, and no XLA-side sanitise/pack
            # pass between the kernel and the sort
            zrow = jnp.zeros((1, chunk), jnp.float32)
            gblock = jnp.concatenate(
                [
                    _pack2_bf16_kernel(gu_row, gv_row),
                    _pack2_bf16_kernel(gop_row, ga_row),
                    _pack2_bf16_kernel(gb_row, gc_row),
                    _pack2_bf16_kernel(grgb[0:1, :], grgb[1:2, :]),
                    _pack2_bf16_kernel(grgb[2:3, :], zrow),
                    jnp.zeros(
                        (cc.GRAD_PACKED_ROWS - 5, chunk), jnp.int32
                    ),
                ],
                axis=0,
            )
        else:
            gblock = jnp.concatenate(
                [
                    gu_row,
                    gv_row,
                    gop_row,
                    ga_row,
                    gb_row,
                    gc_row,
                    grgb,
                    jnp.zeros(
                        (cc.GRAD_ROWS - cc.GRAD_B_COL - 1, chunk),
                        jnp.float32,
                    ),
                ],
                axis=0,
            )
        # a boundary window is visited by two consecutive steps (one per
        # tile) with complementary lane ranges: the first visit zero-fills
        # the other lanes, the second merges with the resident block
        # (consecutive steps share the same output block, so it is still
        # in VMEM)
        prev = jnp.where(new_window, jnp.zeros_like(gblock), gout_ref[:])
        gout_ref[:] = jnp.where(t["in_range"], gblock, prev)

        t_col[:] *= jnp.exp(jnp.sum(loma, axis=1, keepdims=True))
        pg_col[:] += jnp.sum(cw, axis=1, keepdims=True)
        sat_ref[0] = (jnp.max(t_col[:]) < cc.T_EPS).astype(jnp.int32)

    @pl.when(~compute)
    def _():
        chunk = gout_ref.shape[1]
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
        in_range = (lane >= lo) & (lane < hi)
        zero = jnp.zeros_like(gout_ref[:])
        prev = jnp.where(new_window, zero, gout_ref[:])
        gout_ref[:] = jnp.where(in_range, zero, prev)


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_tiles", "x_tiles", "chunk", "interpret", "bf16", "packed",
    ),
)
def _render_bwd(feat, meta, gi, *, n_tiles, x_tiles, chunk, interpret,
                bf16=False, packed=False):
    """Per-splat gradient rows.  ``packed=True`` (bf16 production) emits
    (GRAD_PACKED_ROWS, S) i32 rows of bf16 pairs — the gradient-reduction
    sort's exact operand format (culling._reduce_splat_grads) — with every
    output window zero-filled in-kernel (the tail sweep in
    build_step_meta), so nothing between the kernel and the sort touches
    the rows."""
    step_tile_packed, tile_info = meta
    n_splats = feat.shape[1]
    g_steps = 2 * step_tile_packed.shape[0]
    n_win = n_splats // chunk
    base = _tile_pack_base(n_tiles)
    dims = dict(chunk=chunk, n_tiles=n_tiles, n_win=n_win, base=base)
    out_rows = cc.GRAD_PACKED_ROWS if packed else cc.GRAD_ROWS
    out_dtype = jnp.int32 if packed else jnp.float32
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(g_steps,),
        in_specs=[
            pl.BlockSpec(
                (cc.FEAT_ROWS, chunk),
                functools.partial(_im_input_window, **dims),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (cc.OUT_ROWS, cc.PIXELS_PER_TILE),
                functools.partial(_im_tile, base=base),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (out_rows, chunk),
            functools.partial(_im_output_window, **dims),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((cc.PIXELS_PER_TILE, 1), jnp.float32),
            pltpu.VMEM((cc.PIXELS_PER_TILE, 1), jnp.float32),
            pltpu.VMEM((cc.PIXELS_PER_TILE, 1), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _bwd_kernel, chunk, x_tiles, n_tiles, n_win, base, bf16, packed
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (out_rows, n_splats + chunk), out_dtype
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=80 * n_splats * cc.PIXELS_PER_TILE,
            bytes_accessed=8 * n_splats * cc.FEAT_ROWS,
            transcendentals=2 * n_splats * cc.PIXELS_PER_TILE,
        ),
    )(step_tile_packed, tile_info, feat, gi)
    return out[:, :n_splats]


# ---------------------------------------------------------------------------
# custom_vjp wrapper
# ---------------------------------------------------------------------------


def _finish(premul_t, background_rgb, n_tiles, empty_tile):
    """Mask never-visited tiles and blend the background.

    premul_t: raw kernel output (OUT_ROWS, (n_tiles+1)*256).
    Returns (img rows 0..2 incl. background, T row 3) as
    (4, n_tiles*256).
    """
    out = premul_t[:, : n_tiles * cc.PIXELS_PER_TILE]
    # tiles with zero splats are never visited by the kernel: colour 0, T 1
    rgb = jnp.where(empty_tile, 0.0, out[0:3, :])
    T = jnp.where(empty_tile[0], 1.0, out[3, :])
    bg_w = jnp.where(T > cc.BG_T_EPS, T, 0.0)
    img = rgb + bg_w[None, :] * background_rgb[:, None]
    return jnp.concatenate([img, T[None, :]], axis=0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def _render_core(feat, meta, background_rgb, empty_tile, n_tiles, x_tiles,
                 chunk, interpret, bf16=False):
    raw = _render_fwd(
        feat, meta, n_tiles=n_tiles, x_tiles=x_tiles, chunk=chunk,
        interpret=interpret, bf16=bf16,
    )
    return _finish(raw, background_rgb, n_tiles, empty_tile)


def _render_core_fwd(feat, meta, background_rgb, empty_tile, n_tiles,
                     x_tiles, chunk, interpret, bf16=False):
    out = _render_core(
        feat, meta, background_rgb, empty_tile, n_tiles, x_tiles, chunk,
        interpret, bf16,
    )
    return out, (feat, meta, out)


def _render_core_bwd(n_tiles, x_tiles, chunk, interpret, bf16, res, g_out):
    feat, meta, out = res
    img, T = out[0:3, :], out[3, :]
    g_img, g_t = g_out[0:3, :], g_out[3, :]
    # E = sum_ch color_total[ch] * g[ch] + g_T * T: the per-pixel suffix
    # term of grad_alpha.  color_total includes the background blend —
    # this reproduces the reference's color_accum initialisation
    # (render_backward.cu:171-181) — and the g_T*T term makes the exposed
    # transmittance output differentiable (the reference drops it).
    # CAVEAT (ADVICE r2): under the chunk-level saturation early-exit the
    # forward's t_col stops updating, so T holds a stale (but correctly
    # < T_EPS = 1e-4) value for saturated pixels; background blending and
    # the T_EPS-masked gradients are unaffected, but T — and hence this
    # VJP — is only approximately exact below T_EPS.
    e_row = jnp.sum(img * g_img, axis=0) + g_t * T
    pad = (n_tiles + 1) * cc.PIXELS_PER_TILE - e_row.shape[0]
    gi = jnp.concatenate([g_img, e_row[None, :]], axis=0)
    gi = jnp.pad(gi, ((0, cc.OUT_ROWS - 4), (0, pad)))
    gfeat = _render_bwd(
        feat, meta, gi, n_tiles=n_tiles, x_tiles=x_tiles, chunk=chunk,
        interpret=interpret, bf16=bf16,
    )
    bg_w = jnp.where(T > cc.BG_T_EPS, T, 0.0)
    g_bg = jnp.sum(g_img * bg_w[None, :], axis=1)
    gmeta = tuple(np.zeros(m.shape, jax.dtypes.float0) for m in meta)
    g_empty = np.zeros((1, n_tiles * cc.PIXELS_PER_TILE), jax.dtypes.float0)
    return gfeat, gmeta, g_bg, g_empty


_render_core.defvjp(_render_core_fwd, _render_core_bwd)


def render_tiles(
    feat: jax.Array,
    meta: jax.Array,
    background_rgb: jax.Array,
    tile_has_output: jax.Array,
    *,
    n_tiles: int,
    x_tiles: int,
    chunk: int,
    interpret: bool | None = None,
    precision: str = "f32",
):
    """Rasterize packed splat features into per-tile pixels.

    feat: (FEAT_ROWS, S) splat-ordered features (see `splat_features`,
          expanded per splat by the layout sort).
    meta: the step metadata tuple from `build_step_meta`.
    Returns (image incl. background (n_tiles, 256, 3),
             final transmittance (n_tiles, 256)).

    Differentiable in feat and background_rgb via custom_vjp; the feature
    gather's autodiff transpose scatter-adds per-splat gradients back to
    gaussians (replacing the CUDA warp-reduce + atomicAdd,
    render_backward.cu:238-282).
    """
    if interpret is None:
        interpret = default_interpret()
    empty_tile = jnp.repeat(~tile_has_output, cc.PIXELS_PER_TILE)[None, :]
    out = _render_core(
        feat, meta, background_rgb,
        jax.lax.stop_gradient(empty_tile),
        n_tiles, x_tiles, chunk, bool(interpret),
        precision == "bf16",
    )
    img = out[0:3, :].reshape(3, n_tiles, cc.PIXELS_PER_TILE)
    T = out[3, :].reshape(n_tiles, cc.PIXELS_PER_TILE)
    return jnp.moveaxis(img, 0, -1), T
