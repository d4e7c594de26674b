"""Per-pixel spherical-harmonics tile rasterizer (fwd + bwd, custom_vjp).

TPU re-design of the reference's N_SH>1 kernel path (src/render.cu:44-51,
153 and src/render_backward.cu SH branches): instead of a per-gaussian
precomputed colour, every pixel evaluates the SH basis at its own world
ray direction and contracts it with each splat's 3 x n_sh coefficients.

Kernel formulation: with basis B (n_sh, 256) per tile and coefficients
F (3*n_sh, CHUNK) per chunk,

  M[ck, p]  = sum_s F[ck, s] * W[p, s]           (one MXU matmul)
  acc[c, p] += sum_k B[k, p] * M[c*n_sh + k, p]  (small VPU contraction)

and backward

  GB[ck, p]   = g[c, p] * B[k, p]
  A[p, s]     = sum_ck GB[ck, p] * F[ck, s]      (matmul; feeds grad-alpha)
  gF[ck, s]   = sum_p GB[ck, p] * Wcl[p, s]      (matmul)

The alpha/compositing math and all thresholds are shared with the DC
kernel (ops/render.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gaussian_splatting_tpu.ops import common as cc
from gaussian_splatting_tpu.ops.render import (
    _alpha_terms,
    _col_to_row,
    _im_input_window,
    _im_output_window,
    _im_tile,
    _log_one_minus,
    _mm,
    _pixel_basis,
    _row_to_col,
    _step_scalars,
    _tile_pack_base,
    _prefix_scan_strict,
    default_interpret,
)

SH_BASE_ROWS = 6  # u, v, opacity, a, b, c


def _pad8(x: int) -> int:
    return -(-x // 8) * 8


def sh_feat_rows(n_sh: int) -> int:
    """Data rows for the SH feature matrix: base + 3*n_sh coefficients."""
    return SH_BASE_ROWS + 3 * n_sh


def sh_splat_feature_rows(u, v, opacity_v, conic3, coeffs):
    """Pack per-gaussian SH-render rows into (6 + 3*n_sh, N).

    u/v/opacity_v: (N,) rows; conic3: 3-tuple of (N,) raw conic rows;
    coeffs: (N, 3, n_sh) including the DC coefficient — NOT scaled by SH_0
    (the kernel's basis row 0 carries SH_0, matching sh_to_rgb,
    src/spherical_harmonics.cuh:26-75).
    """
    n_sh = coeffs.shape[2]
    c0, c1, c2 = conic3
    base = jnp.stack(
        [u, v, opacity_v, c0 + 0.25, c1 * 0.5, c2 + 0.25]
    )
    # one (N,3,k)->(3k,N) relayout instead of 3*n_sh strided column pulls
    coeffsT = jnp.transpose(coeffs, (1, 2, 0)).reshape(3 * n_sh, -1)
    return jnp.concatenate([base, coeffsT])


def sh_splat_features(uv, opacity, conic, coeffs):
    """(N, C)-array wrapper over ``sh_splat_feature_rows``."""
    return sh_splat_feature_rows(
        uv[:, 0], uv[:, 1], opacity[:, 0],
        (conic[:, 0], conic[:, 1], conic[:, 2]), coeffs,
    )


def _sh_color_rows(n_sh):
    return SH_BASE_ROWS, SH_BASE_ROWS + 3 * n_sh


def _fwd_kernel(n_sh, chunk, x_tiles, n_tiles, n_win, base, tile_ref,
                info_ref, feat_ref, basis_ref, out_ref, t_col, acc,
                sat_ref):
    s = pl.program_id(0)
    _, first, last, _, lo, hi, tx, ty = _step_scalars(
        tile_ref, info_ref, s, chunk, x_tiles, n_tiles, n_win, base
    )

    @pl.when(first)
    def _():
        t_col[:] = jnp.ones_like(t_col)
        acc[:] = jnp.zeros_like(acc)
        sat_ref[0] = 0

    # chunk-level early exit once every pixel saturates (ops/render.py)
    @pl.when((hi > lo) & (sat_ref[0] == 0))
    def _():
        f = feat_ref[:]
        chunk_len = f.shape[1]
        t = _alpha_terms(f, tx, ty, lo, hi)
        at = t["at"]
        loma = _log_one_minus(at)
        tpref = t_col[:] * jnp.exp(_prefix_scan_strict(loma, False))
        active = tpref >= cc.T_EPS
        wgt = jnp.where(active, at * tpref, 0.0)  # (256, CHUNK)
        clo_, chi_ = _sh_color_rows(n_sh)
        coeff = f[clo_:chi_, :]  # (3*n_sh, CHUNK)
        m = _mm(coeff, wgt, (((1,), (1,))))  # (3*n_sh, 256)
        basis = basis_ref[0:n_sh, :]  # (n_sh, 256)
        for c in range(3):
            acc[c : c + 1, :] += jnp.sum(
                m[c * n_sh : (c + 1) * n_sh, :] * basis, axis=0, keepdims=True
            )
        t_col[:] *= jnp.exp(jnp.sum(loma, axis=1, keepdims=True))
        sat_ref[0] = (jnp.max(t_col[:]) < cc.T_EPS).astype(jnp.int32)

    @pl.when(last)
    def _():
        out_ref[0:3, :] = acc[0:3, :]
        out_ref[3:4, :] = _col_to_row(t_col[:])
        out_ref[4:, :] = jnp.zeros_like(out_ref[4:, :])


@functools.partial(
    jax.jit,
    static_argnames=("n_sh", "n_tiles", "x_tiles", "chunk", "interpret"),
)
def _render_fwd(feat, basis, meta, *, n_sh, n_tiles, x_tiles, chunk,
                interpret):
    step_tile_packed, tile_info = meta
    g_steps = 2 * step_tile_packed.shape[0]
    n_win = feat.shape[1] // chunk
    base = _tile_pack_base(n_tiles)
    dims = dict(chunk=chunk, n_tiles=n_tiles, n_win=n_win, base=base)
    feat_rows = feat.shape[0]
    basis_rows = basis.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(g_steps,),
        in_specs=[
            pl.BlockSpec(
                (feat_rows, chunk),
                functools.partial(_im_input_window, **dims),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (basis_rows, cc.PIXELS_PER_TILE),
                functools.partial(_im_tile, base=base),
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
            _fwd_kernel, n_sh, chunk, x_tiles, n_tiles, n_win, base
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (cc.OUT_ROWS, (n_tiles + 1) * cc.PIXELS_PER_TILE), jnp.float32
        ),
        interpret=interpret,
    )(step_tile_packed, tile_info, feat, basis)


def _bwd_kernel(n_sh, chunk_len, x_tiles, n_tiles, n_win, base, tile_ref,
                info_ref, feat_ref, basis_ref, gi_ref, gout_ref, t_col,
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

    # chunk-level early exit once every pixel saturates, and empty steps
    # (unused tail sweep, lo == hi) skip straight to the zero-write
    # (ops/render.py)
    compute = (hi > lo) & (sat_ref[0] == 0)

    @pl.when(compute)
    def _():
        f = feat_ref[:]
        chunk = f.shape[1]
        t = _alpha_terms(f, tx, ty, lo, hi, clamp=True)
        at, op = t["at"], t["op"]
        rdet = t["rdet"]
        a, b, c = t["a"], t["b"], t["c"]
        ul, vl = t["ul"], t["vl"]

        # at <= ALPHA_CLAMP < 0.999999: _log_one_minus's guard is redundant
        loma = jnp.log1p(-at)
        tpref = t_col[:] * jnp.exp(_prefix_scan_strict(loma, False))
        active = tpref >= cc.T_EPS
        # at is pre-clamped and pre-masked, so this IS the reference
        # backward's clamped weight (render_backward.cu:193-196)
        wgt = jnp.where(active, at * tpref, 0.0)

        g = gi_ref[0:3, :]  # (3, 256)
        basis = basis_ref[0:n_sh, :]  # (n_sh, 256)
        gb = jnp.concatenate(
            [g[ch : ch + 1, :] * basis for ch in range(3)], axis=0
        )  # (3*n_sh, 256)
        clo_, chi_ = _sh_color_rows(n_sh)
        coeff = f[clo_:chi_, :]  # (3*n_sh, CHUNK)
        # A[p, s] = sum_ck gb[ck, p] * coeff[ck, s]
        A = _mm(gb, coeff, (((0,), (0,))))  # (256, CHUNK)
        cw = A * wgt
        pg_incl = pg_col[:] + _prefix_scan_strict(cw, False) + cw
        D = e_col[:] - pg_incl

        roma = 1.0 / (1.0 - at)  # at <= ALPHA_CLAMP, 0 on masked lanes
        # basis-moment gradient reduction (see ops/render._bwd_kernel): one
        # (6, 256) @ (256, CHUNK) matmul + row algebra replaces five full
        # gradient fields and six vector reductions.  q carries alpha *
        # grad_alpha with the -1/2 deferred to the (6, CHUNK) T6 rows;
        # multiplying by the pre-masked, pre-clamped `at` applies the
        # active&at>0 mask and the reference's alpha clamp in one op.
        q = at * jnp.where(active, A * tpref - D * roma, 0.0)
        pbasis = _pixel_basis(f.dtype)  # (256, 6)
        T6 = -0.5 * _mm(pbasis, q, (((0,), (0,))))  # (6, CHUNK)
        m1, su, sv = T6[0:1, :], T6[1:2, :], T6[2:3, :]
        suu, svv, suv = T6[3:4, :], T6[4:5, :], T6[5:6, :]
        mu = su - ul * m1
        mv = sv - vl * m1
        muu = suu - ul * (2.0 * su - ul * m1)
        mvv = svv - vl * (2.0 * sv - vl * m1)
        muv = suv - ul * sv - vl * (su - ul * m1)
        smh = rdet * (c * muu - 2.0 * b * muv + a * mvv)
        gu_row = -2.0 * rdet * (c * mu - b * mv)
        gv_row = -2.0 * rdet * (a * mv - b * mu)
        gop_row = -2.0 * m1 / jnp.maximum(op, 1e-30)
        ga_row = rdet * (mvv - c * smh)
        gb_row = 2.0 * rdet * (b * smh - muv)
        gc_row = rdet * (muu - a * smh)

        # grad wrt SH coefficients (clamped alpha, like the DC rgb grad)
        clo, chi = _sh_color_rows(n_sh)
        feat_rows = gout_ref.shape[0]
        gblock = jnp.concatenate(
            [
                gu_row,
                gv_row,
                gop_row,
                ga_row,
                gb_row,
                gc_row,
                _mm(gb, wgt, (((1,), (0,)))),
                jnp.zeros((feat_rows - chi, chunk), jnp.float32),
            ],
            axis=0,
        )
        # boundary windows merge with the resident block (see ops/render.py)
        prev = jnp.where(new_window, 0.0, gout_ref[:])
        gout_ref[:] = jnp.where(t["in_range"], gblock, prev)

        t_col[:] *= jnp.exp(jnp.sum(loma, axis=1, keepdims=True))
        pg_col[:] += jnp.sum(cw, axis=1, keepdims=True)
        sat_ref[0] = (jnp.max(t_col[:]) < cc.T_EPS).astype(jnp.int32)

    @pl.when(~compute)
    def _():
        chunk = gout_ref.shape[1]
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
        in_range = (lane >= lo) & (lane < hi)
        prev = jnp.where(new_window, 0.0, gout_ref[:])
        gout_ref[:] = jnp.where(in_range, 0.0, prev)


@functools.partial(
    jax.jit,
    static_argnames=("n_sh", "n_tiles", "x_tiles", "chunk", "interpret"),
)
def _render_bwd(feat, basis, meta, gi, *, n_sh, n_tiles, x_tiles, chunk,
                interpret):
    step_tile_packed, tile_info = meta
    n_splats = feat.shape[1]
    g_steps = 2 * step_tile_packed.shape[0]
    n_win = n_splats // chunk
    base = _tile_pack_base(n_tiles)
    dims = dict(chunk=chunk, n_tiles=n_tiles, n_win=n_win, base=base)
    feat_rows = feat.shape[0]
    basis_rows = basis.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(g_steps,),
        in_specs=[
            pl.BlockSpec(
                (feat_rows, chunk),
                functools.partial(_im_input_window, **dims),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (basis_rows, cc.PIXELS_PER_TILE),
                functools.partial(_im_tile, base=base),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (cc.OUT_ROWS, cc.PIXELS_PER_TILE),
                functools.partial(_im_tile, base=base),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (feat_rows, chunk),
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
            _bwd_kernel, n_sh, chunk, x_tiles, n_tiles, n_win, base
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (feat_rows, n_splats + chunk), jnp.float32
        ),
        interpret=interpret,
    )(step_tile_packed, tile_info, feat, basis, gi)
    return out[:, :n_splats]


# ---------------------------------------------------------------------------
# custom_vjp wrapper
# ---------------------------------------------------------------------------


def _finish(premul_t, background_rgb, n_tiles, empty_tile):
    out = premul_t[:, : n_tiles * cc.PIXELS_PER_TILE]
    rgb = jnp.where(empty_tile, 0.0, out[0:3, :])
    T = jnp.where(empty_tile[0], 1.0, out[3, :])
    bg_w = jnp.where(T > cc.BG_T_EPS, T, 0.0)
    img = rgb + bg_w[None, :] * background_rgb[:, None]
    return jnp.concatenate([img, T[None, :]], axis=0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def _render_core(feat, basis, meta, background_rgb, empty_tile, n_sh,
                 n_tiles, x_tiles, chunk, interpret):
    raw = _render_fwd(
        feat, basis, meta, n_sh=n_sh, n_tiles=n_tiles, x_tiles=x_tiles,
        chunk=chunk, interpret=interpret,
    )
    return _finish(raw, background_rgb, n_tiles, empty_tile)


def _render_core_fwd(feat, basis, meta, background_rgb, empty_tile, n_sh,
                     n_tiles, x_tiles, chunk, interpret):
    out = _render_core(
        feat, basis, meta, background_rgb, empty_tile, n_sh, n_tiles,
        x_tiles, chunk, interpret,
    )
    return out, (feat, basis, meta, out)


def _render_core_bwd(n_sh, n_tiles, x_tiles, chunk, interpret, res, g_out):
    feat, basis, meta, out = res
    img, T = out[0:3, :], out[3, :]
    g_img, g_t = g_out[0:3, :], g_out[3, :]
    e_row = jnp.sum(img * g_img, axis=0) + g_t * T
    pad = (n_tiles + 1) * cc.PIXELS_PER_TILE - e_row.shape[0]
    gi = jnp.concatenate([g_img, e_row[None, :]], axis=0)
    gi = jnp.pad(gi, ((0, cc.OUT_ROWS - 4), (0, pad)))
    gfeat = _render_bwd(
        feat, basis, meta, gi, n_sh=n_sh, n_tiles=n_tiles, x_tiles=x_tiles,
        chunk=chunk, interpret=interpret,
    )
    bg_w = jnp.where(T > cc.BG_T_EPS, T, 0.0)
    g_bg = jnp.sum(g_img * bg_w[None, :], axis=1)
    g_basis = np.zeros(basis.shape, jax.dtypes.float0)
    gmeta = tuple(np.zeros(m.shape, jax.dtypes.float0) for m in meta)
    g_empty = np.zeros((1, n_tiles * cc.PIXELS_PER_TILE), jax.dtypes.float0)
    return gfeat, g_basis, gmeta, g_bg, g_empty


_render_core.defvjp(_render_core_fwd, _render_core_bwd)


def render_tiles_sh(
    feat: jax.Array,       # (sh_feat_rows(n_sh) padded, S) splat features
    basis: jax.Array,      # (pad8(n_sh), (n_tiles+1)*256) per-pixel SH basis
    meta,
    background_rgb: jax.Array,
    tile_has_output: jax.Array,
    *,
    n_sh: int,
    n_tiles: int,
    x_tiles: int,
    chunk: int,
    interpret: bool | None = None,
):
    """Per-pixel-SH rasterization; returns (image (n_tiles,256,3), T)."""
    if interpret is None:
        interpret = default_interpret()
    empty_tile = jnp.repeat(~tile_has_output, cc.PIXELS_PER_TILE)[None, :]
    out = _render_core(
        feat, jax.lax.stop_gradient(basis), meta, background_rgb,
        jax.lax.stop_gradient(empty_tile),
        n_sh, n_tiles, x_tiles, chunk, bool(interpret),
    )
    img = out[0:3, :].reshape(3, n_tiles, cc.PIXELS_PER_TILE)
    T = out[3, :].reshape(n_tiles, cc.PIXELS_PER_TILE)
    return jnp.moveaxis(img, 0, -1), T


def build_pixel_basis(camera_K, width, height, camera_T_world, n_sh, grid):
    """SH basis per padded-grid pixel, shaped (pad8(n_sh), (n_tiles+1)*256).

    The view direction is the world-frame unit ray through each pixel
    (reference: splat_py/utils.py:112-123 + render.cu:44-51).  The +1 tile
    block keeps the kernels' dummy-chunk index in range.
    """
    from gaussian_splatting_tpu import geometry as geo
    from gaussian_splatting_tpu.ops.reference_impl import image_to_tiles

    rays = geo.compute_rays_in_world_frame(
        camera_K, grid.image_width_padded, grid.image_height_padded,
        camera_T_world,
    )
    basis = geo.sh_basis(rays, n_sh)  # (Hp, Wp, n_sh)
    tiles = image_to_tiles(basis, grid)  # (n_tiles, 256, n_sh)
    b = jnp.moveaxis(tiles, -1, 0).reshape(n_sh, -1)
    rows = _pad8(n_sh)
    b = jnp.pad(b, ((0, rows - n_sh), (0, 0)))
    return jnp.pad(b, ((0, 0), (0, cc.PIXELS_PER_TILE)))
