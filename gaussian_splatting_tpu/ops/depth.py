"""Forward-only Pallas depth renderer.

TPU re-design of render_depth_kernel (reference: src/depth.cu:7-177):
per pixel, walk the tile's depth-sorted splats front to back accumulating
alpha (no 1/255 skip, no saturation break) and report the Euclidean
camera-frame distance of the first splat at which the accumulated alpha
crosses ``alpha_threshold``.  Pixels that never cross keep -1
(reference: splat_py/depth.py:75-77).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gaussian_splatting_tpu.ops import common as cc
from gaussian_splatting_tpu.ops.render import (
    _alpha_terms,
    _col_to_row,
    _im_input_window,
    _im_tile,
    _log_one_minus,
    _step_scalars,
    _tile_pack_base,
    _tri_matrices,
    default_interpret,
)

# feature row 6 holds the splat's camera-frame Euclidean distance
FEAT_DEPTH = 6


def depth_feature_rows(u, v, opacity_v, c0, c1, c2, dist):
    """Pack per-gaussian depth-render rows ((N,) each), (7, N)."""
    return jnp.stack(
        [u, v, opacity_v, c0 + 0.25, c1 * 0.5, c2 + 0.25, dist]
    )


def depth_features(uv, opacity, conic, xyz_camera):
    """(N, C)-array wrapper over ``depth_feature_rows``."""
    return depth_feature_rows(
        uv[:, 0], uv[:, 1], opacity[:, 0],
        conic[:, 0], conic[:, 1], conic[:, 2],
        jnp.linalg.norm(xyz_camera, axis=1),
    )


def _depth_kernel(alpha_threshold, chunk_len, x_tiles, n_tiles, n_win, base,
                  tile_ref, info_ref, feat_ref, out_ref, t_col, depth_col,
                  found_col, done_ref):
    s = pl.program_id(0)
    _, first, last, _, lo, hi, tx, ty = _step_scalars(
        tile_ref, info_ref, s, chunk_len, x_tiles, n_tiles, n_win, base
    )

    @pl.when(first)
    def _():
        t_col[:] = jnp.ones_like(t_col)
        depth_col[:] = jnp.full_like(depth_col, -1.0)
        found_col[:] = jnp.zeros_like(found_col)
        done_ref[0] = 0

    # early exit once every pixel has found its depth (ops/render.py)
    @pl.when((hi > lo) & (done_ref[0] == 0))
    def _():
        f = feat_ref[:]
        chunk = f.shape[1]
        t = _alpha_terms(f, tx, ty, lo, hi)
        # the depth walk uses the raw alpha (no 1/255 skip): zero only the
        # out-of-range lanes
        at = jnp.where(t["in_range"], t["alpha"], 0.0)
        loma = _log_one_minus(at)
        u_strict, u_incl = _tri_matrices(chunk, f.dtype)
        t_incl = t_col[:] * jnp.exp(_mm_cached(loma, u_incl))
        crossed = (1.0 - t_incl) > alpha_threshold  # (256, CHUNK)
        # first crossing within this chunk: no earlier crossing in the chunk
        prior = _mm_cached(crossed.astype(f.dtype), u_strict) > 0.5
        newly = crossed & (~prior) & (found_col[:] < 0.5)
        depth_row = f[FEAT_DEPTH : FEAT_DEPTH + 1, :]  # (1, CHUNK)
        hit = jnp.sum(
            jnp.where(newly, depth_row, 0.0), axis=1, keepdims=True
        )
        has_hit = jnp.sum(newly.astype(f.dtype), axis=1, keepdims=True) > 0.5
        depth_col[:] = jnp.where(
            (found_col[:] < 0.5) & has_hit, hit, depth_col[:]
        )
        found_col[:] = jnp.maximum(
            found_col[:], has_hit.astype(found_col.dtype)
        )
        t_col[:] *= jnp.exp(jnp.sum(loma, axis=1, keepdims=True))
        done_ref[0] = (jnp.min(found_col[:]) > 0.5).astype(jnp.int32)

    @pl.when(last)
    def _():
        out_ref[0:1, :] = _col_to_row(depth_col[:])
        out_ref[1:, :] = jnp.zeros_like(out_ref[1:, :])


def _mm_cached(a, b):
    return jax.lax.dot_general(
        a, b, dimension_numbers=((((1,), (0,))), ((), ())),
        preferred_element_type=jnp.float32,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "alpha_threshold", "n_tiles", "x_tiles", "chunk", "interpret",
    ),
)
def _depth_call(feat, meta, *, alpha_threshold, n_tiles, x_tiles, chunk,
                interpret):
    step_tile_packed, tile_info = meta
    g_steps = 2 * step_tile_packed.shape[0]
    n_win = feat.shape[1] // chunk
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
            (8, cc.PIXELS_PER_TILE),
            functools.partial(_im_tile, base=base),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((cc.PIXELS_PER_TILE, 1), jnp.float32),
            pltpu.VMEM((cc.PIXELS_PER_TILE, 1), jnp.float32),
            pltpu.VMEM((cc.PIXELS_PER_TILE, 1), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
        ],
    )
    kernel = functools.partial(
        _depth_kernel, float(alpha_threshold), chunk, x_tiles, n_tiles,
        n_win, base
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (8, (n_tiles + 1) * cc.PIXELS_PER_TILE), jnp.float32
        ),
        interpret=interpret,
    )(step_tile_packed, tile_info, feat)


def render_depth_tiles(
    feat,
    meta,
    tile_has_output,
    alpha_threshold: float,
    *,
    n_tiles: int,
    x_tiles: int,
    chunk: int,
    interpret: bool | None = None,
):
    """Depth per tile pixel, (n_tiles, 256); -1 where never crossed."""
    if interpret is None:
        interpret = default_interpret()
    out = _depth_call(
        feat, meta, alpha_threshold=float(alpha_threshold),
        n_tiles=n_tiles, x_tiles=x_tiles,
        chunk=chunk, interpret=bool(interpret),
    )
    depth = out[0, : n_tiles * cc.PIXELS_PER_TILE]
    empty = jnp.repeat(~tile_has_output, cc.PIXELS_PER_TILE)
    depth = jnp.where(empty, -1.0, depth)
    return depth.reshape(n_tiles, cc.PIXELS_PER_TILE)
