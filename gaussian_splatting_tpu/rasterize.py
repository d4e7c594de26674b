"""Full forward rendering pipeline: geometry -> culling -> Pallas rasterizer.

TPU re-design of splat_py/rasterize.py:18-112 ``rasterize``.  Differences:
the reference boolean-indexes the scene down to the visible subset (dynamic
shapes); here every stage runs on the full fixed-capacity arrays with a
visibility mask, and invisible gaussians are excluded by the tile
assignment, so all shapes are static and the whole pipeline jit-compiles.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from gaussian_splatting_tpu import geometry as geo
from gaussian_splatting_tpu import culling as cu
from gaussian_splatting_tpu.culling import (
    frustum_visible_rows,
    layout_with_features,
)
from gaussian_splatting_tpu.ops import common as cc
from gaussian_splatting_tpu.ops.depth import (
    depth_feature_rows,
    render_depth_tiles,
)
from gaussian_splatting_tpu.ops import render_sh as rsh
from gaussian_splatting_tpu.ops.render import (
    _finish,
    _render_bwd,
    _render_fwd,
    build_step_meta,
    default_interpret,
    pad_feature_rows,
    render_tiles,
    splat_feature_rows,
)
from gaussian_splatting_tpu.ops.reference_impl import tiles_to_image
from gaussian_splatting_tpu.structs import Camera, TileGrid


class RenderResult(NamedTuple):
    image: jax.Array  # (H, W, 3)
    visible: jax.Array  # (N,) bool — complement of the reference culling_mask
    uv: jax.Array  # (N, 2) projected centres (all gaussians)
    transmittance: jax.Array  # (n_tiles, 256)
    num_splats: jax.Array  # () i32
    num_visible: jax.Array  # () i32 contributing gaussians this frame
    tier_members: jax.Array  # (n_tiers,) i32 per-tier member counts
    overflow: jax.Array  # () bool — capacity-fixable work drop (grow bucket)
    truncated: jax.Array  # () i32 — oversized-window tail cells dropped


def _active_sh_coeffs(n_sh_band: int) -> int:
    return {0: 1, 1: 4, 2: 9, 3: 16}[n_sh_band]


def _check_inputs(params: dict, alive, camera_T_world, camera):
    """Static shape/dtype validation at the API boundary.

    TPU analogue of the reference's CHECK_VALID_INPUT / CHECK_FLOAT_TENSOR
    launcher macros (src/checks.cuh:1-16): every kernel there validates its
    tensors; here the jit boundary is the one place shapes are visible, so
    one pass covers the whole pipeline.  Costs nothing at runtime (shapes
    are static under jit)."""
    n = params["xyz"].shape[0]
    want = dict(
        xyz=(n, 3), rgb=(n, 3), opacity=(n, 1), scale=(n, 3),
        quaternion=(n, 4),
    )
    for k, s in want.items():
        if k not in params:
            raise ValueError(f"params missing '{k}'")
        if tuple(params[k].shape) != s:
            raise ValueError(
                f"params['{k}'] shape {tuple(params[k].shape)} != {s}"
            )
        if not jnp.issubdtype(params[k].dtype, jnp.floating):
            raise TypeError(
                f"params['{k}'] dtype {params[k].dtype} is not floating"
            )
    sh = params.get("sh")
    if sh is not None and (
        sh.ndim != 3 or sh.shape[0] != n or sh.shape[1] != 3
    ):
        raise ValueError(
            f"params['sh'] shape {tuple(sh.shape)} != ({n}, 3, n_coeffs)"
        )
    if alive.shape != (n,) or alive.dtype != jnp.bool_:
        raise ValueError(
            f"alive must be ({n},) bool, got {alive.shape} {alive.dtype}"
        )
    if tuple(camera_T_world.shape) != (4, 4):
        raise ValueError(
            f"camera_T_world shape {tuple(camera_T_world.shape)} != (4, 4)"
        )
    if tuple(camera.K.shape) != (3, 3):
        raise ValueError(f"camera.K shape {tuple(camera.K.shape)} != (3, 3)")


def _dc_fwd_impl(feat_g, background_rgb, uv, conic, z, visible, grid,
                 mh_dist, splat_capacity, chunk, visible_capacity,
                 tier_capacities, precision, interpret):
    layout, feat, aux = cu._layout_impl(
        uv, conic, z, visible, feat_g, grid, mh_dist, splat_capacity,
        chunk, visible_capacity, tier_capacities, precision,
        carry_gid=False,  # ids are never read on the hot path; one fewer
        # candidate-sort operand (~0.7 ms/M cells, PERF.md)
    )
    meta = build_step_meta(layout, grid.tile_count, chunk)
    featp = pad_feature_rows(feat)
    empty_tile = jax.lax.stop_gradient(
        jnp.repeat(~layout.tile_has_output, cc.PIXELS_PER_TILE)[None, :]
    )
    raw = _render_fwd(
        featp, meta, n_tiles=grid.tile_count, x_tiles=grid.x_tiles,
        chunk=chunk, interpret=interpret, bf16=precision == "bf16",
    )
    out = _finish(raw, background_rgb, grid.tile_count, empty_tile)
    return out, layout, (featp, meta, out, aux)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10, 11, 12, 13)
)
def _render_dc(feat_g, background_rgb, uv, conic, z, visible, grid,
               mh_dist, splat_capacity, chunk, visible_capacity,
               tier_capacities, precision, interpret):
    """Fused DC hot path: layout + expansion + Pallas render as ONE
    custom_vjp, so the backward kernel can hand the gradient-reduction
    sort its operands DIRECTLY (packed bf16-pair i32 rows, zero-filled
    in-kernel) — the separate layout/render VJP boundary forced an f32
    (R, S) cotangent round-trip (sanitise + pack passes over every padded
    cell).  Semantics match layout_with_features + render_tiles exactly;
    differentiable in feat_g and background_rgb only (the discrete tile
    assignment gives uv/conic/z no gradient, splat_py/rasterize.py:84).

    Returns (out (4, n_tiles*256) = image rows + T row, SplatLayout).
    """
    out, layout, _ = _dc_fwd_impl(
        feat_g, background_rgb, uv, conic, z, visible, grid, mh_dist,
        splat_capacity, chunk, visible_capacity, tier_capacities,
        precision, interpret,
    )
    return out, layout


def _render_dc_fwd(feat_g, background_rgb, uv, conic, z, visible, grid,
                   mh_dist, splat_capacity, chunk, visible_capacity,
                   tier_capacities, precision, interpret):
    out, layout, (featp, meta, out_res, aux) = _dc_fwd_impl(
        feat_g, background_rgb, uv, conic, z, visible, grid, mh_dist,
        splat_capacity, chunk, visible_capacity, tier_capacities,
        precision, interpret,
    )
    zero_tpl = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
        (uv, conic, z, visible),
    )
    res = (
        featp, meta, out_res,
        aux["valid_slot"], aux["pos_sorted"], aux["gid_full"],
        aux["tier_starts"], zero_tpl, feat_g.shape,
    )
    return (out, layout), res


def _render_dc_bwd(grid, mh_dist, splat_capacity, chunk, visible_capacity,
                   tier_capacities, precision, interpret, res, cot):
    (featp, meta, out, valid_slot, pos_sorted, gid_full, tier_starts,
     zero_tpl, feat_shape) = res
    cot_out, _cot_layout = cot
    n_tiles = grid.tile_count
    bf16 = precision == "bf16"
    r, n = feat_shape

    img, T = out[0:3, :], out[3, :]
    g_img, g_t = cot_out[0:3, :], cot_out[3, :]
    # E = sum_ch color_total * g + g_T * T (see ops/render._render_core_bwd)
    e_row = jnp.sum(img * g_img, axis=0) + g_t * T
    pad = (n_tiles + 1) * cc.PIXELS_PER_TILE - e_row.shape[0]
    gi = jnp.concatenate([g_img, e_row[None, :]], axis=0)
    gi = jnp.pad(gi, ((0, cc.OUT_ROWS - 4), (0, pad)))

    graw = _render_bwd(
        featp, meta, gi, n_tiles=n_tiles, x_tiles=grid.x_tiles,
        chunk=chunk, interpret=interpret, bf16=bf16, packed=bf16,
    )
    m_comp = cu._compacted_width(n, visible_capacity)
    caps = cu._tier_capacities(m_comp, splat_capacity, tier_capacities)
    if bf16:
        gfeat = cu._reduce_splat_grads(
            graw, None, pos_sorted, gid_full, tier_starts, caps, m_comp,
            packed_rows=r,
        )
    else:
        gfeat = cu._reduce_splat_grads(
            graw[:r], valid_slot, pos_sorted, gid_full, tier_starts, caps,
            m_comp, bf16=False,
        )

    bg_w = jnp.where(T > cc.BG_T_EPS, T, 0.0)
    g_bg = jnp.sum(g_img * bg_w[None, :], axis=1)

    import numpy as np

    def zero_cot(s):
        if s.dtype == jnp.bool_:
            return np.zeros(s.shape, jax.dtypes.float0)
        return jnp.zeros(s.shape, s.dtype)

    g_uv, g_conic, g_z, g_vis = jax.tree_util.tree_map(zero_cot, zero_tpl)
    return (gfeat, g_bg, g_uv, g_conic, g_z, g_vis)


_render_dc.defvjp(_render_dc_fwd, _render_dc_bwd)


def rasterize(
    params: dict,
    alive: jax.Array,
    camera_T_world: jax.Array,
    camera: Camera,
    *,
    near_thresh: float,
    far_thresh: float,
    cull_mask_padding: float,
    mh_dist: float,
    background_rgb: jax.Array,
    n_sh_band: int = 0,
    use_sh_precompute: bool = True,
    splat_capacity: int,
    chunk: int = 256,
    uv_offset: Optional[jax.Array] = None,
    interpret: Optional[bool] = None,
    visible_capacity: int = 0,
    tier_capacities: Optional[tuple] = None,
    kernel_precision: str = "f32",
) -> RenderResult:
    """Render the scene from one camera.

    params: dict of capacity-sized parameter arrays (GaussianScene.params()).
    uv_offset: optional (2, N) zero rows; gradients wrt it are the uv-space
      gradients the trainer accumulates for densification (replacing the
      reference's ``uv.retain_grad()``, splat_py/trainer.py:360).
    """
    _check_inputs(params, alive, camera_T_world, camera)
    xyz = params["xyz"]
    grid = TileGrid(camera.height, camera.width)

    # component-wise ("rows") geometry chain: keeps N on the TPU lane dim
    # throughout — (N, C) intermediates with C in {2, 3} lower to strided
    # relayout loops that dominated the round-2 profile (see geometry.py
    # rows API note)
    xyzT = xyz.T  # (3, N)
    xc, yc, zc = geo.transform_rows(xyzT[0], xyzT[1], xyzT[2], camera_T_world)
    u, v = geo.project_rows(xc, yc, zc, camera.K)
    if uv_offset is not None:
        u = u + uv_offset[0]
        v = v + uv_offset[1]
    visible = frustum_visible_rows(
        u, v, zc, (camera.width, camera.height),
        near_thresh, far_thresh, cull_mask_padding,
    )
    visible = visible & alive

    sig6 = geo.sigma_world_rows(params["quaternion"], params["scale"])
    conic3 = geo.conic_rows(sig6, xc, yc, zc, camera.K, camera_T_world)

    n_sh = _active_sh_coeffs(n_sh_band)
    opacity_v = jax.nn.sigmoid(params["opacity"][:, 0])
    per_pixel_sh = n_sh > 1 and not use_sh_precompute
    if per_pixel_sh:
        # per-pixel SH: carry the raw 3 x n_sh coefficients; the kernel
        # contracts them with each pixel's view-direction basis
        # (reference: splat_py/rasterize.py:95-99 else-branch)
        coeffs = jnp.concatenate(
            [params["rgb"][:, :, None], params["sh"][:, :, : n_sh - 1]], axis=2
        )
        feat_g = rsh.sh_splat_feature_rows(u, v, opacity_v, conic3, coeffs)
        feat_rows = rsh._pad8(rsh.sh_feat_rows(n_sh))
    else:
        if n_sh == 1:
            rgbT = params["rgb"].T
        else:
            coeffs = jnp.concatenate(
                [params["rgb"][:, :, None], params["sh"][:, :, : n_sh - 1]],
                axis=2,
            )
            center = geo.camera_center_from_pose(camera_T_world)
            rgbT = geo.precompute_rgb_from_sh(coeffs, xyz, center).T
        # the DC-path rasterizer scales colour by SH_0 (src/render.cu
        # sh_to_rgb with N_SH=1); fold it into the features so the kernel
        # stays linear
        feat_g = splat_feature_rows(
            u, v, opacity_v, *conic3,
            rgbT[0] * geo.SH_0, rgbT[1] * geo.SH_0, rgbT[2] * geo.SH_0,
        )
        feat_rows = cc.FEAT_ROWS

    if per_pixel_sh:
        layout, feat = layout_with_features(
            (u, v), conic3, zc, visible, feat_g, grid, mh_dist,
            splat_capacity, chunk, visible_capacity, tier_capacities,
            kernel_precision,
        )
        meta = build_step_meta(layout, grid.tile_count, chunk)
        feat = pad_feature_rows(feat, feat_rows)
        basis = rsh.build_pixel_basis(
            camera.K, camera.width, camera.height, camera_T_world, n_sh, grid
        )
        img_tiles, T = rsh.render_tiles_sh(
            feat, basis, meta, background_rgb, layout.tile_has_output,
            n_sh=n_sh, n_tiles=grid.tile_count, x_tiles=grid.x_tiles,
            chunk=chunk, interpret=interpret,
        )
    else:
        # the DC hot path runs the FUSED layout+render custom_vjp: its
        # backward kernel emits the gradient-reduction sort's operands
        # directly (packed bf16 pairs under kernel_precision="bf16",
        # zero-filled in-kernel) — no f32 cotangent round-trip between
        # a layout VJP and a render VJP.  kernel_precision="bf16" also
        # switches the kernels' big triangular prefix matmuls to the
        # hi/lo bf16-split (2 single-pass MXU matmuls, ~2^-16 relative
        # error — see ops.render._mm_scan); the small real
        # (colour/gradient) matmuls stay f32 (single-pass bf16 there
        # puts ~2^-9 noise straight on the image).
        interp = (
            default_interpret() if interpret is None else bool(interpret)
        )
        out, layout = _render_dc(
            feat_g, background_rgb, (u, v), conic3, zc, visible, grid,
            mh_dist, splat_capacity, chunk, visible_capacity,
            tier_capacities, kernel_precision, interp,
        )
        img_rows = out[0:3, :].reshape(
            3, grid.tile_count, cc.PIXELS_PER_TILE
        )
        img_tiles = jnp.moveaxis(img_rows, 0, -1)
        T = out[3, :].reshape(grid.tile_count, cc.PIXELS_PER_TILE)
    image = tiles_to_image(img_tiles, grid)
    return RenderResult(
        image=image,
        visible=visible,
        uv=jnp.stack([u, v], axis=1),
        transmittance=T,
        num_splats=layout.num_splats,
        num_visible=layout.num_visible,
        tier_members=layout.tier_members,
        overflow=layout.overflow,
        truncated=layout.truncated,
    )


def render_depth(
    params: dict,
    alive: jax.Array,
    camera_T_world: jax.Array,
    camera: Camera,
    *,
    alpha_threshold: float,
    near_thresh: float,
    cull_mask_padding: float,
    mh_dist: float,
    splat_capacity: int,
    chunk: int = 256,
    interpret: Optional[bool] = None,
    visible_capacity: int = 0,
    tier_capacities: Optional[tuple] = None,
) -> jax.Array:
    """Depth image (H, W, 1); -1 where no splat crosses alpha_threshold.

    Mirrors splat_py/depth.py:17-88 (note: no far-plane cull there).
    """
    _check_inputs(params, alive, camera_T_world, camera)
    grid = TileGrid(camera.height, camera.width)
    xyzT = params["xyz"].T
    xc, yc, zc = geo.transform_rows(
        xyzT[0], xyzT[1], xyzT[2], camera_T_world
    )
    u, v = geo.project_rows(xc, yc, zc, camera.K)
    visible = frustum_visible_rows(
        u, v, zc, (camera.width, camera.height),
        near_thresh, jnp.inf, cull_mask_padding,
    )
    visible = visible & alive

    sig6 = geo.sigma_world_rows(params["quaternion"], params["scale"])
    conic3 = geo.conic_rows(sig6, xc, yc, zc, camera.K, camera_T_world)

    opacity_v = jax.nn.sigmoid(params["opacity"][:, 0])
    feat_g = depth_feature_rows(
        u, v, opacity_v, *conic3, geo.camera_distance_rows(xc, yc, zc)
    )
    layout, feat = layout_with_features(
        (u, v), conic3, zc, visible, feat_g, grid, mh_dist,
        splat_capacity, chunk, visible_capacity, tier_capacities,
    )
    meta = build_step_meta(layout, grid.tile_count, chunk)
    feat = pad_feature_rows(feat)

    depth_tiles = render_depth_tiles(
        feat, meta, layout.tile_has_output, alpha_threshold,
        n_tiles=grid.tile_count, x_tiles=grid.x_tiles, chunk=chunk,
        interpret=interpret,
    )
    return tiles_to_image(depth_tiles[..., None], grid)
