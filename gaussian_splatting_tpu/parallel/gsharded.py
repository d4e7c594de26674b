"""Gaussian-sharded (model-parallel) rendering and training.

The reference is strictly single-GPU; its scene size is capped by one
device's memory (SURVEY.md §2.3).  This module shards the SCENE over a
``jax.sharding.Mesh`` axis (default ``"model"``): every device owns
``capacity / D`` gaussian slots — parameters, alive mask, Adam moments and
densification accumulators all sharded on the slot axis — so the maximum
scene size scales with the number of chips.

Per step, inside one ``shard_map``:

1. per-shard geometry (the rows API): each device projects and builds the
   9 splat feature rows for its own slots — O(N/D) work;
2. ONE ``all_gather`` over ICI of the (11, N/D) bundle (feature rows +
   camera depth + visibility).  Its VJP is exactly the ``psum_scatter``
   that reduces every band's feature gradients back to the owning shard —
   the collective the backward pass needs comes for free from autodiff;
3. each device lays out + rasterizes only its own horizontal BAND of tile
   rows: ``TileGrid(band_rows * 16, W)`` with ``v`` shifted by the band
   origin.  Gaussians outside the band clip to empty tile windows in the
   layout, so the candidate sort and the Pallas kernels shrink ~1/D each
   (the layout machinery is reused unchanged — band-local ``v`` rides in
   through the uv argument, whose sanitised value overrides feature row 1,
   see culling._layout_impl's rows-0..5 contract);
4. the image returns row-sharded (``P("model")`` on the pixel-row axis);
   loss (L1 + SSIM) and Adam run OUTSIDE the shard_map under jit's
   automatic SPMD partitioner — the SSIM window shifts become halo
   exchanges XLA inserts on its own.

With D=1 this reduces exactly to trainer.train_step's semantics (same
kernels, same layout, same loss).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gaussian_splatting_tpu import geometry as geo
from gaussian_splatting_tpu import optim
from gaussian_splatting_tpu.culling import (
    frustum_visible_rows,
    layout_with_features,
)
from gaussian_splatting_tpu.losses import train_loss
from gaussian_splatting_tpu.ops import render_sh as rsh
from gaussian_splatting_tpu.ops.reference_impl import tiles_to_image
from gaussian_splatting_tpu.ops.render import (
    build_step_meta,
    pad_feature_rows,
    render_tiles,
    splat_feature_rows,
)
from gaussian_splatting_tpu.structs import TILE_PX, TileGrid

MODEL_AXIS = "model"


def make_model_mesh(n_devices: int | None = None, axis: str = MODEL_AXIS):
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(devs, (axis,))


def _band_rows(y_tiles: int, n_bands: int) -> int:
    """Tile rows per band (ceil); trailing bands may be empty padding."""
    return -(-y_tiles // n_bands)


def shard_state(state, mesh: Mesh, axis: str = MODEL_AXIS):
    """Place a TrainState with every capacity-sized leaf sharded on the
    model axis (params, alive, Adam moments, densify accumulators); scalar
    leaves (e.g. the Adam step count) replicated."""
    cap = state.alive.shape[0]

    def put(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == cap:
            spec = P(axis, *([None] * (x.ndim - 1)))
        else:
            spec = P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, state)


def _band_image(
    params,
    alive,
    uv_offset,  # (2, n_loc) or None
    camera_K,
    camera_T_world,
    background_rgb,
    *,
    config,
    camera_hw,
    n_sh_band,
    n_bands,
    interpret,
    axis,
):
    """Render this device's tile-row band.  Runs INSIDE shard_map: every
    (N,)-row input is the local shard (n_loc = capacity / D)."""
    h, w = camera_hw
    grid_full = TileGrid(h, w)
    band_rows = _band_rows(grid_full.y_tiles, n_bands)

    # --- per-shard geometry (O(N/D)) ------------------------------------
    xyzT = params["xyz"].T
    xc, yc, zc = geo.transform_rows(xyzT[0], xyzT[1], xyzT[2], camera_T_world)
    u, v = geo.project_rows(xc, yc, zc, camera_K)
    if uv_offset is not None:
        u = u + uv_offset[0]
        v = v + uv_offset[1]
    visible = frustum_visible_rows(
        u, v, zc, (w, h),
        config.near_thresh, config.far_thresh, config.cull_mask_padding,
    )
    visible = visible & alive

    sig6 = geo.sigma_world_rows(params["quaternion"], params["scale"])
    conic3 = geo.conic_rows(sig6, xc, yc, zc, camera_K, camera_T_world)
    opacity_v = jax.nn.sigmoid(params["opacity"][:, 0])

    n_sh = {0: 1, 1: 4, 2: 9, 3: 16}[n_sh_band]
    per_pixel_sh = n_sh > 1 and not config.use_sh_precompute
    if per_pixel_sh:
        # per-pixel SH (reference: splat_py/rasterize.py:95-99 else-branch):
        # the bundle carries the raw 3*n_sh coefficient rows; each band
        # contracts them with its own pixels' view-direction basis
        coeffs = jnp.concatenate(
            [params["rgb"][:, :, None], params["sh"][:, :, : n_sh - 1]],
            axis=2,
        )
        feat_g = rsh.sh_splat_feature_rows(
            u, v, opacity_v, conic3, coeffs
        )  # (6 + 3*n_sh, n_loc)
    else:
        if n_sh == 1:
            rgbT = params["rgb"].T
        else:
            coeffs = jnp.concatenate(
                [params["rgb"][:, :, None], params["sh"][:, :, : n_sh - 1]],
                axis=2,
            )
            center = geo.camera_center_from_pose(camera_T_world)
            rgbT = geo.precompute_rgb_from_sh(
                coeffs, params["xyz"], center
            ).T
        feat_g = splat_feature_rows(
            u, v, opacity_v, *conic3,
            rgbT[0] * geo.SH_0, rgbT[1] * geo.SH_0, rgbT[2] * geo.SH_0,
        )
    n_feat = feat_g.shape[0]

    # --- ONE gather of the splat bundle (VJP = psum_scatter) ------------
    bundle = jnp.concatenate(
        [feat_g, zc[None], visible.astype(jnp.float32)[None]]
    )  # (n_feat + 2, n_loc)
    bundle = jax.lax.all_gather(bundle, axis, axis=1, tiled=True)
    feat_full = bundle[:n_feat]
    zc_full = bundle[n_feat]
    vis_full = bundle[n_feat + 1] > 0.5

    # --- band layout + render (O(splats/D)) -----------------------------
    band = jax.lax.axis_index(axis)
    v_origin = (band * band_rows * TILE_PX).astype(jnp.float32)
    band_grid = TileGrid(band_rows * TILE_PX, w)
    # rows 0..5 of the feature bundle are (u, v, op, a, b, c) — the layout
    # re-derives them from the uv/conic args (culling._layout_impl), so the
    # band shift rides in through the uv argument and the inverse affine
    # maps below are exact chains for the gradient (d feat / d arg = 1)
    layout, feat = layout_with_features(
        (feat_full[0], feat_full[1] - v_origin),
        (feat_full[3] - 0.25, feat_full[4] * 2.0, feat_full[5] - 0.25),
        zc_full, vis_full, feat_full, band_grid, config.mh_dist,
        config.splat_capacity, config.chunk, config.visible_capacity,
        config.tier_capacities, config.kernel_precision,
        False,  # per-splat gaussian ids are never read on this path
    )
    meta = build_step_meta(layout, band_grid.tile_count, config.chunk)
    if per_pixel_sh:
        # band-local pixel basis: shifting the principal point by the band
        # origin makes each band-local pixel ray EXACTLY its global ray
        # ((y_local - (cy - v_origin)) = y_global - cy)
        K_band = camera_K - v_origin * jnp.array(
            [[0.0, 0, 0], [0, 0, 1.0], [0, 0, 0]], jnp.float32
        )
        basis = rsh.build_pixel_basis(
            K_band, w, band_grid.image_height_padded, camera_T_world,
            n_sh, band_grid,
        )
        feat = pad_feature_rows(feat, rsh._pad8(rsh.sh_feat_rows(n_sh)))
        img_tiles, _T = rsh.render_tiles_sh(
            feat, basis, meta, background_rgb, layout.tile_has_output,
            n_sh=n_sh, n_tiles=band_grid.tile_count,
            x_tiles=band_grid.x_tiles, chunk=config.chunk,
            interpret=interpret,
        )
    else:
        feat = pad_feature_rows(feat)
        img_tiles, _T = render_tiles(
            feat, meta, background_rgb, layout.tile_has_output,
            n_tiles=band_grid.tile_count, x_tiles=band_grid.x_tiles,
            chunk=config.chunk, interpret=interpret,
            precision=config.kernel_precision,
        )
    band_img = tiles_to_image(img_tiles, band_grid)  # (band_rows*16, w, 3)

    # per-band stats leave as (1,)-arrays sharded on the model axis (psum /
    # pmax have no differentiation rule, and this runs inside value_and_grad;
    # mp_render reduces the (D,) stacks outside the shard_map)
    info = dict(
        num_splats=layout.num_splats[None],
        num_visible=layout.num_visible[None],
        tier_members=layout.tier_members[None],
        overflow=layout.overflow[None].astype(jnp.int32),
        truncated=layout.truncated[None].astype(jnp.int32),
    )
    return band_img, visible, info


def mp_render(
    params,
    alive,
    camera_T_world,
    camera_K,
    *,
    config,
    camera_hw,
    n_sh_band,
    background_rgb,
    mesh,
    axis: str = MODEL_AXIS,
    interpret=None,
    uv_offset=None,
):
    """Full-image forward render with the scene sharded over ``axis``.

    params/alive (and uv_offset if given) must be sharded on their slot
    axis; returns (image (H, W, 3) row-sharded, visible (N,) sharded, info).
    Call under jit with sharded inputs.
    """
    h, w = camera_hw
    n_bands = mesh.shape[axis]

    shard = functools.partial(
        jax.shard_map,
        mesh=mesh,
        # pallas_call outputs carry no varying-mesh-axes annotation (same
        # caveat as mesh.dp_train_step); every cross-device value is
        # explicitly reduced or intentionally band/shard-local
        check_vma=False,
    )

    pspec = P(axis)
    has_uv = uv_offset is not None

    @functools.partial(
        shard,
        in_specs=(pspec, pspec, P(None, axis) if has_uv else P(),
                  P(), P(), P()),
        out_specs=(P(axis), pspec, P(axis)),
    )
    def run(params, alive, uv_off, K, pose, bg):
        return _band_image(
            params, alive, uv_off if has_uv else None, K, pose, bg,
            config=config, camera_hw=camera_hw, n_sh_band=n_sh_band,
            n_bands=n_bands, interpret=interpret, axis=axis,
        )

    dummy = uv_offset if has_uv else jnp.zeros((), jnp.float32)
    band_imgs, visible, per_band = run(
        params, alive, dummy, camera_K, camera_T_world, background_rgb
    )
    # bands cover ceil(y_tiles/D)*D*16 >= H pixel rows; crop the overhang
    image = band_imgs[:h]
    # reduce the (D,) per-band stacks to the watermark signals the runner
    # consumes (capacities are PER BAND in MP mode, hence max not sum)
    info = dict(
        num_splats=jnp.sum(per_band["num_splats"]),
        num_visible=jnp.max(per_band["num_visible"]),
        tier_members=jnp.max(per_band["tier_members"], axis=0),
        overflow=jnp.any(per_band["overflow"] > 0),
        truncated=jnp.sum(per_band["truncated"]),
    )
    return image, visible, info


def make_2d_mesh(d_data: int, d_model: int, axes=("data", MODEL_AXIS)):
    """(d_data, d_model) mesh: cameras over ICI axis 0, scene shards over
    axis 1."""
    devs = np.array(jax.devices()[: d_data * d_model]).reshape(
        d_data, d_model
    )
    return Mesh(devs, axes)


@functools.partial(
    jax.jit,
    static_argnames=(
        "config", "camera_hw", "n_sh_band", "mesh", "interpret",
    ),
    donate_argnums=(0,),
)
def dp_mp_train_step(
    state,
    gt_batch: jax.Array,  # (Dd, H, W, 3) f32 or uint8
    K_batch: jax.Array,  # (Dd, 3, 3)
    pose_batch: jax.Array,  # (Dd, 4, 4)
    bg_batch: jax.Array,  # (Dd, 3)
    *,
    config,
    camera_hw: tuple,
    n_sh_band: int,
    mesh: Mesh,  # 2D ("data", "model")
    interpret=None,
):
    """One step on a 2D mesh: Dd cameras x Dm gaussian shards.

    Composes both parallel axes: the scene/optimizer state is sharded over
    "model" and replicated over "data"; each data replica renders one
    camera with its model group's tile-row bands, gathers the bands into
    its full image over the "model" axis, and gradients are pmean-reduced
    over "data" (dp_train_step semantics along that axis).  With Dd=1 this
    is mp_train_step; with Dm=1 it is dp_train_step.
    """
    h, w = camera_hw
    n_bands = mesh.shape[MODEL_AXIS]
    cap = state.alive.shape[0]

    # per-leaf specs: capacity-sized leaves shard over "model" (replicated
    # over "data"); scalar leaves (Adam's count) replicate everywhere
    def leaf_spec(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == cap:
            return P(MODEL_AXIS)
        return P()

    state_specs = jax.tree_util.tree_map(leaf_spec, state)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(state_specs, P("data"), P("data"), P("data"), P("data")),
        out_specs=(state_specs, P()),
        check_vma=False,  # pallas outputs carry no vma (see mp_render)
    )
    def sharded(state, gt, K, pose, bg):
        gt0 = gt[0]
        if gt0.dtype == jnp.uint8:
            gt0 = gt0.astype(jnp.float32) * (
                1.0 / config.saturated_pixel_value
            )

        def loss_fn(params, uv_offset):
            band_img, visible, info = _band_image(
                params, state.alive, uv_offset, K[0], pose[0], bg[0],
                config=config, camera_hw=camera_hw, n_sh_band=n_sh_band,
                n_bands=n_bands, interpret=interpret, axis=MODEL_AXIS,
            )
            image = jax.lax.all_gather(
                band_img, MODEL_AXIS, axis=0, tiled=True
            )[:h]
            loss, psnr = train_loss(image, gt0, config.ssim_frac)
            # every model replica evaluates an identical copy of the full-
            # image loss, and the all_gather's psum_scatter VJP SUMS the
            # n_bands identical cotangents — differentiate loss/n_bands so
            # that sum is the true gradient (the returned loss value is
            # rescaled back below)
            return loss / n_bands, (psnr, visible, info)

        n_loc = state.alive.shape[0]
        uv_zero = jnp.zeros((2, n_loc), jnp.float32)
        (loss, (psnr, visible, info)), (gparams, g_uv) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(state.params, uv_zero)
        loss = loss * n_bands

        # camera-axis reductions (model-axis grads are already reduced by
        # the all_gathers' psum_scatter VJPs)
        gparams = jax.lax.pmean(gparams, "data")
        loss = jax.lax.pmean(loss, "data")
        psnr = jax.lax.pmean(psnr, "data")
        num_splats = jax.lax.psum(info["num_splats"][0], MODEL_AXIS)
        num_splats = jax.lax.pmax(num_splats, "data")
        num_visible = jax.lax.pmax(
            jax.lax.pmax(info["num_visible"][0], MODEL_AXIS), "data"
        )
        tier_members = jax.lax.pmax(
            jax.lax.pmax(info["tier_members"][0], MODEL_AXIS), "data"
        )
        oflow = jax.lax.pmax(
            jax.lax.pmax(info["overflow"][0], MODEL_AXIS), "data"
        ) > 0
        # truncated is a dropped-cell COUNT: sum over bands and cameras
        trunc = jax.lax.psum(
            jax.lax.psum(info["truncated"][0], MODEL_AXIS), "data"
        )

        opt = optim.make_optimizer(config)
        updates, opt_state = opt.update(
            gparams, state.opt_state, state.params
        )
        ok = (~oflow | config.overflow_updates) & jnp.isfinite(loss)
        for g in jax.tree_util.tree_leaves(gparams):
            ok &= jnp.isfinite(jnp.sum(g))
        params = jax.tree_util.tree_map(
            lambda p, u: jnp.where(ok, p + u, p), state.params, updates
        )
        opt_state = jax.tree_util.tree_map(
            lambda new, old: jnp.where(ok, new, old),
            opt_state, state.opt_state,
        )

        fxfy = jnp.stack([K[0, 0, 0], K[0, 1, 1]])
        uv_grad = (jnp.abs(g_uv) * fxfy[:, None] * visible[None, :]).T
        uv_grad = jax.lax.psum(uv_grad, "data")
        seen = jax.lax.psum(visible.astype(jnp.int32), "data")
        new_state = state._replace(
            params=params,
            opt_state=opt_state,
            uv_grad_accum=state.uv_grad_accum + jnp.where(ok, uv_grad, 0.0),
            xyz_grad_accum=state.xyz_grad_accum
            + jnp.where(ok, jnp.abs(gparams["xyz"]), 0.0),
            grad_accum_count=state.grad_accum_count
            + seen * ok.astype(jnp.int32),
        )
        n_alive = jax.lax.psum(
            jnp.sum(state.alive.astype(jnp.int32)), MODEL_AXIS
        )
        return new_state, dict(
            loss=loss, psnr=psnr, num_splats=num_splats,
            num_visible=num_visible, tier_members=tier_members,
            overflow=oflow, truncated=trunc, n_alive=n_alive,
        )

    return sharded(state, gt_batch, K_batch, pose_batch, bg_batch)


@functools.partial(
    jax.jit,
    static_argnames=(
        "config", "camera_hw", "n_sh_band", "mesh", "axis", "interpret",
    ),
)
def mp_eval_step(
    state,
    gt_image: jax.Array,
    camera_K: jax.Array,
    camera_T_world: jax.Array,
    *,
    config,
    camera_hw: tuple,
    n_sh_band: int,
    mesh: Mesh,
    axis: str = MODEL_AXIS,
    interpret=None,
):
    """Model-parallel analogue of trainer.eval_step (test PSNR/SSIM)."""
    from gaussian_splatting_tpu.losses import eval_psnr_ssim

    if gt_image.dtype == jnp.uint8:
        gt_image = gt_image.astype(jnp.float32) * (
            1.0 / config.saturated_pixel_value
        )
    image, _visible, info = mp_render(
        state.params, state.alive, camera_T_world, camera_K,
        config=config, camera_hw=camera_hw, n_sh_band=n_sh_band,
        background_rgb=jnp.zeros(3, jnp.float32), mesh=mesh, axis=axis,
        interpret=interpret,
    )
    psnr, ssim_val = eval_psnr_ssim(image, gt_image)
    return image, psnr, ssim_val, info["overflow"]


@functools.partial(
    jax.jit,
    static_argnames=(
        "config", "camera_hw", "n_sh_band", "mesh", "axis", "interpret",
    ),
    donate_argnums=(0,),
)
def mp_train_step(
    state,
    gt_image: jax.Array,  # (H, W, 3) f32 or uint8, replicated
    camera_K: jax.Array,
    camera_T_world: jax.Array,
    background_rgb: jax.Array,
    *,
    config,
    camera_hw: tuple,
    n_sh_band: int,
    mesh: Mesh,
    axis: str = MODEL_AXIS,
    interpret=None,
):
    """One optimisation step with the scene model-parallel over ``axis``.

    Same semantics as trainer.train_step (one camera, full schedule
    compatibility); state must be placed with ``shard_state``.  Loss and
    Adam run auto-sharded outside the shard_map.
    """
    h, w = camera_hw
    if gt_image.dtype == jnp.uint8:
        gt_image = gt_image.astype(jnp.float32) * (
            1.0 / config.saturated_pixel_value
        )
    cap = state.alive.shape[0]

    def loss_fn(params, uv_offset):
        image, visible, info = mp_render(
            params, state.alive, camera_T_world, camera_K,
            config=config, camera_hw=camera_hw, n_sh_band=n_sh_band,
            background_rgb=background_rgb, mesh=mesh, axis=axis,
            interpret=interpret, uv_offset=uv_offset,
        )
        loss, psnr = train_loss(image, gt_image, config.ssim_frac)
        return loss, (psnr, visible, info)

    uv_zero = jnp.zeros((2, cap), jnp.float32)
    (loss, (psnr, visible, info)), (gparams, g_uv) = jax.value_and_grad(
        loss_fn, argnums=(0, 1), has_aux=True
    )(state.params, uv_zero)

    opt = optim.make_optimizer(config)
    updates, opt_state = opt.update(gparams, state.opt_state, state.params)
    ok = (~info["overflow"] | config.overflow_updates) & jnp.isfinite(loss)
    for g in jax.tree_util.tree_leaves(gparams):
        ok &= jnp.isfinite(jnp.sum(g))
    params = jax.tree_util.tree_map(
        lambda p, u: jnp.where(ok, p + u, p), state.params, updates
    )
    opt_state = jax.tree_util.tree_map(
        lambda new, old: jnp.where(ok, new, old), opt_state, state.opt_state
    )

    fxfy = jnp.stack([camera_K[0, 0], camera_K[1, 1]])
    uv_grad = (jnp.abs(g_uv) * fxfy[:, None] * visible[None, :]).T
    state = state._replace(
        params=params,
        opt_state=opt_state,
        uv_grad_accum=state.uv_grad_accum + jnp.where(ok, uv_grad, 0.0),
        xyz_grad_accum=state.xyz_grad_accum
        + jnp.where(ok, jnp.abs(gparams["xyz"]), 0.0),
        grad_accum_count=state.grad_accum_count
        + visible.astype(jnp.int32) * ok.astype(jnp.int32),
    )
    return state, dict(
        loss=loss, psnr=psnr, num_splats=info["num_splats"],
        num_visible=info["num_visible"], tier_members=info["tier_members"],
        overflow=info["overflow"], truncated=info["truncated"],
        n_alive=jnp.sum(state.alive.astype(jnp.int32)),
    )
