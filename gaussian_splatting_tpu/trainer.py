"""Training: jitted train step, adaptive density control, schedules.

TPU re-design of SplatTrainer (splat_py/trainer.py:15-463) and
OptimizerManager (splat_py/optimizer_manager.py).  Structural differences:

- the scene is a fixed-capacity pytree with an ``alive`` mask; delete
  clears slots, clone/split write into free slots (+ zero the Adam moments
  there) instead of re-allocating tensors and surgically resizing torch
  optimizer state;
- the whole train step (render -> loss -> backward -> Adam -> densify-stat
  accumulation) is one jitted function; uv-space gradients come from an
  explicit zero ``uv_offset`` argument instead of ``uv.retain_grad()``;
- host-side code only handles scheduling (which iteration does what),
  exactly mirroring the reference's interval logic (trainer.py:389-463).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gaussian_splatting_tpu import optim
from gaussian_splatting_tpu.config import SplatConfig
from gaussian_splatting_tpu.geometry import inverse_sigmoid, quaternion_to_rotation
from gaussian_splatting_tpu.losses import eval_psnr_ssim, train_loss
from gaussian_splatting_tpu.rasterize import rasterize
from gaussian_splatting_tpu.structs import Camera, GaussianScene


class TrainState(NamedTuple):
    params: dict
    alive: jax.Array
    opt_state: tuple
    uv_grad_accum: jax.Array  # (C, 2)
    xyz_grad_accum: jax.Array  # (C, 3)
    grad_accum_count: jax.Array  # (C,) i32


def init_train_state(scene: GaussianScene, config: SplatConfig) -> TrainState:
    params = scene.params()
    opt = optim.make_optimizer(config)
    cap = scene.capacity
    return TrainState(
        params=params,
        alive=scene.alive,
        opt_state=opt.init(params),
        uv_grad_accum=jnp.zeros((cap, 2), jnp.float32),
        xyz_grad_accum=jnp.zeros((cap, 3), jnp.float32),
        grad_accum_count=jnp.zeros((cap,), jnp.int32),
    )


# ---------------------------------------------------------------------------
# train step
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=(
        "config", "camera_hw", "n_sh_band", "use_background", "interpret",
    ),
    donate_argnums=(0,),
)
def train_step(
    state: TrainState,
    gt_image: jax.Array,  # (H, W, 3) float32 in [0, 1]
    camera_K: jax.Array,
    camera_T_world: jax.Array,
    background_rgb: jax.Array,
    *,
    config: SplatConfig,
    camera_hw: tuple,
    n_sh_band: int,
    use_background: bool,
    interpret: Optional[bool] = None,
):
    """One optimisation step on one camera (trainer.py:348-387)."""
    del use_background  # bg value is in background_rgb; kept for cache keys
    return _train_step_impl(
        state, gt_image, camera_K, camera_T_world, background_rgb,
        config=config, camera_hw=camera_hw, n_sh_band=n_sh_band,
        interpret=interpret,
    )


def _train_step_impl(
    state: TrainState,
    gt_image: jax.Array,
    camera_K: jax.Array,
    camera_T_world: jax.Array,
    background_rgb: jax.Array,
    *,
    config: SplatConfig,
    camera_hw: tuple,
    n_sh_band: int,
    interpret: Optional[bool] = None,
):
    h, w = camera_hw
    camera = Camera(K=camera_K, width=w, height=h)
    # gt images live on device as uint8 (the reference keeps them GPU-
    # resident the same way, splat_py/structs.py:14-27); normalise on
    # device instead of uploading a 4x bigger f32 image every step
    if gt_image.dtype == jnp.uint8:
        gt_image = gt_image.astype(jnp.float32) * (
            1.0 / config.saturated_pixel_value
        )
    cap = state.alive.shape[0]
    uv_zero = jnp.zeros((2, cap), jnp.float32)

    def loss_fn(params, uv_offset):
        res = rasterize(
            params, state.alive, camera_T_world, camera,
            near_thresh=config.near_thresh,
            far_thresh=config.far_thresh,
            cull_mask_padding=config.cull_mask_padding,
            mh_dist=config.mh_dist,
            background_rgb=background_rgb,
            n_sh_band=n_sh_band,
            use_sh_precompute=config.use_sh_precompute,
            splat_capacity=config.splat_capacity,
            chunk=config.chunk,
            uv_offset=uv_offset,
            interpret=interpret,
            visible_capacity=config.visible_capacity,
            tier_capacities=config.tier_capacities,
            kernel_precision=config.kernel_precision,
        )
        loss, psnr = train_loss(res.image, gt_image, config.ssim_frac)
        return loss, (
            psnr, res.visible, res.num_splats, res.num_visible,
            res.tier_members, res.overflow, res.truncated,
        )

    (loss, aux), (gparams, g_uv) = jax.value_and_grad(
        loss_fn, argnums=(0, 1), has_aux=True
    )(state.params, uv_zero)
    (psnr, visible, num_splats, num_visible, tier_members, overflow,
     truncated) = aux

    opt = optim.make_optimizer(config)
    updates, opt_state = opt.update(gparams, state.opt_state, state.params)
    # a capacity-overflowing layout renders tail tiles empty and produces
    # wrong gradients for this frame: skip the whole optimisation step (the
    # runner grows the splat bucket before the next one).  The reference
    # instead hard-caps tiles per gaussian (splat_py/tile_culling.py:20).
    # A non-finite loss/gradient frame is likewise skipped outright — the
    # guard costs one reduction and stops a single bad frame from
    # NaN-poisoning the whole scene.
    ok = (~overflow | config.overflow_updates) & jnp.isfinite(loss)
    for g in jax.tree_util.tree_leaves(gparams):
        ok &= jnp.isfinite(jnp.sum(g))
    params = jax.tree_util.tree_map(
        lambda p, u: jnp.where(ok, p + u, p), state.params, updates
    )
    opt_state = jax.tree_util.tree_map(
        lambda new, old: jnp.where(ok, new, old), opt_state, state.opt_state
    )

    # densification statistics (trainer.py:377-385): uv grads scaled to
    # world-consistent units by fx/fy, abs-accumulated over visible views
    fxfy = jnp.stack([camera_K[0, 0], camera_K[1, 1]])
    # g_uv arrives as (2, N) rows; the accumulator keeps the reference's
    # (N, 2) orientation (one relayout per step, outside the hot chain)
    uv_grad = (jnp.abs(g_uv) * fxfy[:, None] * visible[None, :]).T
    okf = ok.astype(jnp.float32)
    # multiply-by-zero does NOT mask NaNs; select does
    state = state._replace(
        params=params,
        opt_state=opt_state,
        uv_grad_accum=state.uv_grad_accum
        + jnp.where(ok, uv_grad, 0.0),
        xyz_grad_accum=state.xyz_grad_accum
        + jnp.where(ok, jnp.abs(gparams["xyz"]), 0.0),
        grad_accum_count=state.grad_accum_count
        + visible.astype(jnp.int32) * ok.astype(jnp.int32),
    )
    return state, dict(
        loss=loss, psnr=psnr, num_splats=num_splats,
        num_visible=num_visible, tier_members=tier_members,
        overflow=overflow, truncated=truncated,
        n_alive=jnp.sum(state.alive.astype(jnp.int32)),
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "config", "camera_hw", "n_sh_band", "n_steps", "interpret",
    ),
    donate_argnums=(0,),
)
def train_steps_scan(
    state: TrainState,
    gt_stack: jax.Array,  # (M, H, W, 3) uint8, device-resident
    K_stack: jax.Array,  # (M, 3, 3)
    pose_stack: jax.Array,  # (M, 4, 4)
    cam_idx: jax.Array,  # (n_steps,) i32 — which camera each step trains
    bg_stack: jax.Array,  # (n_steps, 3) per-step background colour
    *,
    config: SplatConfig,
    camera_hw: tuple,
    n_sh_band: int,
    n_steps: int,
    interpret: Optional[bool] = None,
):
    """``n_steps`` sequential optimisation steps in ONE dispatch.

    Bitwise-identical to calling ``train_step`` n_steps times (the scan
    body is the same ``_train_step_impl``), but the host submits one
    executable instead of n_steps — a TPU-first replacement for the
    reference's per-step Python loop (splat_py/trainer.py:389-463) that
    amortises per-dispatch latency.  The runner uses it between schedule
    boundaries (eval / ADC / opacity reset / rebucket all stay host-side);
    ground-truth images must be pre-staged as one (M, H, W, 3) uint8
    device stack.  Per-step info scalars come back stacked (n_steps,).
    """

    def body(state, xs):
        idx, bg = xs
        gt = jax.lax.dynamic_index_in_dim(
            gt_stack, idx, axis=0, keepdims=False
        )
        K = jax.lax.dynamic_index_in_dim(
            K_stack, idx, axis=0, keepdims=False
        )
        pose = jax.lax.dynamic_index_in_dim(
            pose_stack, idx, axis=0, keepdims=False
        )
        state, info = _train_step_impl(
            state, gt, K, pose, bg,
            config=config, camera_hw=camera_hw, n_sh_band=n_sh_band,
            interpret=interpret,
        )
        return state, info

    assert cam_idx.shape == (n_steps,), cam_idx.shape
    state, infos = jax.lax.scan(
        body, state, (cam_idx.astype(jnp.int32), bg_stack), length=n_steps
    )
    return state, infos


# ---------------------------------------------------------------------------
# eval / render for test split
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=("config", "camera_hw", "n_sh_band", "interpret"),
)
def eval_step(
    state: TrainState,
    gt_image: jax.Array,
    camera_K: jax.Array,
    camera_T_world: jax.Array,
    *,
    config: SplatConfig,
    camera_hw: tuple,
    n_sh_band: int,
    interpret: Optional[bool] = None,
):
    """Render one test image and compute PSNR/SSIM (trainer.py:297-346)."""
    h, w = camera_hw
    camera = Camera(K=camera_K, width=w, height=h)
    if gt_image.dtype == jnp.uint8:
        gt_image = gt_image.astype(jnp.float32) * (
            1.0 / config.saturated_pixel_value
        )
    res = rasterize(
        state.params, state.alive, camera_T_world, camera,
        near_thresh=config.near_thresh,
        far_thresh=config.far_thresh,
        cull_mask_padding=config.cull_mask_padding,
        mh_dist=config.mh_dist,
        background_rgb=jnp.zeros(3, jnp.float32),
        n_sh_band=n_sh_band,
        use_sh_precompute=config.use_sh_precompute,
        splat_capacity=config.splat_capacity,
        chunk=config.chunk,
        interpret=interpret,
        visible_capacity=config.visible_capacity,
        tier_capacities=config.tier_capacities,
        kernel_precision=config.kernel_precision,
    )
    psnr, ssim_val = eval_psnr_ssim(res.image, gt_image)
    # overflow is surfaced (not silently dropped): an eval view whose
    # layout overflows the tier capacities renders with its largest
    # gaussians' smallest members missing and reports a wrong PSNR/SSIM
    # — the caller must warn (ADVICE r2)
    return res.image, psnr, ssim_val, res.overflow


# ---------------------------------------------------------------------------
# scheduled events: opacity reset, adaptive density control
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("config",))
def reset_opacity(state: TrainState, *, config: SplatConfig) -> TrainState:
    """opacity <- inverse_sigmoid(reset value); zero its Adam moments and
    the densify stats (trainer.py:68-75, optimizer_manager.py:44-57)."""
    cap = state.alive.shape[0]
    new_op = jnp.full(
        (cap, 1), inverse_sigmoid(config.reset_opacity_value), jnp.float32
    )
    params = dict(state.params)
    params["opacity"] = new_op
    opt_state = optim.mask_moments(
        state.opt_state, jnp.ones((cap,), bool), leaves=("opacity",)
    )
    return state._replace(
        params=params,
        opt_state=opt_state,
        uv_grad_accum=jnp.zeros_like(state.uv_grad_accum),
        xyz_grad_accum=jnp.zeros_like(state.xyz_grad_accum),
        grad_accum_count=jnp.zeros_like(state.grad_accum_count),
    )


def _row_gather(vf: jax.Array, w: int, idx: jax.Array) -> jax.Array:
    """Gather rows idx from a FLAT leaf (C*w,) -> flat (n*w,)."""
    flat_idx = (idx[:, None] * w + jnp.arange(w)).reshape(-1)
    return vf[flat_idx]


def _zero_rows_flat(leaves_f: dict, widths: dict, slot_mask: jax.Array):
    """Zero flat leaves at masked slots (Adam-moment surgery, flat form)."""
    out = {}
    for k, vf in leaves_f.items():
        m = jnp.repeat(slot_mask, widths[k], total_repeat_length=vf.size)
        out[k] = jnp.where(m, 0.0, vf)
    return out


def _write_slots(params_f, widths, alive, mu_f, nu_f, src_idx, dst_idx,
                 write_ok, overrides=None):
    """Copy gaussians src_idx -> dst_idx (masked), zero moments at dst.

    All per-gaussian leaves are FLAT 1-D ``(C*w,)`` views: multi-dim
    ``(C, small...)`` gathers/scatters/selects pad their minor dims to the
    TPU (8, 128) tile inside this executable (11.4x on the (C, 3, 15) SH
    leaf — the round-4 refscale HBM OOM), while 1-D ops stay compact.

    overrides: dict leaf -> flat (n*w,) values replacing the copied ones.
    Out-of-range dst (sentinel = cap) writes are dropped (flat sentinel
    indices land at >= cap*w, out of range for mode="drop").
    """
    cap = alive.shape[0]
    dst = jnp.where(write_ok, dst_idx, cap)  # cap = dropped by mode="drop"
    new_params = {}
    for k, vf in params_f.items():
        w = widths[k]
        if overrides is not None and k in overrides:
            val = overrides[k]
        else:
            val = _row_gather(vf, w, src_idx)
        dst_flat = (dst[:, None] * w + jnp.arange(w)).reshape(-1)
        new_params[k] = vf.at[dst_flat].set(val, mode="drop")
    alive = alive.at[dst].set(True, mode="drop")
    slot_mask = jnp.zeros((cap,), bool).at[dst].set(True, mode="drop")
    mu_f = _zero_rows_flat(mu_f, widths, slot_mask)
    nu_f = _zero_rows_flat(nu_f, widths, slot_mask)
    return new_params, alive, mu_f, nu_f


@functools.partial(jax.jit, static_argnames=("config",))
def adaptive_density_control(
    state: TrainState,
    key: jax.Array,
    iteration: jax.Array,
    *,
    config: SplatConfig,
):
    """Delete / clone / split (trainer.py:208-295), fixed-capacity style.

    Returns (state, stats dict).  Clone writes copies into free slots;
    split overwrites the original slot with sample 1 and writes sample 2
    into a free slot (equivalent to the reference's delete-original +
    append-2-samples).

    Clone and split each drain their candidate set EXHAUSTIVELY: batches
    of ``max_new`` are processed under a ``lax.while_loop`` until no
    candidate (or no free slot) remains, so the static batch bound never
    silently defers densification the reference would have done
    (VERDICT r2 item 8).  Realistic events fit one batch — the loop costs
    nothing extra then.  ``cap_hit`` now means the only true deferral
    left: candidates remained when the free slots ran out.
    """
    cap = state.alive.shape[0]
    # static batch width of one clone/split pass; bounded so the per-batch
    # row gathers/scatters stay small — the drain loops below make any
    # batch size exhaustive, so this is purely a memory/time knob
    max_new = min(cap // 4, 1 << 16)
    params, alive, opt_state = state.params, state.alive, state.opt_state

    # flat 1-D views of every per-gaussian leaf (see _write_slots: multi-dim
    # (C, small...) ops pad minor dims to the TPU tile inside this
    # executable; flat ops are compact)
    widths = {
        k: int(np.prod(v.shape[1:])) if v.ndim > 1 else 1
        for k, v in params.items()
    }
    shapes = {k: v.shape for k, v in params.items()}
    params_f = {k: v.reshape(-1) for k, v in params.items()}
    adam = optim.adam_moments(opt_state)
    mu_f = {k: v.reshape(-1) for k, v in adam.mu.items()}
    nu_f = {k: v.reshape(-1) for k, v in adam.nu.items()}

    uv_norm_accum = jnp.linalg.norm(state.uv_grad_accum, axis=1)
    count = state.grad_accum_count

    # ---- step 1: delete (trainer.py:215-229)
    keep = params["opacity"][:, 0] > inverse_sigmoid(
        config.delete_opacity_threshold
    )
    # zero-view / zero-grad deletion (reference parity) — but ONLY when the
    # accumulation window carried any signal at all.  If every step since
    # the last ADC was skipped (layout overflow after a densify burst: the
    # refscale r5 run lost its whole window this way), count is zero for
    # ALL gaussians and the reference criterion would delete the entire
    # scene; the reference itself can never hit this because torch steps
    # never skip.  Fall back to opacity-only deletion for that window.
    had_signal = jnp.any(count > 0)
    keep &= ((count > 0) & (uv_norm_accum > 0.0)) | ~had_signal
    n_deleted = jnp.sum((alive & ~keep).astype(jnp.int32))
    if config.use_delete:
        freed = alive & ~keep
        alive = alive & keep
        mu_f = _zero_rows_flat(mu_f, widths, freed)
        nu_f = _zero_rows_flat(nu_f, widths, freed)

    n_alive = jnp.sum(alive.astype(jnp.int32))
    skip_densify = n_alive > config.max_gaussians

    # ---- step 2: densify signals (trainer.py:237-255)
    cnt = jnp.maximum(count, 1).astype(jnp.float32)[:, None]
    uv_grad_avg = state.uv_grad_accum / cnt
    xyz_grad_avg = state.xyz_grad_accum / cnt
    uv_avg_norm = jnp.linalg.norm(uv_grad_avg, axis=1)

    if config.use_fractional_densification:
        if config.use_adaptive_fractional_densification:
            scale_factor = (
                (config.adaptive_control_end - iteration.astype(jnp.float32))
                / (config.adaptive_control_end - config.adaptive_control_start)
                * 2.0
            )
        else:
            scale_factor = jnp.float32(1.0)
        uv_pct = 1.0 - (1.0 - config.uv_grad_percentile) * scale_factor
        masked = jnp.where(alive, uv_avg_norm, jnp.nan)
        uv_split_val = jnp.nanquantile(masked, jnp.clip(uv_pct, 0.0, 1.0))
    else:
        uv_split_val = jnp.float32(config.uv_grad_threshold)
    densify = alive & (uv_avg_norm > uv_split_val) & ~skip_densify

    scale_max = jnp.max(jnp.exp(params["scale"]), axis=1)
    clone_mask = densify & (scale_max <= config.clone_scale_threshold)
    n_clone = jnp.sum(clone_mask.astype(jnp.int32))

    # ---- step 2.1: clone (trainer.py:123-161), batch-drained
    xyz_grad_avg_f = xyz_grad_avg.reshape(-1)
    clone_deferred = jnp.int32(0)
    if config.use_clone:

        def clone_cond(c):
            params_f, alive, mu_f, nu_f, remaining, densify, scale_max = c
            return jnp.any(remaining) & jnp.any(~alive)

        def clone_body(c):
            params_f, alive, mu_f, nu_f, remaining, densify, scale_max = c
            src = jnp.nonzero(remaining, size=max_new, fill_value=cap)[0]
            free_idx = jnp.nonzero(~alive, size=max_new, fill_value=cap)[0]
            src_safe = jnp.minimum(src, cap - 1)
            ok = (src < cap) & (free_idx < cap)
            overrides = dict(
                xyz=_row_gather(params_f["xyz"], 3, src_safe)
                - _row_gather(xyz_grad_avg_f, 3, src_safe) * 0.01
            )
            params_f, alive, mu_f, nu_f = _write_slots(
                params_f, widths, alive, mu_f, nu_f, src_safe, free_idx,
                ok, overrides
            )
            # clones inherit the densify flag and scale (trainer.py:268-271)
            densify = densify.at[jnp.where(ok, free_idx, cap)].set(
                densify[src_safe], mode="drop"
            )
            scale_max = scale_max.at[jnp.where(ok, free_idx, cap)].set(
                scale_max[src_safe], mode="drop"
            )
            remaining = remaining & ~jnp.zeros((cap,), bool).at[
                jnp.where(ok, src_safe, cap)
            ].set(True, mode="drop")
            return (params_f, alive, mu_f, nu_f, remaining, densify,
                    scale_max)

        params_f, alive, mu_f, nu_f, rem_clone, densify, scale_max = (
            jax.lax.while_loop(
                clone_cond, clone_body,
                (params_f, alive, mu_f, nu_f, clone_mask, densify,
                 scale_max),
            )
        )
        clone_deferred = jnp.sum(
            rem_clone.astype(jnp.int32), dtype=jnp.int32
        )

    # ---- step 2.2: split (trainer.py:163-206, 274-293)
    split_mask = densify & (scale_max > config.clone_scale_threshold)
    if config.use_adaptive_fractional_densification:
        scale_factor = (
            (config.adaptive_control_end - iteration.astype(jnp.float32))
            / (config.adaptive_control_end - config.adaptive_control_start)
            * 2.0
        )
    else:
        scale_factor = jnp.float32(1.0)
    scale_pct = 1.0 - (1.0 - config.scale_norm_percentile) * scale_factor
    masked_scale = jnp.where(alive, scale_max, jnp.nan)
    scale_split = jnp.nanquantile(masked_scale, jnp.clip(scale_pct, 0.0, 1.0))
    split_mask |= alive & (scale_max > scale_split) & ~skip_densify
    split_mask &= alive
    n_split = jnp.sum(split_mask.astype(jnp.int32))

    split_deferred = jnp.int32(0)
    if config.use_split:
        assert config.num_split_samples == 2, (
            "fixed-capacity split implements the default 2 samples"
        )

        def split_cond(c):
            params_f, alive, mu_f, nu_f, remaining, lost, it = c
            # sample 1 splits IN PLACE, so the loop must run even with no
            # free slots; remaining drains every iteration -> terminates
            return jnp.any(remaining)

        def split_body(c):
            params_f, alive, mu_f, nu_f, remaining, lost, it = c
            src = jnp.nonzero(remaining, size=max_new, fill_value=cap)[0]
            src_safe = jnp.minimum(src, cap - 1)
            free_idx2 = jnp.nonzero(~alive, size=max_new, fill_value=cap)[0]
            ok = (src < cap) & (free_idx2 < cap)

            scale_src = _row_gather(params_f["scale"], 3, src_safe)
            scales = jnp.exp(scale_src).reshape(max_new, 3)
            xyz_src = _row_gather(params_f["xyz"], 3, src_safe).reshape(
                max_new, 3
            )
            quat = _row_gather(
                params_f["quaternion"], 4, src_safe
            ).reshape(max_new, 4)
            quat = quat / jnp.linalg.norm(quat, axis=1, keepdims=True)
            rot = quaternion_to_rotation(quat)

            def sample(k):
                r = jax.random.uniform(k, (max_new, 3), jnp.float32)
                return (
                    xyz_src + jnp.einsum("nij,nj->ni", rot, r * scales)
                ).reshape(-1)

            k1, k2 = jax.random.split(jax.random.fold_in(key, it))
            new_scale = jnp.log(
                jnp.exp(scale_src) / config.split_scale_factor
            )
            # BOTH samples are drawn inside the ORIGINAL ellipsoid
            # (trainer.py:177-187) before any write lands — sample 1 then
            # overwrites the original slot, sample 2 goes to a free slot.
            xyz1, xyz2 = sample(k1), sample(k2)
            ok1 = src < cap
            params_f, alive, mu_f, nu_f = _write_slots(
                params_f, widths, alive, mu_f, nu_f, src_safe, src_safe,
                ok1, overrides=dict(xyz=xyz1, scale=new_scale),
            )
            params_f, alive, mu_f, nu_f = _write_slots(
                params_f, widths, alive, mu_f, nu_f, src_safe, free_idx2,
                ok, overrides=dict(xyz=xyz2, scale=new_scale),
            )
            # a source whose sample 2 found no free slot was still split
            # in place (sample 1): processed, but its second sample is lost
            lost = lost + jnp.sum(
                (ok1 & ~ok).astype(jnp.int32), dtype=jnp.int32
            )
            remaining = remaining & ~jnp.zeros((cap,), bool).at[
                jnp.where(ok1, src_safe, cap)
            ].set(True, mode="drop")
            return (params_f, alive, mu_f, nu_f, remaining, lost, it + 1)

        params_f, alive, mu_f, nu_f, _, split_deferred, _ = (
            jax.lax.while_loop(
                split_cond, split_body,
                (params_f, alive, mu_f, nu_f, split_mask, jnp.int32(0),
                 jnp.int32(0)),
            )
        )

    # with exhaustive batch draining, the only work ever dropped is a
    # candidate that found no free slot (clone) or a split's second
    # sample (lost) — surfaced per event so the runner can report it
    cap_hit = (clone_deferred > 0) | (split_deferred > 0)
    params = {k: vf.reshape(shapes[k]) for k, vf in params_f.items()}
    opt_state = optim.replace_adam_moments(
        opt_state,
        mu={k: vf.reshape(shapes[k]) for k, vf in mu_f.items()},
        nu={k: vf.reshape(shapes[k]) for k, vf in nu_f.items()},
    )
    state = state._replace(
        params=params,
        alive=alive,
        opt_state=opt_state,
        uv_grad_accum=jnp.zeros_like(state.uv_grad_accum),
        xyz_grad_accum=jnp.zeros_like(state.xyz_grad_accum),
        grad_accum_count=jnp.zeros_like(state.grad_accum_count),
    )
    stats = dict(
        n_deleted=n_deleted,
        n_clone=n_clone,
        n_split=n_split,
        n_alive=jnp.sum(alive.astype(jnp.int32)),
        uv_split_val=uv_split_val,
        skip_densify=skip_densify,
        cap_hit=cap_hit,
        clone_deferred=clone_deferred,
        split_deferred=split_deferred,
    )
    return state, stats


def sh_band_for_iteration(config: SplatConfig, iteration: int) -> int:
    """The active SH band at an iteration under the add-band schedule
    (trainer.py:445-446: a band is added every add_sh_band_interval)."""
    if config.max_sh_band == 0:
        return 0
    return min(iteration // config.add_sh_band_interval, config.max_sh_band)
