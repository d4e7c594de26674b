"""Multi-chip data-parallel training over a jax.sharding.Mesh.

The reference is strictly single-GPU (SURVEY.md §2.3); on TPU the natural
scale-out axis is data parallelism over cameras: the scene (and optimizer
state) is replicated, each device renders + differentiates its own camera,
and gradients are mean-reduced over the ``data`` mesh axis with an ICI
``psum``.  With one device and batch 1 this reduces exactly to the
reference's one-camera-per-step semantics.

Gaussian-sharded (model-parallel) rendering is the round-2 axis: shard the
per-gaussian geometry over a second mesh axis, all_gather the (much
smaller) surviving splat features for rasterization.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gaussian_splatting_tpu import optim
from gaussian_splatting_tpu.losses import train_loss
from gaussian_splatting_tpu.rasterize import rasterize
from gaussian_splatting_tpu.structs import Camera


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(devs, (axis,))


def _local_loss(params, alive, uv_offset, gt, K, pose, bg, *, config,
                camera_hw, n_sh_band, interpret):
    h, w = camera_hw
    camera = Camera(K=K, width=w, height=h)
    # gt batches ride host->device as uint8 (4x less transfer; the
    # reference keeps gt images device-resident, splat_py/structs.py:14-27)
    if gt.dtype == jnp.uint8:
        gt = gt.astype(jnp.float32) * (1.0 / config.saturated_pixel_value)
    res = rasterize(
        params, alive, pose, camera,
        near_thresh=config.near_thresh,
        far_thresh=config.far_thresh,
        cull_mask_padding=config.cull_mask_padding,
        mh_dist=config.mh_dist,
        background_rgb=bg,
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
    loss, psnr = train_loss(res.image, gt, config.ssim_frac)
    return loss, (
        psnr, res.visible, res.num_splats, res.num_visible,
        res.tier_members, res.overflow, res.truncated,
    )


@functools.partial(
    jax.jit,
    static_argnames=("config", "camera_hw", "n_sh_band", "mesh", "interpret"),
    donate_argnums=(0,),
)
def dp_train_step(
    state,
    gt_batch: jax.Array,  # (D, H, W, 3)
    K_batch: jax.Array,  # (D, 3, 3)
    pose_batch: jax.Array,  # (D, 4, 4)
    bg_batch: jax.Array,  # (D, 3)
    *,
    config,
    camera_hw: tuple,
    n_sh_band: int,
    mesh: Mesh,
    interpret: bool | None = None,
):
    """One data-parallel step: D cameras, one per device, grads psum-averaged.

    ``state`` must be replicated across the mesh; batches sharded on axis 0.
    Returns (new_state, info dict) like trainer.train_step; num_splats is
    the per-device maximum (the watermark signal), overflow is any-device.
    """
    cap = state.alive.shape[0]

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P("data"), P("data"), P("data"), P("data")),
        out_specs=P(),
        # pallas_call outputs carry no varying-mesh-axes annotation, so
        # vma checking rejects this body even though every cross-device
        # value is explicitly psum/pmean-reduced below; disabling the
        # static check is safe here because nothing escapes un-reduced
        check_vma=False,
    )
    def sharded(state, gt, K, pose, bg):
        uv_zero = jnp.zeros((2, cap), jnp.float32)
        grad_fn = jax.value_and_grad(
            functools.partial(
                _local_loss, config=config, camera_hw=camera_hw,
                n_sh_band=n_sh_band, interpret=interpret,
            ),
            argnums=(0, 2),
            has_aux=True,
        )
        (loss, aux), (gparams, g_uv) = grad_fn(
            state.params, state.alive, uv_zero, gt[0], K[0], pose[0], bg[0]
        )
        (psnr, visible, num_splats, num_visible, tier_members, overflow,
         truncated) = aux
        # mean-reduce over the data axis (ICI collective)
        gparams = jax.lax.pmean(gparams, "data")
        loss = jax.lax.pmean(loss, "data")
        psnr = jax.lax.pmean(psnr, "data")
        num_splats = jax.lax.pmax(num_splats, "data")
        num_visible = jax.lax.pmax(num_visible, "data")
        tier_members = jax.lax.pmax(tier_members, "data")
        overflow = jax.lax.pmax(overflow.astype(jnp.int32), "data") > 0
        # truncated is a dropped-cell COUNT; total it over the camera batch
        truncated = jax.lax.psum(truncated, "data")

        opt = optim.make_optimizer(config)
        updates, opt_state = opt.update(
            gparams, state.opt_state, state.params
        )
        # skip the whole step when any device's layout overflowed its
        # capacity or any gradient is non-finite (same semantics as
        # trainer.train_step)
        ok = (~overflow | config.overflow_updates) & jnp.isfinite(loss)
        for g in jax.tree_util.tree_leaves(gparams):
            ok &= jnp.isfinite(jnp.sum(g))
        params = jax.tree_util.tree_map(
            lambda p, u: jnp.where(ok, p + u, p), state.params, updates
        )
        opt_state = jax.tree_util.tree_map(
            lambda new, old: jnp.where(ok, new, old),
            opt_state, state.opt_state,
        )

        # densify stats: per-device accumulation summed over cameras,
        # matching the reference's per-view accumulation semantics
        fxfy = jnp.stack([K[0, 0, 0], K[0, 1, 1]])
        uv_grad = (jnp.abs(g_uv) * fxfy[:, None] * visible[None, :]).T
        uv_grad = jax.lax.psum(uv_grad, "data")
        # gparams is already pmean-reduced (replicated) — no second psum
        xyz_grad = jnp.abs(gparams["xyz"])
        seen = jax.lax.psum(visible.astype(jnp.int32), "data")

        # multiply-by-zero does NOT mask NaNs; select does
        new_state = state._replace(
            params=params,
            opt_state=opt_state,
            uv_grad_accum=state.uv_grad_accum + jnp.where(ok, uv_grad, 0.0),
            xyz_grad_accum=state.xyz_grad_accum
            + jnp.where(ok, xyz_grad, 0.0),
            grad_accum_count=state.grad_accum_count
            + seen * ok.astype(jnp.int32),
        )
        info = dict(
            loss=loss, psnr=psnr, num_splats=num_splats,
            num_visible=num_visible, tier_members=tier_members,
            overflow=overflow, truncated=truncated,
            n_alive=jnp.sum(state.alive.astype(jnp.int32)),
        )
        return new_state, info

    return sharded(state, gt_batch, K_batch, pose_batch, bg_batch)


def replicate_state(state, mesh: Mesh):
    """Place a TrainState replicated over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(state, sharding)


def shard_batch(batch, mesh: Mesh):
    sharding = NamedSharding(mesh, P("data"))
    return jax.device_put(batch, sharding)
