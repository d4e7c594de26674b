"""Gaussian-sharded (model-parallel) rendering on the 8-device CPU mesh.

Pins the semantics of parallel.gsharded: with the scene sharded over the
``model`` axis and the image split into per-device tile-row bands, the
forward image and one full optimisation step must match the single-device
``trainer.train_step`` (same kernels, same layout, same loss).  The
reference has no multi-device mode (SURVEY.md §2.3) — this is the TPU-native
scale-out axis for SCENE SIZE, complementing data parallelism over cameras
(tests/test_parallel.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussian_splatting_tpu import trainer as T
from gaussian_splatting_tpu.config import SplatConfig
from gaussian_splatting_tpu.parallel import (
    make_model_mesh,
    mp_render,
    mp_train_step,
    shard_state,
)
from gaussian_splatting_tpu.rasterize import rasterize
from tests import fixtures as fx

# f32 so the band render can be compared to the single-device one at tight
# tolerance (bf16 packs splat centres tile-locally, which is band-relative
# in MP mode — same accuracy class, but not bit-comparable)
CFG = SplatConfig(splat_capacity=1 << 15, chunk=256, kernel_precision="f32")
CAM_HW = (480, 640)
D = 8


@pytest.fixture(scope="module")
def setup():
    scene = fx.test_scene(opacity_presigmoid=True, capacity=16)
    state = T.init_train_state(scene, CFG)
    cam = fx.test_camera()
    rng = np.random.default_rng(1)
    gt = rng.uniform(0.0, 1.0, (CAM_HW[0], CAM_HW[1], 3)).astype(np.float32)
    return state, cam, np.asarray(fx.test_camera_T_world()), gt


def test_mp_render_matches_single_device(setup):
    state, cam, pose, _gt = setup
    mesh = make_model_mesh(D)

    ref = rasterize(
        state.params, state.alive, jnp.asarray(pose), cam,
        near_thresh=CFG.near_thresh, far_thresh=CFG.far_thresh,
        cull_mask_padding=CFG.cull_mask_padding, mh_dist=CFG.mh_dist,
        background_rgb=jnp.zeros(3, jnp.float32), n_sh_band=0,
        splat_capacity=CFG.splat_capacity, chunk=CFG.chunk,
        interpret=True,
    )

    sstate = shard_state(state, mesh)

    @jax.jit
    def run(params, alive):
        img, visible, info = mp_render(
            params, alive, jnp.asarray(pose), jnp.asarray(cam.K),
            config=CFG, camera_hw=CAM_HW, n_sh_band=0,
            background_rgb=jnp.zeros(3, jnp.float32), mesh=mesh,
            interpret=True,
        )
        return img, visible, info

    img, visible, info = run(sstate.params, sstate.alive)
    assert img.shape == (CAM_HW[0], CAM_HW[1], 3)
    np.testing.assert_allclose(
        np.asarray(img), np.asarray(ref.image), atol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(visible), np.asarray(ref.visible)
    )
    # bands partition the splats: per-band counts sum to the full count
    assert int(info["num_splats"]) >= int(ref.num_splats)
    assert not bool(info["overflow"])


def test_mp_train_step_matches_single_device(setup):
    state, cam, pose, gt = setup
    mesh = make_model_mesh(D)

    ref_state, ref_info = T.train_step(
        jax.tree_util.tree_map(jnp.copy, state),
        jnp.asarray(gt), jnp.asarray(cam.K), jnp.asarray(pose),
        jnp.zeros(3, jnp.float32),
        config=CFG, camera_hw=CAM_HW, n_sh_band=0, use_background=False,
        interpret=True,
    )

    sstate = shard_state(jax.tree_util.tree_map(jnp.copy, state), mesh)
    new_state, info = mp_train_step(
        sstate, jnp.asarray(gt), jnp.asarray(cam.K), jnp.asarray(pose),
        jnp.zeros(3, jnp.float32),
        config=CFG, camera_hw=CAM_HW, n_sh_band=0, mesh=mesh,
        interpret=True,
    )

    assert np.isclose(float(info["loss"]), float(ref_info["loss"]),
                      atol=1e-5)
    assert np.isclose(float(info["psnr"]), float(ref_info["psnr"]),
                      atol=1e-3)
    for k in ref_state.params:
        np.testing.assert_allclose(
            np.asarray(new_state.params[k]),
            np.asarray(ref_state.params[k]),
            atol=1e-5, err_msg=k,
        )
    np.testing.assert_allclose(
        np.asarray(new_state.uv_grad_accum),
        np.asarray(ref_state.uv_grad_accum),
        atol=1e-5,
    )
    np.testing.assert_array_equal(
        np.asarray(new_state.grad_accum_count),
        np.asarray(ref_state.grad_accum_count),
    )
    np.testing.assert_allclose(
        np.asarray(new_state.xyz_grad_accum),
        np.asarray(ref_state.xyz_grad_accum),
        atol=1e-5,
    )


def test_dp_mp_2d_mesh_matches_dp(setup):
    """dp x mp on a (2, 4) mesh == plain dp on 2 devices for the same two
    cameras (dp itself is pinned against hand-averaged per-camera grads in
    tests/test_parallel.py)."""
    from gaussian_splatting_tpu.parallel import (
        dp_mp_train_step,
        dp_train_step,
        make_2d_mesh,
        make_mesh,
    )
    from gaussian_splatting_tpu.parallel.mesh import (
        replicate_state,
        shard_batch,
    )

    state, cam, pose, gt = setup
    rng = np.random.default_rng(7)
    pose2 = np.stack([pose, pose.copy()])
    pose2[1][0, 3] += 0.05
    gts = np.stack(
        [gt, rng.uniform(0, 1, gt.shape).astype(np.float32)]
    )
    Ks = np.broadcast_to(np.asarray(cam.K), (2, 3, 3)).copy()
    bgs = np.zeros((2, 3), np.float32)

    dmesh = make_mesh(2)
    dstate = replicate_state(
        jax.tree_util.tree_map(jnp.copy, state), dmesh
    )
    ref_state, ref_info = dp_train_step(
        dstate,
        shard_batch(jnp.asarray(gts), dmesh),
        shard_batch(jnp.asarray(Ks), dmesh),
        shard_batch(jnp.asarray(pose2), dmesh),
        shard_batch(jnp.asarray(bgs), dmesh),
        config=CFG, camera_hw=CAM_HW, n_sh_band=0, mesh=dmesh,
        interpret=True,
    )

    mesh2 = make_2d_mesh(2, 4)
    sstate = shard_state(
        jax.tree_util.tree_map(jnp.copy, state), mesh2
    )
    dd = jax.sharding.NamedSharding(mesh2, jax.sharding.PartitionSpec("data"))
    new_state, info = dp_mp_train_step(
        sstate,
        jax.device_put(jnp.asarray(gts), dd),
        jax.device_put(jnp.asarray(Ks), dd),
        jax.device_put(jnp.asarray(pose2), dd),
        jax.device_put(jnp.asarray(bgs), dd),
        config=CFG, camera_hw=CAM_HW, n_sh_band=0, mesh=mesh2,
        interpret=True,
    )

    assert np.isclose(float(info["loss"]), float(ref_info["loss"]),
                      atol=1e-5)
    for k in ref_state.params:
        np.testing.assert_allclose(
            np.asarray(new_state.params[k]),
            np.asarray(ref_state.params[k]),
            atol=1e-5, err_msg=k,
        )
    np.testing.assert_allclose(
        np.asarray(new_state.uv_grad_accum),
        np.asarray(ref_state.uv_grad_accum), atol=1e-5,
    )
    np.testing.assert_array_equal(
        np.asarray(new_state.grad_accum_count),
        np.asarray(ref_state.grad_accum_count),
    )


def test_mp_render_per_pixel_sh_matches_single_device(setup):
    """Per-pixel SH (use_sh_precompute=False) under model parallelism at
    n_sh=9: the band renders' coefficient bundle + band-local pixel basis
    must reproduce the single-device per-pixel path (the semantic spec is
    the reference's splat_py/rasterize.py:95-99 else-branch)."""
    state, cam, pose, _gt = setup
    mesh = make_model_mesh(D)
    cfg = CFG.replace(use_sh_precompute=False)

    rng = np.random.default_rng(3)
    params = dict(state.params)
    params["sh"] = jnp.asarray(
        rng.normal(scale=0.3, size=state.params["sh"].shape).astype(
            np.float32
        )
    )

    ref = rasterize(
        params, state.alive, jnp.asarray(pose), cam,
        near_thresh=cfg.near_thresh, far_thresh=cfg.far_thresh,
        cull_mask_padding=cfg.cull_mask_padding, mh_dist=cfg.mh_dist,
        background_rgb=jnp.zeros(3, jnp.float32), n_sh_band=2,
        use_sh_precompute=False,
        splat_capacity=cfg.splat_capacity, chunk=cfg.chunk,
        interpret=True,
    )

    sstate = shard_state(state._replace(params=params), mesh)

    @jax.jit
    def run(params, alive):
        img, visible, info = mp_render(
            params, alive, jnp.asarray(pose), jnp.asarray(cam.K),
            config=cfg, camera_hw=CAM_HW, n_sh_band=2,
            background_rgb=jnp.zeros(3, jnp.float32), mesh=mesh,
            interpret=True,
        )
        return img, visible, info

    img, visible, _info = run(sstate.params, sstate.alive)
    np.testing.assert_allclose(
        np.asarray(img), np.asarray(ref.image), atol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(visible), np.asarray(ref.visible)
    )
