"""End-to-end trainer smoke tests on CPU (interpret-mode kernels).

Checks the jitted train step optimises the fixture scene, and that
adaptive density control edits slots coherently.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussian_splatting_tpu import trainer as T
from gaussian_splatting_tpu.config import SplatConfig
from gaussian_splatting_tpu.geometry import inverse_sigmoid
from tests import fixtures as fx

CFG = SplatConfig(splat_capacity=1 << 17, chunk=256)
CAM_HW = (480, 640)


@pytest.fixture
def setup():
    scene = fx.test_scene(opacity_presigmoid=True, capacity=16)
    state = T.init_train_state(scene, CFG)
    cam = fx.test_camera()
    pose = fx.test_camera_T_world()
    # target: the scene's own render, so gradients should be ~0 at optimum
    from gaussian_splatting_tpu.rasterize import rasterize

    res = rasterize(
        scene.params(), scene.alive, pose, cam,
        near_thresh=CFG.near_thresh, far_thresh=CFG.far_thresh,
        cull_mask_padding=CFG.cull_mask_padding, mh_dist=CFG.mh_dist,
        background_rgb=jnp.zeros(3, jnp.float32), n_sh_band=0,
        splat_capacity=CFG.splat_capacity, chunk=CFG.chunk,
    )
    gt = jnp.clip(res.image, 0.0, 1.0)
    return state, gt, cam, pose


def test_train_step_reduces_loss(setup):
    state, gt, cam, pose = setup
    # perturb the scene so there is something to optimise
    params = dict(state.params)
    params["rgb"] = params["rgb"] * 0.5
    state = state._replace(params=params)

    losses = []
    for _ in range(8):
        state, info = T.train_step(
            state, gt, cam.K, pose, jnp.zeros(3, jnp.float32),
            config=CFG, camera_hw=CAM_HW, n_sh_band=0, use_background=False,
        )
        losses.append(float(info["loss"]))
    assert losses[-1] < losses[0] * 0.9, losses
    assert np.isfinite(losses).all()
    # densify stats only accumulate on visible gaussians (g1 projects just
    # outside the image but within the 100px cull padding, so it counts —
    # same as the reference's ~culling_mask accounting)
    counts = np.asarray(state.grad_accum_count)
    np.testing.assert_array_equal(counts[:6], [0, 8, 0, 8, 8, 8])
    assert (counts[6:] == 0).all()


def test_overflow_step_is_skipped(setup):
    """A capacity-overflowing layout must leave params, Adam state, and the
    densify accumulators untouched (the runner grows the bucket and the
    next step proceeds normally)."""
    from gaussian_splatting_tpu.culling import TIER_CELLS

    state, gt, cam, pose = setup
    params = dict(state.params)
    params["rgb"] = params["rgb"] * 0.5  # make gradients nonzero
    state = state._replace(params=params)

    # floor-level tier capacities (every explicit entry clamps up to
    # TIER_FLOORS, >= 32 members) are far below the fixture's big-window
    # gaussians' member count once the scene is tiled: replicate the
    # 16-slot scene 24x so one big tier gets 48 members (> the 32-member
    # floor) -> guaranteed overflow
    reps = 24
    cap = 16 * reps
    tiled = {
        k: jnp.asarray(
            np.tile(np.asarray(v), (reps,) + (1,) * (np.asarray(v).ndim - 1))
        )
        for k, v in state.params.items()
    }
    alive = jnp.asarray(np.tile(np.asarray(state.alive), reps))
    from gaussian_splatting_tpu import optim as _optim

    state = T.TrainState(
        params=tiled,
        alive=alive,
        opt_state=_optim.make_optimizer(CFG).init(tiled),
        uv_grad_accum=jnp.zeros((cap, 2), jnp.float32),
        xyz_grad_accum=jnp.zeros((cap, 3), jnp.float32),
        grad_accum_count=jnp.zeros((cap,), jnp.int32),
    )

    cfg_tiny = CFG.replace(tier_capacities=(1,) * len(TIER_CELLS))
    before = jax.tree_util.tree_map(jnp.copy, state)
    state2, info = T.train_step(
        jax.tree_util.tree_map(jnp.copy, state), gt, cam.K, pose,
        jnp.zeros(3, jnp.float32),
        config=cfg_tiny, camera_hw=CAM_HW, n_sh_band=0, use_background=False,
    )
    assert bool(info["overflow"])
    for k in before.params:
        np.testing.assert_array_equal(
            np.asarray(state2.params[k]), np.asarray(before.params[k]), k
        )
    np.testing.assert_array_equal(
        np.asarray(state2.grad_accum_count),
        np.asarray(before.grad_accum_count),
    )
    from gaussian_splatting_tpu import optim

    b_adam = optim.adam_moments(before.opt_state)
    a_adam = optim.adam_moments(state2.opt_state)
    np.testing.assert_array_equal(
        np.asarray(a_adam.mu["xyz"]), np.asarray(b_adam.mu["xyz"])
    )

    # ... and a non-overflowing step with the same inputs does update
    # (explicit roomy caps, like the runner's rebucketed ones: 48 members
    # in one tier exceeds the DEFAULT equal-cells share for big tiers)
    cfg_ok = CFG.replace(tier_capacities=(64,) * len(TIER_CELLS))
    state3, info3 = T.train_step(
        jax.tree_util.tree_map(jnp.copy, state), gt, cam.K, pose,
        jnp.zeros(3, jnp.float32),
        config=cfg_ok, camera_hw=CAM_HW, n_sh_band=0, use_background=False,
    )
    assert not bool(info3["overflow"])
    assert not np.array_equal(
        np.asarray(state3.params["rgb"]), np.asarray(before.params["rgb"])
    )


def test_adaptive_density_control_delete_and_split(setup):
    state, gt, cam, pose = setup
    for _ in range(2):
        state, _ = T.train_step(
            state, gt, cam.K, pose, jnp.zeros(3, jnp.float32),
            config=CFG, camera_hw=CAM_HW, n_sh_band=0, use_background=False,
        )
    # force gaussian 4 to be "dead" (low opacity) so delete removes it
    params = dict(state.params)
    params["opacity"] = params["opacity"].at[4].set(
        inverse_sigmoid(0.01)
    )
    state = state._replace(params=params)
    n_before = int(jnp.sum(state.alive.astype(jnp.int32)))

    state, stats = T.adaptive_density_control(
        state, jax.random.PRNGKey(0), jnp.float32(1000.0), config=CFG
    )
    # g0/g2 were never seen (count 0), g1 saw views but got no uv gradient,
    # g4 was forced below the opacity threshold -> 4 deletions
    assert int(stats["n_deleted"]) == 4
    alive = np.asarray(state.alive)
    # survivors (2) plus one net new slot per split (freed slots may be
    # reused as split targets)
    assert int(stats["n_alive"]) == 2 + int(stats["n_split"])
    assert alive.sum() == int(stats["n_alive"])
    # accumulators reset after ADC (trainer.py:295)
    assert np.asarray(state.grad_accum_count).sum() == 0
    # all alive slots have finite params
    for k, v in state.params.items():
        assert np.isfinite(np.asarray(v)[alive]).all(), k


def test_adc_zero_signal_window_does_not_wipe_scene(setup):
    """Two ADCs with NO accumulated signal between them (every intervening
    step skipped on layout overflow — the refscale r5 failure) must fall
    back to opacity-only deletion instead of deleting the whole scene via
    the zero-view/zero-grad criterion (which the reference can apply
    unconditionally only because torch steps never skip)."""
    state, gt, cam, pose = setup
    for _ in range(2):
        state, _ = T.train_step(
            state, gt, cam.K, pose, jnp.zeros(3, jnp.float32),
            config=CFG, camera_hw=CAM_HW, n_sh_band=0, use_background=False,
        )
    state, stats1 = T.adaptive_density_control(
        state, jax.random.PRNGKey(0), jnp.float32(1000.0), config=CFG
    )
    assert int(stats1["n_alive"]) > 0
    # accumulators are now zero and no training happens before the next ADC
    assert np.asarray(state.grad_accum_count).sum() == 0
    state, stats2 = T.adaptive_density_control(
        state, jax.random.PRNGKey(1), jnp.float32(1100.0), config=CFG
    )
    # nothing was below the opacity threshold -> nothing may be deleted
    assert int(stats2["n_deleted"]) == 0
    assert int(stats2["n_alive"]) >= int(stats1["n_alive"])
    # opacity-based deletion must still work in the zero-signal window
    params = dict(state.params)
    params["opacity"] = jnp.where(
        state.alive[:, None], inverse_sigmoid(0.01), params["opacity"]
    )
    state = state._replace(params=params)
    n_alive = int(jnp.sum(state.alive.astype(jnp.int32)))
    state, stats3 = T.adaptive_density_control(
        state, jax.random.PRNGKey(2), jnp.float32(1200.0), config=CFG
    )
    assert int(stats3["n_deleted"]) == n_alive


def test_reset_opacity(setup):
    state, *_ = setup
    state = T.reset_opacity(state, config=CFG)
    op = np.asarray(state.params["opacity"])
    np.testing.assert_allclose(
        op, float(inverse_sigmoid(CFG.reset_opacity_value)), atol=1e-5
    )
    from gaussian_splatting_tpu import optim

    adam = optim.adam_moments(state.opt_state)
    assert float(jnp.abs(adam.mu["opacity"]).max()) == 0.0
    assert float(jnp.abs(adam.nu["opacity"]).max()) == 0.0
    # other leaves' moments untouched
    assert float(jnp.abs(adam.mu["rgb"]).max()) >= 0.0


def test_sh_band_schedule():
    cfg = SplatConfig()
    assert T.sh_band_for_iteration(cfg, 0) == 0
    assert T.sh_band_for_iteration(cfg, 999) == 0
    assert T.sh_band_for_iteration(cfg, 1000) == 1
    assert T.sh_band_for_iteration(cfg, 2500) == 2
    assert T.sh_band_for_iteration(cfg, 5000) == 3
    assert T.sh_band_for_iteration(cfg, 6999) == 3
    cfg0 = SplatConfig(max_sh_band=0)
    assert T.sh_band_for_iteration(cfg0, 5000) == 0


def _dense_state(n_alive: int, capacity: int, scale: float, config):
    """A state with ``n_alive`` identical gaussians, all primed to densify
    (uv accumulators above the fixed threshold, seen in one view)."""
    from gaussian_splatting_tpu.structs import GaussianScene

    rng = np.random.default_rng(0)
    xyz = rng.uniform(-1, 1, (n_alive, 3)).astype(np.float32)
    rgb = np.full((n_alive, 3), 0.5, np.float32)
    opacity = np.full((n_alive, 1), 2.0, np.float32)  # sigmoid ~ 0.88
    scales = np.full((n_alive, 3), np.log(scale), np.float32)
    quat = np.tile(
        np.array([1.0, 0, 0, 0], np.float32), (n_alive, 1)
    )
    scene = GaussianScene.create(
        xyz, rgb, opacity, scales, quat, capacity=capacity
    )
    state = T.init_train_state(scene, config)
    alive = np.asarray(state.alive)
    uv = np.zeros((capacity, 2), np.float32)
    uv[alive] = 1.0  # |uv_grad_avg| = sqrt(2) >> uv_grad_threshold
    cnt = np.zeros((capacity,), np.int32)
    cnt[alive] = 1
    return state._replace(
        uv_grad_accum=jnp.asarray(uv), grad_accum_count=jnp.asarray(cnt)
    )


def test_adc_clone_drains_beyond_one_batch():
    """n_clone > cap//4 must clone EVERY candidate (batched while_loop),
    not silently defer the tail (VERDICT r2 item 8)."""
    cfg = SplatConfig(
        splat_capacity=1 << 17, use_fractional_densification=False,
        use_split=False, use_delete=False,
    )
    cap, n = 64, 24  # max_new = 16 < 24 candidates -> needs 2 batches
    state = _dense_state(n, cap, scale=0.005, config=cfg)  # small -> clone
    state, stats = T.adaptive_density_control(
        state, jax.random.PRNGKey(0), jnp.float32(1000.0), config=cfg
    )
    assert int(stats["n_clone"]) == n
    assert int(stats["clone_deferred"]) == 0
    assert not bool(stats["cap_hit"])
    assert int(stats["n_alive"]) == 2 * n


def test_adc_clone_free_slot_exhaustion_is_reported():
    cfg = SplatConfig(
        splat_capacity=1 << 17, use_fractional_densification=False,
        use_split=False, use_delete=False,
    )
    cap, n = 32, 24  # only 8 free slots for 24 candidates
    state = _dense_state(n, cap, scale=0.005, config=cfg)
    state, stats = T.adaptive_density_control(
        state, jax.random.PRNGKey(0), jnp.float32(1000.0), config=cfg
    )
    assert int(stats["clone_deferred"]) == 24 - 8
    assert bool(stats["cap_hit"])
    assert int(stats["n_alive"]) == 32  # every free slot consumed


def test_adc_split_drains_beyond_one_batch():
    """Splits beyond one batch all process; each original slot is
    overwritten with sample 1 and a free slot takes sample 2."""
    cfg = SplatConfig(
        splat_capacity=1 << 17, use_fractional_densification=False,
        use_clone=False, use_delete=False,
    )
    cap, n = 64, 24  # max_new = 16 < 24 split sources
    state = _dense_state(n, cap, scale=0.05, config=cfg)  # big -> split
    xyz_before = np.asarray(state.params["xyz"]).copy()
    state, stats = T.adaptive_density_control(
        state, jax.random.PRNGKey(0), jnp.float32(1000.0), config=cfg
    )
    assert int(stats["n_split"]) == n
    assert int(stats["split_deferred"]) == 0
    assert not bool(stats["cap_hit"])
    assert int(stats["n_alive"]) == 2 * n
    # scales shrank by the split factor on every split slot
    alive = np.asarray(state.alive)
    s = np.exp(np.asarray(state.params["scale"])[alive])
    np.testing.assert_allclose(s, 0.05 / cfg.split_scale_factor, rtol=1e-5)
    # sample positions moved off the originals
    assert not np.allclose(
        np.asarray(state.params["xyz"])[:n], xyz_before[:n]
    )


def test_train_steps_scan_matches_sequential(setup):
    """K scanned steps in one dispatch == K sequential train_steps
    (same _train_step_impl body; bitwise on CPU)."""
    state, gt, cam, pose = setup
    params = dict(state.params)
    params["rgb"] = params["rgb"] * 0.5
    state = state._replace(params=params)
    gt_u8 = (np.clip(np.asarray(gt), 0, 1) * 255).astype(np.uint8)

    seq = jax.tree_util.tree_map(jnp.copy, state)
    seq_losses = []
    for _ in range(3):
        seq, info = T.train_step(
            seq, jnp.asarray(gt_u8), cam.K, pose,
            jnp.zeros(3, jnp.float32),
            config=CFG, camera_hw=CAM_HW, n_sh_band=0, use_background=False,
        )
        seq_losses.append(float(info["loss"]))

    scanned, infos = T.train_steps_scan(
        state,
        jnp.asarray(gt_u8)[None],          # (M=1, H, W, 3) uint8
        jnp.asarray(cam.K)[None],
        jnp.asarray(pose)[None],
        jnp.zeros((3,), jnp.int32),        # all steps train camera 0
        jnp.zeros((3, 3), jnp.float32),
        config=CFG, camera_hw=CAM_HW, n_sh_band=0, n_steps=3,
    )
    np.testing.assert_allclose(
        np.asarray(infos["loss"]), np.asarray(seq_losses), rtol=0, atol=0
    )
    for k in seq.params:
        np.testing.assert_array_equal(
            np.asarray(scanned.params[k]), np.asarray(seq.params[k]),
            err_msg=k,
        )
    np.testing.assert_array_equal(
        np.asarray(scanned.grad_accum_count),
        np.asarray(seq.grad_accum_count),
    )
