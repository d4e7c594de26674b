"""Multi-chip data parallelism on the 8-device virtual CPU mesh.

Pins the semantics of parallel.mesh.dp_train_step: a D-camera step must
produce exactly the state a single device would reach by averaging the D
per-camera gradients (and psum-ing the densification statistics).  The
reference has no multi-device mode (SURVEY.md §2.3); D=1 reduces to its
one-camera-per-step semantics, which is what the equivalence below checks
against.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussian_splatting_tpu import optim
from gaussian_splatting_tpu import trainer as T
from gaussian_splatting_tpu.config import SplatConfig
from gaussian_splatting_tpu.parallel import dp_train_step, make_mesh
from gaussian_splatting_tpu.parallel.mesh import (
    _local_loss,
    replicate_state,
    shard_batch,
)
from tests import fixtures as fx

CFG = SplatConfig(splat_capacity=1 << 15, chunk=256)
CAM_HW = (480, 640)
D = 8


def _poses():
    """D distinct camera poses: the fixture pose nudged along x."""
    base = np.asarray(fx.test_camera_T_world())
    poses = []
    for i in range(D):
        p = base.copy()
        p[0, 3] += 0.05 * i
        poses.append(p)
    return np.stack(poses)


@pytest.fixture(scope="module")
def setup():
    scene = fx.test_scene(opacity_presigmoid=True, capacity=16)
    state = T.init_train_state(scene, CFG)
    cam = fx.test_camera()
    poses = _poses()
    rng = np.random.default_rng(0)
    gts = rng.uniform(0.0, 1.0, (D, CAM_HW[0], CAM_HW[1], 3)).astype(
        np.float32
    )
    Ks = np.broadcast_to(np.asarray(cam.K), (D, 3, 3)).copy()
    bgs = np.zeros((D, 3), np.float32)
    return state, gts, Ks, poses, bgs


def test_mesh_has_8_devices():
    mesh = make_mesh(D)
    assert mesh.devices.size == D


def test_dp_step_equals_mean_of_per_camera_grads(setup):
    state, gts, Ks, poses, bgs = setup
    cap = state.alive.shape[0]

    # ---- expected: per-camera grads on one device, averaged by hand
    grad_fn = jax.jit(
        jax.value_and_grad(
            functools.partial(
                _local_loss, config=CFG, camera_hw=CAM_HW, n_sh_band=0,
                interpret=True,
            ),
            argnums=(0, 2),
            has_aux=True,
        )
    )
    uv_zero = jnp.zeros((2, cap), jnp.float32)
    gsum, uv_abs_sum, seen_sum, losses = None, 0.0, 0, []
    for d in range(D):
        (loss, aux), (gp, guv) = grad_fn(
            state.params, state.alive, uv_zero,
            jnp.asarray(gts[d]), jnp.asarray(Ks[d]), jnp.asarray(poses[d]),
            jnp.asarray(bgs[d]),
        )
        visible = aux[1]
        losses.append(float(loss))
        gsum = gp if gsum is None else jax.tree_util.tree_map(
            lambda a, b: a + b, gsum, gp
        )
        fxfy = jnp.stack([Ks[d][0, 0], Ks[d][1, 1]])
        uv_abs_sum = uv_abs_sum + (
            jnp.abs(guv) * fxfy[:, None] * visible[None, :]
        ).T
        seen_sum = seen_sum + visible.astype(jnp.int32)
    gmean = jax.tree_util.tree_map(lambda a: a / D, gsum)

    opt = optim.make_optimizer(CFG)
    updates, exp_opt_state = opt.update(
        gmean, state.opt_state, state.params
    )
    exp_params = jax.tree_util.tree_map(
        lambda p, u: p + u, state.params, updates
    )

    # ---- actual: one dp step over the 8-device mesh
    mesh = make_mesh(D)
    dp_state = replicate_state(
        jax.tree_util.tree_map(jnp.copy, state), mesh
    )
    new_state, info = dp_train_step(
        dp_state,
        shard_batch(jnp.asarray(gts), mesh),
        shard_batch(jnp.asarray(Ks), mesh),
        shard_batch(jnp.asarray(poses), mesh),
        shard_batch(jnp.asarray(bgs), mesh),
        config=CFG, camera_hw=CAM_HW, n_sh_band=0, mesh=mesh,
        interpret=True,
    )

    assert np.isclose(float(info["loss"]), np.mean(losses), atol=1e-5)
    for k in exp_params:
        np.testing.assert_allclose(
            np.asarray(new_state.params[k]), np.asarray(exp_params[k]),
            atol=1e-5, err_msg=k,
        )
    np.testing.assert_allclose(
        np.asarray(new_state.uv_grad_accum), np.asarray(uv_abs_sum),
        atol=1e-5,
    )
    np.testing.assert_array_equal(
        np.asarray(new_state.grad_accum_count), np.asarray(seen_sum)
    )
    # xyz densify stat accumulates |mean grad| (already psum-reduced)
    np.testing.assert_allclose(
        np.asarray(new_state.xyz_grad_accum),
        np.asarray(jnp.abs(gmean["xyz"])),
        atol=1e-5,
    )
    # adam moments advanced identically
    exp_adam = optim.adam_moments(exp_opt_state)
    got_adam = optim.adam_moments(new_state.opt_state)
    np.testing.assert_allclose(
        np.asarray(got_adam.mu["xyz"]), np.asarray(exp_adam.mu["xyz"]),
        atol=1e-6,
    )
