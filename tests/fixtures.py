"""The shared 6-gaussian synthetic test scene.

Same data as the reference fixture (test/gaussian_test_data.py): six
gaussians with distinct colours/scales/orientations in front of a 640x480
camera with fx != fy; three are culled by the frustum.  All golden values
in the test suite were produced by the reference CUDA implementation
against this exact scene.
"""

import numpy as np
import jax.numpy as jnp

from gaussian_splatting_tpu.structs import Camera, GaussianScene


def test_xyz():
    return np.array(
        [
            [1.0, 2.0, -4.0],
            [4.0, 5.0, 6.0],
            [7.0, 8.0, -9.0],
            [1.0, 2.0, 15.0],
            [2.5, -1.0, 4.0],
            [-1.0, -2.0, 10.0],
        ],
        dtype=np.float32,
    )


def test_rgb():
    rgb = np.full((6, 3), 0.5, dtype=np.float32)
    rgb[3] = [0.5, 0.0, 0.0]
    rgb[4] = [0.0, 0.5, 0.0]
    rgb[5] = [0.0, 0.0, 0.5]
    return rgb / 0.28209479177387814


def test_scale():
    return np.log(
        np.array(
            [
                [0.02, 0.03, 0.04],
                [0.01, 0.05, 0.02],
                [0.09, 0.03, 0.01],
                [1.0, 3.0, 0.1],
                [2.0, 0.2, 0.1],
                [2.0, 1.0, 0.1],
            ],
            dtype=np.float32,
        )
    )


def test_quaternion():
    return np.array(
        [
            [1.0, 0.0, 0.0, 0.0],
            [0.0, 1.0, 0.0, 0.0],
            [0.0, 0.0, 1.0, 0.0],
            [1.0, 0.0, 0.0, 0.0],
            [0.714, -0.002, -0.664, 0.221],
            [1.0, 0.0, 0.0, 0.0],
        ],
        dtype=np.float32,
    )


def test_camera():
    K = jnp.array(
        [[430.0, 0.0, 320.0], [0.0, 410.0, 240.0], [0.0, 0.0, 1.0]],
        dtype=jnp.float32,
    )
    return Camera(K=K, width=640, height=480)


def test_camera_T_world():
    return jnp.array(
        [
            [0.9999, 0.0089, 0.0073, -0.3283],
            [-0.0106, 0.9568, 0.2905, -1.9260],
            [-0.0044, -0.2906, 0.9568, 2.9581],
            [0.0000, 0.0000, 0.0000, 1.0000],
        ],
        dtype=jnp.float32,
    )


def inverse_sigmoid_np(x):
    x = np.clip(x, 1e-4, 1 - 1e-4)
    return np.log(x / (1.0 - x))


def test_scene(opacity_presigmoid=True, capacity=None, sh=None):
    """Scene pytree.  opacity_presigmoid applies inverse_sigmoid(1.0) like
    the rasterize/depth tests do (test/test_rasterize.py:20)."""
    op = np.ones((6, 1), dtype=np.float32)
    if opacity_presigmoid:
        op = inverse_sigmoid_np(op).astype(np.float32)
    return GaussianScene.create(
        xyz=test_xyz(),
        rgb=test_rgb(),
        opacity=op,
        scale=test_scale(),
        quaternion=test_quaternion(),
        sh=sh,
        capacity=capacity,
    )
