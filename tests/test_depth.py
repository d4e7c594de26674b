"""Depth renderer golden values (reference: test/test_depth.py).

The two probe pixels pin the euclidean depth of the first splat whose
accumulated alpha crosses the threshold (src/depth.cu:100-110): the red
gaussian's centre, and the red/blue overlap where blue is in front.
"""

import numpy as np
import jax.numpy as jnp

from gaussian_splatting_tpu.rasterize import render_depth
from tests import fixtures as fx


def test_depth_goldens():
    scene = fx.test_scene(opacity_presigmoid=True)
    depth = render_depth(
        scene.params(),
        scene.alive,
        fx.test_camera_T_world(),
        fx.test_camera(),
        alpha_threshold=0.2,
        near_thresh=0.3,
        cull_mask_padding=10.0,
        mh_dist=3.0,
        splat_capacity=1 << 18,
        chunk=256,
    )
    depth = np.asarray(depth)
    assert depth.shape == (480, 640, 1)
    # near red gaussian centre (reference: test_depth.py:33)
    np.testing.assert_allclose(depth[340, 348, 0], 17.29551887512207, atol=1e-4)
    # red/blue overlap, blue in front (reference: test_depth.py:36)
    np.testing.assert_allclose(depth[200, 348, 0], 13.205718040466309, atol=1e-4)


def test_depth_miss_is_minus_one():
    """Pixels where no splat crosses alpha_threshold stay at -1
    (reference: splat_py/depth.py:75-77)."""
    scene = fx.test_scene(opacity_presigmoid=True)
    depth = render_depth(
        scene.params(),
        scene.alive,
        fx.test_camera_T_world(),
        fx.test_camera(),
        alpha_threshold=0.2,
        near_thresh=0.3,
        cull_mask_padding=10.0,
        mh_dist=3.0,
        splat_capacity=1 << 18,
        chunk=256,
    )
    depth = np.asarray(depth)
    assert depth[0, 0, 0] == -1.0
    assert (depth[depth != -1.0] > 0).all()
