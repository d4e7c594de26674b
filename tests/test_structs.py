"""TileGrid padding arithmetic and GaussianScene capacity semantics
(reference: test/test_structs.py)."""

import numpy as np
import jax.numpy as jnp

from gaussian_splatting_tpu.structs import GaussianScene, TileGrid


def test_tile_grid_1080p():
    grid = TileGrid(1080, 1920)
    assert grid.image_height == 1080
    assert grid.image_width == 1920
    assert grid.image_height_padded == 1088
    assert grid.image_width_padded == 1920
    assert grid.y_tiles == 68
    assert grid.x_tiles == 120
    assert grid.tile_count == 8160


def test_scene_capacity_padding():
    n, cap = 5, 16
    rng = np.random.default_rng(0)
    scene = GaussianScene.create(
        xyz=rng.normal(size=(n, 3)),
        rgb=rng.uniform(size=(n, 3)),
        opacity=rng.normal(size=(n, 1)),
        scale=rng.normal(size=(n, 3)),
        quaternion=rng.normal(size=(n, 4)),
        capacity=cap,
    )
    assert scene.capacity == cap
    assert int(scene.num_alive()) == n
    assert bool(scene.alive[n])is False
    # dead slots hold identity quaternions so normalisation stays finite
    np.testing.assert_array_equal(
        np.asarray(scene.quaternion[n:]),
        np.tile([1.0, 0, 0, 0], (cap - n, 1)),
    )
    # SH always allocated at 15 coefficients (band schedule never reshapes)
    assert scene.sh.shape == (cap, 3, 15)
    p = scene.params()
    assert set(p) == {"xyz", "rgb", "opacity", "scale", "quaternion", "sh"}
