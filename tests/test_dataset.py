"""Dataset-layer tests: gaussian-initialisation parity and (env-gated)
real COLMAP dataset loading.

The reference pins these in test/test_dataloader.py against a hardcoded
local garden path; here the init math is pinned against a hand-computed
oracle on synthetic points, and the real-dataset load is gated on
GS_DATASET_PATH (SURVEY.md §4).
"""

import os

import numpy as np
import pytest

from gaussian_splatting_tpu.config import SplatConfig
from gaussian_splatting_tpu.dataio.dataset import (
    ColmapDataset,
    SceneData,
    create_scene,
    initial_scale,
    knn_mean_distance,
)
from gaussian_splatting_tpu.geometry import SH_0, inverse_sigmoid


def test_knn_mean_distance_self_inclusive():
    """Parity quirk: the reference's KDTree query includes the point
    itself at distance 0 (utils.py:30-33), so 'mean of k neighbours' is
    mean(0, d1, ..., d_{k-1})."""
    pts = np.array(
        [[0.0, 0, 0], [1.0, 0, 0], [0.0, 2, 0], [5.0, 5, 5]], np.float32
    )
    d = knn_mean_distance(pts, 3)
    # point 0: neighbours at dist 0 (self), 1.0, 2.0 -> mean 1.0
    np.testing.assert_allclose(d[0], 1.0, atol=1e-6)
    # point 1: dist 0, 1.0 (p0), sqrt(1+4)=2.2360 (p2)
    np.testing.assert_allclose(d[1], (0 + 1.0 + np.sqrt(5.0)) / 3, atol=1e-5)


def test_initial_scale_cap_before_factor():
    """The reference caps the mean neighbour distance at
    max_initial_scale BEFORE multiplying by the scale factor
    (utils.py:32-36)."""
    cfg = SplatConfig()
    pts = np.array(
        [[0.0, 0, 0], [10.0, 0, 0], [0.0, 10.0, 0]], np.float32
    )
    s = initial_scale(pts, cfg)
    # mean dists all >> cap 0.1 -> scale = log(0.1 * 0.8) everywhere
    np.testing.assert_allclose(
        s, np.log(0.1 * 0.8), atol=1e-6
    )
    assert s.shape == (3, 3)


def test_create_scene_init_parity():
    """Opacity <- inverse_sigmoid(0.2), quat <- identity, rgb passed
    through, dead slots beyond N (dataloader.py:43-67)."""
    rng = np.random.default_rng(0)
    n, cap = 50, 64
    xyz = rng.normal(size=(n, 3)).astype(np.float32)
    rgb = rng.uniform(0, 1, (n, 3)).astype(np.float32) / SH_0
    data = SceneData(xyz=xyz, rgb=rgb, images=[], cameras={})
    cfg = SplatConfig()
    scene = create_scene(data, cfg, cap)

    assert scene.capacity == cap
    alive = np.asarray(scene.alive)
    assert alive[:n].all() and not alive[n:].any()
    np.testing.assert_allclose(
        np.asarray(scene.opacity)[:n],
        float(inverse_sigmoid(cfg.initial_opacity)),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(scene.quaternion)[:n],
        np.tile([1.0, 0, 0, 0], (n, 1)),
        atol=0,
    )
    np.testing.assert_allclose(np.asarray(scene.rgb)[:n], rgb, atol=0)
    want_scale = initial_scale(xyz, cfg)
    np.testing.assert_allclose(
        np.asarray(scene.scale)[:n], want_scale, atol=1e-6
    )


@pytest.mark.skipif(
    not os.environ.get("GS_DATASET_PATH"),
    reason="set GS_DATASET_PATH to a COLMAP dataset root to run",
)
def test_colmap_dataset_env_gated():
    """Load a real Mip-NeRF-360-style dataset (reference:
    test/test_dataloader.py, which hardcodes /home/joe/Downloads/garden)."""
    ds = ColmapDataset(os.environ["GS_DATASET_PATH"], downsample_factor=8)
    data = ds.scene_data()
    assert data.xyz.shape[0] > 1000
    assert data.xyz.shape == data.rgb.shape
    assert len(data.images) > 10
    for im in data.images[:3]:
        assert im.camera_id in data.cameras
        T = im.camera_T_world
        # valid rigid transform
        R = T[:3, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-4)
    cam = next(iter(data.cameras.values()))
    assert cam.K[0, 0] > 0 and cam.width > 0 and cam.height > 0
