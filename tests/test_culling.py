"""Exact structural test of tile assignment + depth ordering.

The expected 641-element splat list is the golden output of the reference
implementation for the shared fixture (test/test_tile_culling.py:72-104);
it pins both the OBB/SAT tile assignment and the per-tile depth ordering.
The reference indexes into the culled (3-gaussian) array; our pipeline
keeps original ids, hence the +3 offset.
"""

import numpy as np
import pytest

from gaussian_splatting_tpu import geometry as geo
from gaussian_splatting_tpu.culling import (
    build_splat_layout,
    frustum_visible,
    sorted_splat_list,
)
from gaussian_splatting_tpu.structs import TileGrid
from tests import fixtures as fx

# fmt: off
EXPECTED_CULLED_IDX = [
    1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
    1, 1, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 0, 2, 0, 2, 0, 2, 0, 2, 0,
    2, 0, 2, 0, 2, 0, 2, 0, 2, 0, 2, 1, 2, 1, 2, 1, 2, 1, 2, 2, 2, 2, 2, 2,
    2, 2, 2, 2, 2, 2, 2, 0, 2, 0, 2, 0, 2, 0, 2, 0, 2, 0, 2, 0, 2, 0, 2, 0,
    2, 0, 2, 1, 2, 1, 2, 1, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 0, 2, 0,
    2, 0, 2, 0, 2, 0, 2, 0, 2, 0, 2, 0, 2, 0, 2, 0, 1, 2, 1, 2, 1, 2, 1, 2,
    2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 0, 2, 0, 2, 0, 2, 0, 2, 0, 2, 0, 2,
    0, 2, 0, 2, 0, 2, 0, 1, 2, 1, 2, 1, 2, 1, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2,
    2, 2, 2, 0, 2, 0, 2, 0, 2, 0, 2, 0, 2, 0, 2, 0, 2, 0, 2, 0, 2, 0, 1, 2,
    1, 2, 1, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 0, 2, 0, 2, 0, 2, 0,
    2, 0, 2, 0, 2, 0, 2, 0, 2, 0, 1, 2, 0, 1, 2, 1, 2, 1, 2, 2, 2, 2, 2, 2,
    2, 2, 2, 2, 2, 2, 2, 2, 0, 2, 0, 2, 0, 2, 0, 2, 0, 2, 0, 2, 0, 2, 0, 2,
    0, 1, 2, 0, 1, 2, 1, 2, 1, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 0,
    2, 0, 2, 0, 2, 0, 2, 0, 2, 0, 2, 0, 2, 0, 2, 0, 1, 2, 0, 1, 2, 1, 2, 2,
    2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 0, 2, 0, 2, 0, 2, 0, 2, 0, 2, 0,
    2, 0, 2, 0, 1, 2, 0, 1, 2, 0, 1, 2, 1, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2,
    2, 2, 2, 2, 0, 2, 0, 2, 0, 2, 0, 2, 0, 2, 0, 2, 0, 2, 0, 1, 2, 0, 1, 2,
    0, 1, 2, 1, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 0, 2, 0, 2, 0,
    2, 0, 2, 0, 2, 0, 2, 0, 2, 0, 1, 2, 0, 1, 2, 0, 1, 2, 0, 1, 2, 2, 2, 2,
    2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 0, 2, 0, 2, 0, 2, 0, 2, 0, 2, 0, 2, 0,
    2, 0, 1, 2, 0, 1, 2, 0, 1, 2, 0, 2, 2, 2, 0, 0, 0, 0, 0, 0, 0, 1, 0, 1,
    0, 1, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0, 1, 0, 1, 0, 1, 0, 1, 0, 0, 0, 0, 0,
    0, 0, 0, 1, 0, 1, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0, 1, 0, 1, 0, 1, 0, 1, 0,
    0, 0, 0, 0, 0, 0, 0, 1, 0, 1, 0, 1, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0, 1, 0,
    1, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 0, 1, 0, 1, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
]
# fmt: on


@pytest.fixture
def pipeline_outputs():
    scene = fx.test_scene(opacity_presigmoid=False)
    cam = fx.test_camera()
    pose = fx.test_camera_T_world()
    xyz_cam = geo.transform_points(scene.xyz, pose)
    uv = geo.project_points(xyz_cam, cam.K)
    visible = frustum_visible(
        xyz_cam, uv, (cam.width, cam.height), 0.3, np.inf, 10.0
    )
    sigma = geo.compute_sigma_world(scene.quaternion, scene.scale)
    J = geo.compute_projection_jacobian(xyz_cam, cam.K)
    conic = geo.compute_conic(sigma, J, pose)
    grid = TileGrid(cam.height, cam.width)
    return uv, conic, xyz_cam, visible, grid


def test_exact_sorted_splat_list(pipeline_outputs):
    uv, conic, xyz_cam, visible, grid = pipeline_outputs
    assert grid.tile_count == 1200
    layout = build_splat_layout(
        uv, conic, xyz_cam[:, 2], visible, grid,
        mh_dist=3.0, splat_capacity=1 << 18, chunk=256,
    )
    assert not bool(layout.overflow)
    assert int(layout.num_splats) == len(EXPECTED_CULLED_IDX)

    sorted_gid, starts = sorted_splat_list(layout, grid, chunk=256)
    expected = np.array(EXPECTED_CULLED_IDX, dtype=np.int32) + 3
    np.testing.assert_array_equal(sorted_gid, expected)
    assert starts.shape == (1201,)
    assert starts[-1] == len(EXPECTED_CULLED_IDX)


def test_layout_chunk_metadata_consistency(pipeline_outputs):
    uv, conic, xyz_cam, visible, grid = pipeline_outputs
    chunk = 256
    layout = build_splat_layout(
        uv, conic, xyz_cam[:, 2], visible, grid,
        mh_dist=3.0, splat_capacity=1 << 18, chunk=chunk,
    )
    counts = np.asarray(layout.tile_counts)
    toc = np.asarray(layout.tile_of_chunk)
    vic = np.asarray(layout.valid_in_chunk)
    cit = np.asarray(layout.chunk_in_tile)
    gid = np.asarray(layout.gaussian_idx)
    n_tiles = grid.tile_count

    # each tile with count>0 owns ceil(count/chunk) chunks, consecutive
    used = toc < n_tiles
    for t in np.nonzero(counts)[0]:
        chunks_t = np.nonzero(toc == t)[0]
        assert len(chunks_t) == -(-counts[t] // chunk)
        assert np.array_equal(cit[chunks_t], np.arange(len(chunks_t)))
        assert vic[chunks_t].sum() == counts[t]
    # valid splat slots hold real gaussian ids, padding holds the sentinel
    for w in np.nonzero(used)[0]:
        sl = gid[w * chunk : (w + 1) * chunk]
        assert np.all(sl[: vic[w]] < 6)
        assert np.all(sl[vic[w] :] == 6)


def test_tilegrid_padding():
    grid = TileGrid(1080, 1920)
    assert grid.image_height_padded == 1088
    assert grid.image_width_padded == 1920
    assert grid.y_tiles == 68
    assert grid.x_tiles == 120
    assert grid.tile_count == 8160
