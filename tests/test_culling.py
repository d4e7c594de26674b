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


def test_layout_step_metadata_consistency(pipeline_outputs):
    """The window-walk step metadata must tile the splat array exactly:
    each tile's steps cover its [start, end) slot range with disjoint lane
    masks, in order, and every live slot is covered exactly once."""
    from gaussian_splatting_tpu.ops.render import build_step_meta

    uv, conic, xyz_cam, visible, grid = pipeline_outputs
    chunk = 256
    s_cap = 1 << 18
    layout = build_splat_layout(
        uv, conic, xyz_cam[:, 2], visible, grid,
        mh_dist=3.0, splat_capacity=s_cap, chunk=chunk,
    )
    n_tiles = grid.tile_count
    starts = np.asarray(layout.tile_starts)
    counts = np.asarray(layout.tile_counts)
    gid = np.asarray(layout.gaussian_idx)
    assert starts.shape == (n_tiles + 1,)
    assert np.array_equal(counts, np.diff(starts))
    assert starts[0] == 0 and starts[-1] == int(layout.num_splats)
    # valid slots hold real gaussian ids, padding holds the sentinel
    assert np.all(gid[: starts[-1]] < 6)
    assert np.all(gid[starts[-1] :] == 6)

    step_tile, win_in, win_out, tile_info = [
        np.asarray(x) for x in build_step_meta(layout, n_tiles, chunk)
    ]
    assert step_tile.shape == (s_cap // chunk + n_tiles,)
    covered = np.zeros(s_cap, bool)
    for s in range(step_tile.shape[0]):
        t = step_tile[s]
        if t == n_tiles:
            assert win_out[s] == s_cap // chunk  # dummy output window
            continue
        w = win_in[s]
        assert w == win_out[s]
        lo = max(tile_info[0, t] - w * chunk, 0)
        hi = min(tile_info[1, t] - w * chunk, chunk)
        assert lo < hi  # every used step does work
        sl = slice(w * chunk + lo, w * chunk + hi)
        assert not covered[sl].any()  # disjoint
        covered[sl] = True
        assert np.all(gid[sl] < 6)
    # exactly the live slots are covered
    assert covered.sum() == starts[-1]
    assert covered[: starts[-1]].all()
    # per-tile steps are consecutive and windows ascend
    for t in np.nonzero(counts)[0]:
        steps_t = np.nonzero(step_tile == t)[0]
        assert np.array_equal(steps_t, np.arange(steps_t[0], steps_t[-1] + 1))
        assert np.array_equal(
            win_in[steps_t],
            np.arange(starts[t] // chunk, (starts[t + 1] - 1) // chunk + 1),
        )


def test_tilegrid_padding():
    grid = TileGrid(1080, 1920)
    assert grid.image_height_padded == 1088
    assert grid.image_width_padded == 1920
    assert grid.y_tiles == 68
    assert grid.x_tiles == 120
    assert grid.tile_count == 8160


def test_reduce_rows_by_gid_matches_scatter():
    """The all-sort reduction used by layout_with_features' VJP must equal
    the plain scatter-add transpose of the feature expansion."""
    import numpy as np
    import jax.numpy as jnp
    from gaussian_splatting_tpu.culling import reduce_rows_by_gid

    rng = np.random.default_rng(0)
    cap, s, r = 37, 512, 5
    gid = rng.integers(0, cap + 1, s).astype(np.int32)  # cap = dead slot
    rows = rng.normal(size=(r, s)).astype(np.float32)
    # NaNs at dead lanes must be ignored (the kernels emit them there)
    rows[:, gid == cap] = np.nan

    got = np.asarray(reduce_rows_by_gid(jnp.asarray(rows), jnp.asarray(gid), cap))
    want = np.zeros((r, cap), np.float32)
    for i in range(s):
        if gid[i] < cap:
            want[:, gid[i]] += rows[:, i]
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_reduce_rows_by_gid_production_scale_one_signed():
    """Cancellation guard: at millions of splats with one-signed rows (the
    realistic shape of opacity/loss gradients) a plain f32 running prefix
    makes adjacent differences cancel to ~ulp(global prefix) — up to ~14%
    relative error per gaussian (round-1 advisor finding).  The compensated
    prefix must stay at f32-roundoff-level relative error."""
    import jax.numpy as jnp
    from gaussian_splatting_tpu.culling import reduce_rows_by_gid

    rng = np.random.default_rng(7)
    cap, s, r = 1 << 18, 1 << 20, 2
    gid = rng.integers(0, cap, s).astype(np.int32)
    rows = rng.uniform(0.1, 1.0, (r, s)).astype(np.float32)  # one-signed

    got = np.asarray(
        reduce_rows_by_gid(jnp.asarray(rows), jnp.asarray(gid), cap)
    )
    want = np.zeros((r, cap), np.float64)
    np.add.at(want.T, gid, rows.astype(np.float64).T)
    denom = np.maximum(np.abs(want), 1e-3)
    rel = np.abs(got - want) / denom
    assert rel.max() < 1e-5, rel.max()


def test_layout_with_features_grad():
    """End-to-end: gradients wrt feat_g through layout_with_features equal
    the gather-transpose computed from gaussian_idx."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from gaussian_splatting_tpu import geometry as geo
    from gaussian_splatting_tpu.culling import (
        build_splat_layout,
        frustum_visible,
        layout_with_features,
    )
    from gaussian_splatting_tpu.structs import TileGrid
    from tests import fixtures as fx

    scene = fx.test_scene(opacity_presigmoid=True)
    cam = fx.test_camera()
    pose = fx.test_camera_T_world()
    xyz_cam = geo.transform_points(scene.xyz, pose)
    uv = geo.project_points(xyz_cam, cam.K)
    visible = frustum_visible(
        xyz_cam, uv, (cam.width, cam.height), 0.3, 100.0, 10.0
    ) & scene.alive
    sigma = geo.compute_sigma_world(scene.quaternion, scene.scale)
    J = geo.compute_projection_jacobian(xyz_cam, cam.K)
    conic = geo.compute_conic(sigma, J, pose)
    grid = TileGrid(cam.height, cam.width)
    scap = 1 << 12

    n = scene.capacity
    rng = np.random.default_rng(1)
    feat_g = jnp.asarray(rng.normal(size=(4, n)).astype(np.float32))
    cot = jnp.asarray(rng.normal(size=(4, scap)).astype(np.float32))

    def expand(fg):
        layout, feat = layout_with_features(
            uv, conic, xyz_cam[:, 2], visible, fg, grid, 3.0, scap, 256
        )
        return jnp.sum(feat * cot)

    g = np.asarray(jax.grad(expand)(feat_g))

    layout = build_splat_layout(
        uv, conic, xyz_cam[:, 2], visible, grid, 3.0,
        splat_capacity=scap, chunk=256,
    )
    gid = np.asarray(layout.gaussian_idx)
    want = np.zeros((4, n), np.float32)
    c = np.asarray(cot)
    for i in range(scap):
        if gid[i] < n:
            want[:, gid[i]] += c[:, i]
    np.testing.assert_allclose(g, want, atol=1e-3)

    # forward expansion itself must equal the gather
    _, feat = layout_with_features(
        uv, conic, xyz_cam[:, 2], visible, feat_g, grid, 3.0, scap, 256
    )
    fg = np.asarray(feat_g)
    want_f = np.where(gid[None, :] < n, fg[:, np.minimum(gid, n - 1)], 0.0)
    np.testing.assert_allclose(np.asarray(feat), want_f, atol=0)
