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
    from gaussian_splatting_tpu.ops.render import (
        build_step_meta,
        expand_step_meta,
    )

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
    s_out = gid.shape[0]  # full-width splat list (sum of tier cells)
    assert s_out % chunk == 0
    assert starts.shape == (n_tiles + 1,)
    assert np.array_equal(counts, np.diff(starts))
    assert starts[0] == 0 and starts[-1] == int(layout.num_splats)
    # valid slots hold real gaussian ids, padding holds the sentinel
    assert np.all(gid[: starts[-1]] < 6)
    assert np.all(gid[starts[-1] :] == 6)

    # the kernels read the compact meta (packed step->tile array + the
    # 3-row per-tile info table); expand_step_meta replays the kernels'
    # own scalar derivation, so these assertions pin what the kernels see
    meta = build_step_meta(layout, n_tiles, chunk)
    tile_info = np.asarray(meta[1])
    assert tile_info.shape == (3, n_tiles + 1)
    step_tile, win_in, win_out = [
        np.asarray(x) for x in expand_step_meta(meta, n_tiles, chunk, s_out)
    ]
    g_expect = s_out // chunk + n_tiles
    assert step_tile.shape == (g_expect + g_expect % 2,)
    n_win = s_out // chunk
    cover = -(-int(starts[-1]) // chunk)  # windows the live prefix touches
    covered = np.zeros(s_out, bool)
    swept = []
    for s in range(step_tile.shape[0]):
        t = step_tile[s]
        if t == n_tiles:
            # unused steps SWEEP the windows past the live prefix (the
            # backward zero-fills each swept window in-kernel), then pile
            # onto the dummy block
            assert win_in[s] == min(win_out[s], n_win - 1)
            if win_out[s] < n_win:
                swept.append(int(win_out[s]))
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
    # the tail sweep hits every window past the live prefix exactly once,
    # in ascending order, with win_in == win_out (so new_window fires and
    # the zero-write starts from 0, never a stale VMEM buffer)
    assert swept == list(range(cover, n_win))
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


def _random_layout_scene(rng, n, grid_hw=(336, 512), sig_max=4.0):
    """Random small gaussians spread over a grid_hw image; returns the
    layout inputs (uv, conic, z, visible, grid)."""
    import jax.numpy as jnp
    from gaussian_splatting_tpu.structs import TileGrid

    h, w = grid_hw
    uv = np.stack(
        [rng.uniform(0, w, n), rng.uniform(0, h, n)], axis=1
    ).astype(np.float32)
    # isotropic conics, radii sized to keep the default tier capacities
    # comfortable (sub-tile to a few tiles)
    sig = rng.uniform(1.5, sig_max, n).astype(np.float32)
    conic = np.stack(
        [sig**2, np.zeros(n, np.float32), sig**2], axis=1
    )
    z = rng.uniform(1.0, 50.0, n).astype(np.float32)
    visible = np.ones(n, bool)
    return (
        jnp.asarray(uv), jnp.asarray(conic), jnp.asarray(z),
        jnp.asarray(visible), TileGrid(h, w),
    )


def test_feature_grad_reduction_production_scale_one_signed():
    """Gradient-reduction accuracy guard at production-like scale: with
    one-signed cotangents (the realistic shape of opacity/loss grads) the
    per-gaussian sums must stay at f32-roundoff-level relative error
    regardless of total splat count.  The round-1 running-prefix reduction
    had cancellation error growing with the *global* splat count (advisor
    finding); the permutation-inversion reduction only ever adds a
    gaussian's own terms, like the reference's scatter-add
    (render_backward.cu:238-282)."""
    import jax
    import jax.numpy as jnp
    from gaussian_splatting_tpu.culling import (
        build_splat_layout,
        layout_with_features,
    )

    rng = np.random.default_rng(7)
    n, s_cap, r = 1 << 17, 1 << 21, 2
    uv, conic, z, visible, grid = _random_layout_scene(rng, n, sig_max=3.0)
    feat_g = jnp.asarray(rng.uniform(0.1, 1.0, (r, n)).astype(np.float32))

    layout = build_splat_layout(
        uv, conic, z, visible, grid, 3.0, s_cap, 256
    )
    assert not bool(layout.overflow)
    assert int(layout.num_splats) > 400_000  # actually production-like
    s_out = layout.gaussian_idx.shape[0]
    cot = jnp.asarray(
        rng.uniform(0.1, 1.0, (r, s_out)).astype(np.float32)
    )

    def expand(fg):
        _, feat = layout_with_features(
            uv, conic, z, visible, fg, grid, 3.0, s_cap, 256
        )
        return jnp.sum(feat * cot)

    got = np.asarray(jax.grad(expand)(feat_g))
    gid = np.asarray(layout.gaussian_idx)
    want = np.zeros((r, n), np.float64)
    keep = gid < n
    np.add.at(want.T, gid[keep], np.asarray(cot, np.float64).T[keep])
    rel = np.abs(got - want) / np.maximum(np.abs(want), 1e-3)
    assert rel.max() < 1e-5, rel.max()

    # bf16 mode (kernel_precision="bf16", the config default): gradient
    # rows ride the two reduction sorts as packed bf16 pairs — each value
    # is rounded to bf16 twice, so per-gaussian sums of one-signed terms
    # must stay within ~2x bf16 unit roundoff (2^-8 ≈ 0.4%) relative — the
    # production-scale bound behind PERF.md's "~0.4% gradient noise" claim.
    def expand_bf16(fg):
        _, feat = layout_with_features(
            uv, conic, z, visible, fg, grid, 3.0, s_cap, 256, 0, None,
            "bf16",
        )
        return jnp.sum(feat * cot)

    got16 = np.asarray(jax.grad(expand_bf16)(feat_g))
    rel16 = np.abs(got16 - want) / np.maximum(np.abs(want), 1e-3)
    assert rel16.max() < 1.2e-2, rel16.max()
    assert np.mean(rel16) < 4e-3, np.mean(rel16)


def test_feature_grad_reduction_ignores_dead_slot_garbage():
    """Slots past num_splats are never written by the backward kernel, so
    the reduction must ignore arbitrary garbage (NaN) cotangents there."""
    import jax
    import jax.numpy as jnp
    from gaussian_splatting_tpu.culling import (
        build_splat_layout,
        layout_with_features,
    )

    rng = np.random.default_rng(3)
    n, s_cap, r = 256, 1 << 12, 3
    uv, conic, z, visible, grid = _random_layout_scene(rng, n, (96, 128))
    feat_g = jnp.asarray(rng.normal(size=(r, n)).astype(np.float32))

    layout = build_splat_layout(uv, conic, z, visible, grid, 3.0, s_cap, 256)
    gid = np.asarray(layout.gaussian_idx)
    cot = rng.normal(size=(r, gid.shape[0])).astype(np.float32)
    cot[:, gid >= n] = np.nan

    def expand(fg):
        _, feat = layout_with_features(
            uv, conic, z, visible, fg, grid, 3.0, s_cap, 256
        )
        return feat

    _, vjp = jax.vjp(expand, feat_g)
    (got,) = vjp(jnp.asarray(cot))
    got = np.asarray(got)
    want = np.zeros((r, n), np.float32)
    keep = gid < n
    np.add.at(want.T, gid[keep], cot.T[keep])
    np.testing.assert_allclose(got, want, atol=1e-4)


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

    layout = build_splat_layout(
        uv, conic, xyz_cam[:, 2], visible, grid, 3.0,
        splat_capacity=scap, chunk=256,
    )
    gid = np.asarray(layout.gaussian_idx)
    s_out = gid.shape[0]
    cot = jnp.asarray(rng.normal(size=(4, s_out)).astype(np.float32))

    def expand(fg):
        layout, feat = layout_with_features(
            uv, conic, xyz_cam[:, 2], visible, fg, grid, 3.0, scap, 256
        )
        return jnp.sum(feat * cot)

    g = np.asarray(jax.grad(expand)(feat_g))

    want = np.zeros((4, n), np.float32)
    c = np.asarray(cot)
    for i in range(s_out):
        if gid[i] < n:
            want[:, gid[i]] += c[:, i]
    np.testing.assert_allclose(g, want, atol=1e-3)

    # forward expansion must equal the gather on LIVE slots; sentinel
    # slots are unspecified (the kernels lane-mask them via tile ranges
    # before any cross-lane reduction) but must stay finite so masked
    # lanes cannot poison a matmul with inf*0
    _, feat = layout_with_features(
        uv, conic, xyz_cam[:, 2], visible, feat_g, grid, 3.0, scap, 256
    )
    fg = np.asarray(feat_g)
    feat_np = np.asarray(feat)
    live = gid < n
    want_f = fg[:, np.minimum(gid, n - 1)]
    np.testing.assert_allclose(feat_np[:, live], want_f[:, live], atol=0)
    assert np.isfinite(feat_np).all()
