"""Gradient correctness for the Pallas rasterizer.

Strategy (replacing the reference's fp64 torch.autograd.gradcheck,
test/test_rasterize_autograd.py):

1. the pure-jnp oracle (ops/reference_impl.py) is validated against finite
   differences in float64;
2. the Pallas custom_vjp gradients are compared against the oracle's
   autodiff gradients in float32 on identical inputs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussian_splatting_tpu import geometry as geo
from gaussian_splatting_tpu.culling import (
    build_splat_layout,
    frustum_visible,
    sorted_splat_list,
)
from gaussian_splatting_tpu.ops import common as cc
from gaussian_splatting_tpu.ops import reference_impl as oracle
from gaussian_splatting_tpu.ops.render import (
    build_step_meta,
    render_tiles,
    pad_feature_rows,
    splat_features,
)
from gaussian_splatting_tpu.structs import TileGrid
from tests import fixtures as fx

CAP = 1 << 18
CHUNK = 256


def _small_camera():
    from gaussian_splatting_tpu.structs import Camera

    K = jnp.array(
        [[43.0, 0.0, 32.0], [0.0, 41.0, 24.0], [0.0, 0.0, 1.0]],
        jnp.float32,
    )
    return Camera(K=K, width=64, height=48)


def _pipeline_inputs(dtype=jnp.float32):
    """Common geometry for the fixture scene on a small camera."""
    scene = fx.test_scene(opacity_presigmoid=True)
    cam = _small_camera()
    pose = fx.test_camera_T_world().astype(dtype)
    xyz = scene.xyz.astype(dtype)
    K = cam.K.astype(dtype)
    xyz_cam = geo.transform_points(xyz, pose)
    uv = geo.project_points(xyz_cam, K)
    visible = frustum_visible(
        xyz_cam, uv, (cam.width, cam.height), 0.3, 100.0, 10.0
    )
    sigma = geo.compute_sigma_world(
        scene.quaternion.astype(dtype), scene.scale.astype(dtype)
    )
    J = geo.compute_projection_jacobian(xyz_cam, K)
    conic = geo.compute_conic(sigma, J, pose)
    grid = TileGrid(cam.height, cam.width)
    layout = build_splat_layout(
        uv.astype(jnp.float32), conic.astype(jnp.float32),
        xyz_cam[:, 2].astype(jnp.float32), visible, grid,
        mh_dist=3.0, splat_capacity=CAP, chunk=CHUNK,
    )
    opac = jax.nn.sigmoid(scene.opacity.astype(dtype))
    rgb = scene.rgb.astype(dtype) * geo.SH_0
    return scene, grid, layout, uv, conic, opac, rgb


def _dense_lists(layout, grid):
    gid, starts = sorted_splat_list(layout, grid, CHUNK)
    counts = np.diff(starts)
    L = max(1, counts.max())
    ids = np.full((grid.tile_count, L), -1, np.int64)
    for t in range(grid.tile_count):
        ids[t, : counts[t]] = gid[starts[t] : starts[t + 1]]
    return jnp.asarray(np.maximum(ids, 0)), jnp.asarray(ids >= 0)


def _oracle_image(uv, opac, conic, rgb, ids, valid, grid, bg):
    feat = splat_features(uv, opac, conic, rgb).T  # (N, 9)
    f = feat[ids][:, :, :9]  # (n_tiles, L, 9)
    img, T = oracle.composite_dense(f, valid, grid.x_tiles)
    img = oracle.apply_background(img, T, bg)
    return img, T


def test_oracle_matches_finite_differences_f64():
    """Validate the oracle's autodiff gradients against central finite
    differences in float64 (the role of torch.autograd.gradcheck in the
    reference test suite, test/test_rasterize_autograd.py)."""
    scene, grid, layout, uv, conic, opac, rgb = _pipeline_inputs(jnp.float64)
    ids, valid = _dense_lists(layout, grid)
    bg = jnp.array([0.2, 0.3, 0.1], jnp.float64)
    g_img = jax.random.normal(
        jax.random.PRNGKey(7), (grid.tile_count, 256, 3), jnp.float64
    )

    def loss(uv_, opac_, conic_, rgb_):
        img, _ = _oracle_image(uv_, opac_, conic_, rgb_, ids, valid, grid, bg)
        return jnp.sum(img * g_img)

    args = [
        uv.astype(jnp.float64), opac.astype(jnp.float64),
        conic.astype(jnp.float64), rgb.astype(jnp.float64),
    ]
    grads = jax.grad(loss, argnums=tuple(range(4)))(*args)
    loss_j = jax.jit(loss)
    rng = np.random.default_rng(0)
    eps = 1e-5
    for ai in range(4):
        g = np.asarray(grads[ai])
        flat = np.asarray(args[ai]).ravel()
        # probe a sample of coordinates (full FD would be slow)
        idxs = rng.choice(flat.size, size=min(12, flat.size), replace=False)
        for i in idxs:
            hi, lo = flat.copy(), flat.copy()
            hi[i] += eps
            lo[i] -= eps
            a_hi = [*args]
            a_lo = [*args]
            a_hi[ai] = jnp.asarray(hi.reshape(np.asarray(args[ai]).shape))
            a_lo[ai] = jnp.asarray(lo.reshape(np.asarray(args[ai]).shape))
            fd = (float(loss_j(*a_hi)) - float(loss_j(*a_lo))) / (2 * eps)
            ad = g.ravel()[i]
            assert abs(fd - ad) <= 1e-4 + 1e-4 * abs(fd), (
                f"arg {ai} coord {i}: fd={fd} ad={ad}"
            )


@pytest.mark.parametrize("with_bg", [False, True])
def test_pallas_forward_matches_oracle(with_bg):
    scene, grid, layout, uv, conic, opac, rgb = _pipeline_inputs()
    ids, valid = _dense_lists(layout, grid)
    bg = (
        jnp.array([0.3, 0.1, 0.6], jnp.float32)
        if with_bg
        else jnp.zeros(3, jnp.float32)
    )
    img_o, t_o = _oracle_image(uv, opac, conic, rgb, ids, valid, grid, bg)

    meta = build_step_meta(layout, grid.tile_count, CHUNK)
    feat_g = jnp.pad(splat_features(uv, opac, conic, rgb), ((0, 0), (0, 1)))
    feat = pad_feature_rows(feat_g[:, layout.gaussian_idx])
    img_p, t_p = render_tiles(
        feat, meta, bg, layout.tile_has_output,
        n_tiles=grid.tile_count, x_tiles=grid.x_tiles, chunk=CHUNK,
    )
    np.testing.assert_allclose(
        np.asarray(img_p), np.asarray(img_o), atol=2e-6
    )
    np.testing.assert_allclose(np.asarray(t_p), np.asarray(t_o), atol=2e-6)


@pytest.mark.parametrize("with_bg", [False, True])
def test_pallas_grads_match_oracle(with_bg):
    scene, grid, layout, uv, conic, opac, rgb = _pipeline_inputs()
    ids, valid = _dense_lists(layout, grid)
    bg = (
        jnp.array([0.3, 0.1, 0.6], jnp.float32)
        if with_bg
        else jnp.zeros(3, jnp.float32)
    )
    meta = build_step_meta(layout, grid.tile_count, CHUNK)

    # a fixed random upstream gradient on the image AND the transmittance
    key = jax.random.PRNGKey(0)
    g_img = jax.random.normal(key, (grid.tile_count, 256, 3), jnp.float32)
    g_t = jax.random.normal(
        jax.random.PRNGKey(1), (grid.tile_count, 256), jnp.float32
    )

    def loss_pallas(uv_, opac_, conic_, rgb_, bg_):
        feat_g = jnp.pad(
            splat_features(uv_, opac_, conic_, rgb_), ((0, 0), (0, 1))
        )
        feat = pad_feature_rows(feat_g[:, layout.gaussian_idx])
        img, T = render_tiles(
            feat, meta, bg_, layout.tile_has_output,
            n_tiles=grid.tile_count, x_tiles=grid.x_tiles, chunk=CHUNK,
        )
        return jnp.sum(img * g_img) + jnp.sum(T * g_t)

    def loss_oracle(uv_, opac_, conic_, rgb_, bg_):
        img, T = _oracle_image(uv_, opac_, conic_, rgb_, ids, valid, grid, bg_)
        return jnp.sum(img * g_img) + jnp.sum(T * g_t)

    args = (uv, opac, conic, rgb, bg)
    gp = jax.grad(loss_pallas, argnums=(0, 1, 2, 3, 4))(*args)
    go = jax.grad(loss_oracle, argnums=(0, 1, 2, 3, 4))(*args)
    names = ["uv", "opacity", "conic", "rgb", "background"]
    for name, p, o in zip(names, gp, go):
        p, o = np.asarray(p), np.asarray(o)
        scale = max(1.0, np.abs(o).max())
        # 2e-4: the kernel reduces per-splat gradients through the pixel
        # moment basis (ops/render._bwd_kernel), whose f32 central-moment
        # expansion reassociates the pixel sums; the formulas are exact
        # (verified to 1e-15 in f64), leaving ~1e-4 relative rounding drift
        # vs the oracle's per-pixel association order.
        np.testing.assert_allclose(
            p / scale, o / scale, atol=2e-4,
            err_msg=f"grad mismatch for {name}",
        )


def test_fused_dc_vjp_matches_composed_pipeline():
    """rasterize's fused DC custom_vjp (_render_dc: layout + expansion +
    render in ONE vjp, backward kernel emitting packed bf16-pair sort
    operands) must reproduce the composed layout_with_features +
    render_tiles pipeline BITWISE in forward and backward under
    kernel_precision="bf16" (the in-kernel pack applies the same one bf16
    rounding the XLA-side pack did)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gaussian_splatting_tpu import geometry as geo
    from gaussian_splatting_tpu import rasterize as RZ
    from gaussian_splatting_tpu.culling import (
        frustum_visible_rows,
        layout_with_features,
    )
    from gaussian_splatting_tpu.ops import common as cc
    from gaussian_splatting_tpu.ops.render import (
        build_step_meta,
        pad_feature_rows,
        render_tiles,
        splat_feature_rows,
    )
    from gaussian_splatting_tpu.structs import TileGrid
    from tests import fixtures as fx

    scene = fx.test_scene(opacity_presigmoid=True)
    cam = fx.test_camera()
    pose = fx.test_camera_T_world()
    grid = TileGrid(cam.height, cam.width)
    params = scene.params()
    xyzT = params["xyz"].T
    xc, yc, zc = geo.transform_rows(xyzT[0], xyzT[1], xyzT[2], pose)
    u, v = geo.project_rows(xc, yc, zc, cam.K)
    visible = frustum_visible_rows(
        u, v, zc, (cam.width, cam.height), 0.3, 100.0, 10.0
    ) & scene.alive
    sig6 = geo.sigma_world_rows(params["quaternion"], params["scale"])
    conic3 = geo.conic_rows(sig6, xc, yc, zc, cam.K, pose)
    op_v = jax.nn.sigmoid(params["opacity"][:, 0])
    rgbT = params["rgb"].T
    feat_g = splat_feature_rows(
        u, v, op_v, *conic3,
        rgbT[0] * geo.SH_0, rgbT[1] * geo.SH_0, rgbT[2] * geo.SH_0,
    )
    bg = jnp.zeros(3, jnp.float32)
    scap = 1 << 14
    rng = np.random.default_rng(0)
    cot = jnp.asarray(
        rng.normal(size=(grid.tile_count * 256 * 3,)).astype(np.float32)
    )

    def loss_old(fg):
        layout, feat = layout_with_features(
            (u, v), conic3, zc, visible, fg, grid, 3.0, scap, 256, 0,
            None, "bf16",
        )
        meta = build_step_meta(layout, grid.tile_count, 256)
        feat = pad_feature_rows(feat)
        img_tiles, _ = render_tiles(
            feat, meta, bg, layout.tile_has_output,
            n_tiles=grid.tile_count, x_tiles=grid.x_tiles, chunk=256,
            interpret=True, precision="bf16",
        )
        return jnp.sum(img_tiles.reshape(-1) * cot)

    def loss_new(fg):
        out, _layout = RZ._render_dc(
            fg, bg, (u, v), conic3, zc, visible, grid, 3.0, scap, 256,
            0, None, "bf16", True,
        )
        img_rows = out[0:3, :].reshape(
            3, grid.tile_count, cc.PIXELS_PER_TILE
        )
        return jnp.sum(jnp.moveaxis(img_rows, 0, -1).reshape(-1) * cot)

    np.testing.assert_array_equal(
        float(loss_old(feat_g)), float(loss_new(feat_g))
    )
    go = np.asarray(jax.grad(loss_old)(feat_g))
    gn = np.asarray(jax.grad(loss_new)(feat_g))
    np.testing.assert_array_equal(go, gn)
