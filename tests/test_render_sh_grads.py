"""Gradient correctness for the per-pixel-SH Pallas rasterizer.

The reference gradchecks RenderImage at N_SH 4/9/16 with and without a
background (test/test_rasterize_autograd.py:200-341).  Here the hand-written
SH backward kernel (ops/render_sh.py:_bwd_kernel) is compared against the
autodiff gradients of a pure-jnp SH compositing oracle
(ops/reference_impl.py:composite_dense_sh), whose family was itself
validated against fp64 finite differences in test_render_grads.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussian_splatting_tpu import geometry as geo
from gaussian_splatting_tpu.culling import build_splat_layout, frustum_visible
from gaussian_splatting_tpu.ops import common as cc
from gaussian_splatting_tpu.ops import reference_impl as oracle
from gaussian_splatting_tpu.ops import render_sh as rsh
from gaussian_splatting_tpu.ops.render import build_step_meta, pad_feature_rows
from gaussian_splatting_tpu.structs import Camera, TileGrid
from tests import fixtures as fx
from tests.test_render_grads import _dense_lists, _small_camera

CAP = 1 << 18
CHUNK = 256


def _sh_inputs(n_sh):
    """Fixture geometry plus deterministic random SH coefficients."""
    scene = fx.test_scene(opacity_presigmoid=True)
    cam = _small_camera()
    pose = fx.test_camera_T_world()
    xyz_cam = geo.transform_points(scene.xyz, pose)
    uv = geo.project_points(xyz_cam, cam.K)
    visible = frustum_visible(
        xyz_cam, uv, (cam.width, cam.height), 0.3, 100.0, 10.0
    )
    sigma = geo.compute_sigma_world(scene.quaternion, scene.scale)
    J = geo.compute_projection_jacobian(xyz_cam, cam.K)
    conic = geo.compute_conic(sigma, J, pose)
    grid = TileGrid(cam.height, cam.width)
    layout = build_splat_layout(
        uv, conic, xyz_cam[:, 2], visible, grid,
        mh_dist=3.0, splat_capacity=CAP, chunk=CHUNK,
    )
    opac = jax.nn.sigmoid(scene.opacity)
    rng = np.random.default_rng(3)
    coeffs = jnp.asarray(
        rng.normal(size=(scene.capacity, 3, n_sh)) * 0.4, jnp.float32
    )
    # DC coefficients from the fixture colours so the image is non-trivial
    coeffs = coeffs.at[:, :, 0].set(scene.rgb)

    basis_k = rsh.build_pixel_basis(
        cam.K, cam.width, cam.height, pose, n_sh, grid
    )
    rays = geo.compute_rays_in_world_frame(
        cam.K, grid.image_width_padded, grid.image_height_padded, pose
    )
    basis_tiles = oracle.image_to_tiles(
        geo.sh_basis(rays, n_sh), grid
    )  # (n_tiles, 256, n_sh)
    return grid, layout, uv, conic, opac, coeffs, basis_k, basis_tiles


def _oracle_sh_image(uv, opac, conic, coeffs, ids, valid, basis_tiles,
                     grid, bg):
    feat = rsh.sh_splat_features(uv, opac, conic, coeffs).T  # (N, 6+3k)
    f = feat[ids]  # (n_tiles, L, 6+3k)
    img, T = oracle.composite_dense_sh(f, valid, basis_tiles, grid.x_tiles)
    img = oracle.apply_background(img, T, bg)
    return img, T


@pytest.mark.parametrize("n_sh", [4, 9, 16])
@pytest.mark.parametrize("with_bg", [False, True])
def test_sh_forward_and_grads_match_oracle(n_sh, with_bg):
    (grid, layout, uv, conic, opac, coeffs, basis_k,
     basis_tiles) = _sh_inputs(n_sh)
    ids, valid = _dense_lists(layout, grid)
    bg = (
        jnp.array([0.3, 0.1, 0.6], jnp.float32)
        if with_bg
        else jnp.zeros(3, jnp.float32)
    )
    meta = build_step_meta(layout, grid.tile_count, CHUNK)
    feat_rows = rsh._pad8(rsh.sh_feat_rows(n_sh))

    g_img = jax.random.normal(
        jax.random.PRNGKey(0), (grid.tile_count, 256, 3), jnp.float32
    )
    g_t = jax.random.normal(
        jax.random.PRNGKey(1), (grid.tile_count, 256), jnp.float32
    )

    def render_pallas(uv_, opac_, conic_, coeffs_, bg_):
        feat_g = jnp.pad(
            rsh.sh_splat_features(uv_, opac_, conic_, coeffs_),
            ((0, 0), (0, 1)),
        )
        feat = pad_feature_rows(feat_g[:, layout.gaussian_idx], feat_rows)
        return rsh.render_tiles_sh(
            feat, basis_k, meta, bg_, layout.tile_has_output,
            n_sh=n_sh, n_tiles=grid.tile_count, x_tiles=grid.x_tiles,
            chunk=CHUNK,
        )

    args = (uv, opac, conic, coeffs, bg)

    # forward parity
    img_p, t_p = render_pallas(*args)
    img_o, t_o = _oracle_sh_image(
        uv, opac, conic, coeffs, ids, valid, basis_tiles, grid, bg
    )
    np.testing.assert_allclose(
        np.asarray(img_p), np.asarray(img_o), atol=3e-6
    )
    np.testing.assert_allclose(np.asarray(t_p), np.asarray(t_o), atol=2e-6)

    # gradient parity on every differentiable input
    def loss_pallas(uv_, opac_, conic_, coeffs_, bg_):
        img, T = render_pallas(uv_, opac_, conic_, coeffs_, bg_)
        return jnp.sum(img * g_img) + jnp.sum(T * g_t)

    def loss_oracle(uv_, opac_, conic_, coeffs_, bg_):
        img, T = _oracle_sh_image(
            uv_, opac_, conic_, coeffs_, ids, valid, basis_tiles, grid, bg_
        )
        return jnp.sum(img * g_img) + jnp.sum(T * g_t)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2, 3, 4))(*args)
    go = jax.grad(loss_oracle, argnums=(0, 1, 2, 3, 4))(*args)
    names = ["uv", "opacity", "conic", "sh_coeffs", "background"]
    for name, p, o in zip(names, gp, go):
        p, o = np.asarray(p), np.asarray(o)
        scale = max(1.0, np.abs(o).max())
        # 2e-4: pixel-moment-basis reduction reassociates the pixel sums
        # (formulas exact in f64; see tests/test_render_grads.py note)
        np.testing.assert_allclose(
            p / scale, o / scale, atol=2e-4,
            err_msg=f"n_sh={n_sh} bg={with_bg}: grad mismatch for {name}",
        )
