"""Pure-jnp compositing oracle with the exact reference semantics.

This is the executable specification of the rasterizer: a literal,
sequential-scan re-statement of render_tiles_kernel
(reference: src/render.cu:105-181) that

- runs in float64 (for finite-difference gradient checks),
- is differentiable by plain JAX autodiff (the Pallas kernels'
  custom_vjp is tested against its gradients),
- is used as the numerical baseline for the golden-pixel tests.

It is O(n_tiles * max_splats_per_tile * 256) dense and intended for tests
and small scenes only.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gaussian_splatting_tpu.ops import common as cc
from gaussian_splatting_tpu.structs import TILE_PX


def composite_dense(
    feat: jax.Array,  # (n_tiles, L, 9) per-slot features (rows per common.py)
    valid: jax.Array,  # (n_tiles, L) bool
    x_tiles: int,
) -> tuple[jax.Array, jax.Array]:
    """Front-to-back alpha compositing over dense per-tile splat lists.

    Returns (premultiplied image (n_tiles, 256, 3), final transmittance
    (n_tiles, 256)).  Background is NOT applied here (see `apply_background`).
    """
    n_tiles, L, _ = feat.shape
    dtype = feat.dtype

    tiles = jnp.arange(n_tiles, dtype=jnp.int32)
    tx = (tiles % x_tiles).astype(dtype)
    ty = (tiles // x_tiles).astype(dtype)
    p = jnp.arange(cc.PIXELS_PER_TILE, dtype=jnp.int32)
    upix = tx[:, None] * TILE_PX + (p % TILE_PX)[None, :].astype(dtype)
    vpix = ty[:, None] * TILE_PX + (p // TILE_PX)[None, :].astype(dtype)

    def step(carry, xs):
        T, img = carry
        f, ok = xs  # (n_tiles, 9), (n_tiles,)
        u = f[:, cc.FEAT_U, None]
        v = f[:, cc.FEAT_V, None]
        op = f[:, cc.FEAT_OPACITY, None]
        a = f[:, cc.FEAT_A, None]
        b = f[:, cc.FEAT_B, None]
        c = f[:, cc.FEAT_C, None]
        rgb = f[:, cc.FEAT_R : cc.FEAT_B_COL + 1]  # (n_tiles, 3)

        du = upix - u
        dv = vpix - v
        det = a * c - b * b
        mh = (c * du * du - 2.0 * b * du * dv + a * dv * dv) / det
        prob = jnp.where(mh > 0.0, jnp.exp(-0.5 * mh), 0.0)
        alpha = op * prob
        at = jnp.where(alpha >= cc.ALPHA_SKIP, alpha, 0.0) * ok[:, None]
        active = T >= cc.T_EPS
        w = jnp.where(active, at * T, 0.0)
        img = img + w[..., None] * rgb[:, None, :]
        T = jnp.where(active, T * (1.0 - at), T)
        return (T, img), None

    T0 = jnp.ones((n_tiles, cc.PIXELS_PER_TILE), dtype)
    img0 = jnp.zeros((n_tiles, cc.PIXELS_PER_TILE, 3), dtype)
    (T, img), _ = jax.lax.scan(
        step,
        (T0, img0),
        (jnp.moveaxis(feat, 1, 0), jnp.moveaxis(valid.astype(dtype), 1, 0)),
    )
    return img, T


def composite_dense_sh(
    feat: jax.Array,   # (n_tiles, L, 6 + 3*n_sh): u,v,op,a,b,c, coeffs
    valid: jax.Array,  # (n_tiles, L) bool
    basis: jax.Array,  # (n_tiles, 256, n_sh) per-pixel SH basis values
    x_tiles: int,
) -> tuple[jax.Array, jax.Array]:
    """Per-pixel-SH front-to-back compositing oracle.

    The splat colour at a pixel is the linear basis contraction
    rgb[c] = sum_k basis[pixel, k] * coeff[c, k] — exactly sh_to_rgb
    (reference: src/spherical_harmonics.cuh:76-98) inside the render loop
    (src/render.cu:44-51,153).  Everything else matches `composite_dense`.
    """
    n_tiles, L, w = feat.shape
    n_sh = (w - 6) // 3
    dtype = feat.dtype

    tiles = jnp.arange(n_tiles, dtype=jnp.int32)
    tx = (tiles % x_tiles).astype(dtype)
    ty = (tiles // x_tiles).astype(dtype)
    p = jnp.arange(cc.PIXELS_PER_TILE, dtype=jnp.int32)
    upix = tx[:, None] * TILE_PX + (p % TILE_PX)[None, :].astype(dtype)
    vpix = ty[:, None] * TILE_PX + (p // TILE_PX)[None, :].astype(dtype)

    def step(carry, xs):
        T, img = carry
        f, ok = xs  # (n_tiles, 6+3*n_sh), (n_tiles,)
        u = f[:, cc.FEAT_U, None]
        v = f[:, cc.FEAT_V, None]
        op = f[:, cc.FEAT_OPACITY, None]
        a = f[:, cc.FEAT_A, None]
        b = f[:, cc.FEAT_B, None]
        c = f[:, cc.FEAT_C, None]
        coeff = f[:, 6:].reshape(n_tiles, 3, n_sh)
        # per-pixel colour from the basis contraction
        rgb = jnp.einsum("npk,nck->npc", basis, coeff)  # (n_tiles, 256, 3)

        du = upix - u
        dv = vpix - v
        det = a * c - b * b
        mh = (c * du * du - 2.0 * b * du * dv + a * dv * dv) / det
        prob = jnp.where(mh > 0.0, jnp.exp(-0.5 * mh), 0.0)
        alpha = op * prob
        at = jnp.where(alpha >= cc.ALPHA_SKIP, alpha, 0.0) * ok[:, None]
        active = T >= cc.T_EPS
        w_pix = jnp.where(active, at * T, 0.0)
        img = img + w_pix[..., None] * rgb
        T = jnp.where(active, T * (1.0 - at), T)
        return (T, img), None

    T0 = jnp.ones((n_tiles, cc.PIXELS_PER_TILE), dtype)
    img0 = jnp.zeros((n_tiles, cc.PIXELS_PER_TILE, 3), dtype)
    (T, img), _ = jax.lax.scan(
        step,
        (T0, img0),
        (jnp.moveaxis(feat, 1, 0), jnp.moveaxis(valid.astype(dtype), 1, 0)),
    )
    return img, T


def apply_background(img_premul, T_final, background_rgb):
    """Blend the background for unsaturated pixels
    (reference: src/render.cu:169-175).  Shapes broadcast over pixels."""
    w = jnp.where(T_final > cc.BG_T_EPS, T_final, 0.0)
    return img_premul + w[..., None] * background_rgb


def tiles_to_image(per_tile_pixels, grid):
    """(n_tiles, 256, C) tile-major pixels -> (H, W, C) cropped image."""
    c = per_tile_pixels.shape[-1]
    img = per_tile_pixels.reshape(
        grid.y_tiles, grid.x_tiles, TILE_PX, TILE_PX, c
    )
    img = img.transpose(0, 2, 1, 3, 4).reshape(
        grid.image_height_padded, grid.image_width_padded, c
    )
    return img[: grid.image_height, : grid.image_width]


def image_to_tiles(image, grid):
    """(H, W, C) -> (n_tiles, 256, C), zero-padding to the tile grid."""
    c = image.shape[-1]
    pad_h = grid.image_height_padded - image.shape[0]
    pad_w = grid.image_width_padded - image.shape[1]
    img = jnp.pad(image, ((0, pad_h), (0, pad_w), (0, 0)))
    img = img.reshape(grid.y_tiles, TILE_PX, grid.x_tiles, TILE_PX, c)
    return img.transpose(0, 2, 1, 3, 4).reshape(grid.tile_count, 256, c)
