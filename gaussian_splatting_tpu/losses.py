"""Training losses: L1 + SSIM mix, PSNR metric.

The reference mixes (1-ssim_frac)*L1 + ssim_frac*(1-SSIM) using
torchmetrics' StructuralSimilarityIndexMeasure with its defaults
(gaussian kernel 11, sigma 1.5, k1=0.01, k2=0.03, data_range 1.0;
splat_py/trainer.py:363-374).  SSIM is re-implemented here as a depthwise
gaussian convolution (reflect padding, per-channel, averaged) — ~40 lines
of jnp instead of a torch dependency.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache
def _gaussian_kernel(size: int = 11, sigma: float = 1.5):
    x = np.arange(size) - (size - 1) / 2.0
    g = np.exp(-(x**2) / (2 * sigma**2))
    g /= g.sum()
    return jnp.asarray(np.outer(g, g), jnp.float32)


def _filter2d(img: jax.Array, kernel: jax.Array) -> jax.Array:
    """Depthwise 2-D convolution with reflect padding.  img: (H, W, C)."""
    c = img.shape[-1]
    k = kernel.shape[0]
    pad = (k - 1) // 2
    x = jnp.pad(img, ((pad, pad), (pad, pad), (0, 0)), mode="reflect")
    x = x.transpose(2, 0, 1)[None]  # (1, C, H, W)
    w = jnp.broadcast_to(kernel.astype(img.dtype), (c, 1, k, k))
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding="VALID",
        feature_group_count=c,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return y[0].transpose(1, 2, 0)


def ssim(
    img: jax.Array,
    gt: jax.Array,
    data_range: float = 1.0,
    k1: float = 0.01,
    k2: float = 0.03,
) -> jax.Array:
    """Mean SSIM between two (H, W, C) images (Wang et al. 2004)."""
    kernel = _gaussian_kernel().astype(img.dtype)
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    mu_x = _filter2d(img, kernel)
    mu_y = _filter2d(gt, kernel)
    mu_xx = mu_x * mu_x
    mu_yy = mu_y * mu_y
    mu_xy = mu_x * mu_y
    sigma_x = _filter2d(img * img, kernel) - mu_xx
    sigma_y = _filter2d(gt * gt, kernel) - mu_yy
    sigma_xy = _filter2d(img * gt, kernel) - mu_xy
    num = (2 * mu_xy + c1) * (2 * sigma_xy + c2)
    den = (mu_xx + mu_yy + c1) * (sigma_x + sigma_y + c2)
    return jnp.mean(num / den)


def train_loss(image: jax.Array, gt: jax.Array, ssim_frac: float):
    """(1-f)*L1 + f*(1-SSIM) on the raw (unclipped) rendered image
    (splat_py/trainer.py:363-374).  Returns (loss, psnr)."""
    l1 = jnp.mean(jnp.abs(image - gt))
    s = ssim(image, gt)
    loss = (1.0 - ssim_frac) * l1 + ssim_frac * (1.0 - s)
    mse = jnp.mean((image - gt) ** 2)
    psnr = -10.0 * jnp.log10(mse)
    return loss, psnr


def eval_psnr_ssim(image: jax.Array, gt: jax.Array):
    """Test-split metrics on the clipped image (splat_py/trainer.py:323-330)."""
    img = jnp.clip(image, 0.0, 1.0)
    mse = jnp.mean((img - gt) ** 2)
    psnr = -10.0 * jnp.log10(mse)
    return psnr, ssim(img, gt)
