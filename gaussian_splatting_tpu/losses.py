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
    # cached as numpy (not jnp): a cached device array would leak a tracer
    # constant from one jit trace into the next
    x = np.arange(size) - (size - 1) / 2.0
    g = np.exp(-(x**2) / (2 * sigma**2))
    g /= g.sum()
    return np.outer(g, g).astype(np.float32)


def _filter1d(img: jax.Array, g, axis: int) -> jax.Array:
    """1-D gaussian filter along ``axis`` with reflect padding, as a sum of
    ``size`` statically-shifted slices (weighted adds).  XLA fuses the
    shifted reads into a handful of VPU passes — ~300x fewer FLOPs than
    the round-2 banded matmul (which paid H (resp. W) MACs per output on
    the MXU at HIGHEST precision), with identical f32 accuracy.

    Precision NOTE: the filter outputs feed SSIM's variance estimates
    E[x^2] - mu^2; computing them with bf16 matmuls put ~1e-2 noise on the
    filters, pushed variances below SSIM's c2 = 9e-4 stabiliser, and
    drove the loss to -inf (observed at step ~517 of a synthetic run).
    Shifted f32 adds carry no such noise by construction.
    """
    r = (len(g) - 1) // 2
    pad = [(0, 0)] * img.ndim
    pad[axis] = (r, r)
    p = jnp.pad(img, pad, mode="reflect")
    n = img.shape[axis]
    out = None
    for t, w in enumerate(g):
        sl = jax.lax.slice_in_dim(p, t, t + n, axis=axis)
        out = sl * w if out is None else out + sl * w
    return out


def _filter2d(img: jax.Array, size: int = 11, sigma: float = 1.5) -> jax.Array:
    """Separable gaussian filter with reflect padding.  img: (H, W, C)."""
    x = np.arange(size) - (size - 1) / 2.0
    g = np.exp(-(x**2) / (2 * sigma**2))
    g = (g / g.sum()).astype(np.float32)
    return _filter1d(_filter1d(img, g, 0), g, 1)


def ssim(
    img: jax.Array,
    gt: jax.Array,
    data_range: float = 1.0,
    k1: float = 0.01,
    k2: float = 0.03,
) -> jax.Array:
    """Mean SSIM between two (H, W, C) images (Wang et al. 2004)."""
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    mu_x = _filter2d(img)
    mu_y = _filter2d(gt)
    mu_xx = mu_x * mu_x
    mu_yy = mu_y * mu_y
    mu_xy = mu_x * mu_y
    sigma_x = _filter2d(img * img) - mu_xx
    sigma_y = _filter2d(gt * gt) - mu_yy
    sigma_xy = _filter2d(img * gt) - mu_xy
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
