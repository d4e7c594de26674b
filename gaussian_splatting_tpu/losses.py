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


@functools.lru_cache
def _band_matrix(n: int, size: int, sigma: float):
    """(n, n) banded matrix B with B[i, j] = g[j - i + r] and reflect-pad
    folding, so that (B @ x) equals a 1-D gaussian filter along axis 0 with
    'reflect' padding.  Cached as numpy."""
    x = np.arange(size) - (size - 1) / 2.0
    g = np.exp(-(x**2) / (2 * sigma**2))
    g /= g.sum()
    r = (size - 1) // 2
    B = np.zeros((n, n), np.float32)
    for t in range(-r, r + 1):
        j = np.arange(n) + t
        # reflect indexing (numpy 'reflect' == symmetric-without-edge-repeat)
        j = np.abs(j)
        j = np.where(j >= n, 2 * (n - 1) - j, j)
        np.add.at(B, (np.arange(n), j), g[t + r])
    return B


def _filter2d(img: jax.Array, size: int = 11, sigma: float = 1.5) -> jax.Array:
    """Separable gaussian filter with reflect padding as two dense banded
    matmuls (rows, then columns) so the work runs on the MXU instead of a
    slow depthwise-conv lowering.  img: (H, W, C).

    Precision NOTE: these matmuls MUST be f32-exact.  The TPU default
    (bf16 MXU inputs) puts ~1e-2 noise on each filter output; the variance
    estimates E[x^2] - mu^2 then go negative past SSIM's c2 = 9e-4
    stabiliser, the denominator crosses zero, and the loss explodes to
    -inf on perfectly clean images (observed after ~500 training steps).
    The matmuls are ~1 GFLOP — exactness costs well under a millisecond.
    """
    h, w = img.shape[0], img.shape[1]
    bh = jnp.asarray(_band_matrix(h, size, sigma), img.dtype)
    bw = jnp.asarray(_band_matrix(w, size, sigma), img.dtype)
    hp = jax.lax.Precision.HIGHEST
    y = jnp.einsum("hk,kwc->hwc", bh, img, precision=hp)
    return jnp.einsum("wk,hkc->hwc", bw, y, precision=hp)


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
