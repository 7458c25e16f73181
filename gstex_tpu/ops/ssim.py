"""SSIM as separable depthwise convolutions (XLA-friendly).

Matches ``pytorch_msssim.SSIM(data_range=1.0, size_average=True, channel=3)``
used for the training loss (reference ``nerfstudio/models/gstex.py:351,1302``):
11×11 Gaussian window (σ=1.5), VALID padding, K1=0.01, K2=0.03.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    x = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    # pytorch_msssim uses exp(-(x - size//2)^2 / (2σ²)) normalized; for odd
    # sizes the centering is identical
    g = np.exp(-(x ** 2) / (2.0 * sigma ** 2))
    return (g / g.sum()).astype(np.float32)


def _blur(x: jax.Array, win: jax.Array) -> jax.Array:
    """Separable valid-padding Gaussian blur. x: (H, W, C)."""
    c = x.shape[-1]
    k = win.shape[0]
    lhs = x.transpose(2, 0, 1)[None]                     # (1, C, H, W)
    kern_h = jnp.tile(win.reshape(1, 1, k, 1), (c, 1, 1, 1))
    kern_w = jnp.tile(win.reshape(1, 1, 1, k), (c, 1, 1, 1))
    dn = jax.lax.conv_dimension_numbers(lhs.shape, kern_h.shape,
                                        ("NCHW", "OIHW", "NCHW"))
    y = jax.lax.conv_general_dilated(lhs, kern_h, (1, 1), "VALID",
                                     dimension_numbers=dn,
                                     feature_group_count=c,
                                     precision=jax.lax.Precision.HIGHEST)
    y = jax.lax.conv_general_dilated(y, kern_w, (1, 1), "VALID",
                                     dimension_numbers=dn,
                                     feature_group_count=c,
                                     precision=jax.lax.Precision.HIGHEST)
    return y[0].transpose(1, 2, 0)


def ssim_map(img1: jax.Array, img2: jax.Array, data_range: float = 1.0,
             win_size: int = 11, sigma: float = 1.5) -> jax.Array:
    """Per-window SSIM values, (H-w+1, W-w+1, C). Valid padding means the
    map is local: computing it on an overlapping band slice yields exactly
    the corresponding rows of the full-image map (the basis of the
    halo-exchange sharded loss, ``parallel/shard.py``)."""
    k1, k2 = 0.01, 0.03
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    win = jnp.asarray(_gaussian_window(win_size, sigma))

    mu1 = _blur(img1, win)
    mu2 = _blur(img2, win)
    mu1_sq = mu1 * mu1
    mu2_sq = mu2 * mu2
    mu12 = mu1 * mu2
    sigma1_sq = _blur(img1 * img1, win) - mu1_sq
    sigma2_sq = _blur(img2 * img2, win) - mu2_sq
    sigma12 = _blur(img1 * img2, win) - mu12

    cs = (2.0 * sigma12 + c2) / (sigma1_sq + sigma2_sq + c2)
    return ((2.0 * mu12 + c1) / (mu1_sq + mu2_sq + c1)) * cs


def ssim(img1: jax.Array, img2: jax.Array, data_range: float = 1.0,
         win_size: int = 11, sigma: float = 1.5) -> jax.Array:
    """Mean SSIM over an (H, W, C) image pair. Differentiable."""
    return jnp.mean(ssim_map(img1, img2, data_range, win_size, sigma))


def psnr(img1: jax.Array, img2: jax.Array, data_range: float = 1.0) -> jax.Array:
    mse = jnp.mean((img1 - img2) ** 2)
    return 10.0 * jnp.log10(data_range ** 2 / jnp.maximum(mse, 1e-12))
