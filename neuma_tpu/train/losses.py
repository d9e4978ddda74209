"""Image losses and metrics.

Matches the reference's ``modules/d3gs/utils/loss_utils.py`` (l1/l2/
smooth-l1 and windowed SSIM with an 11-tap sigma-1.5 gaussian window)
and ``image_utils.py`` (mse/psnr).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def l1_loss(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(pred - gt))


def l2_loss(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((pred - gt) ** 2)


def smooth_l1_loss(
    pred: jnp.ndarray, gt: jnp.ndarray, beta: float = 1.0
) -> jnp.ndarray:
    diff = jnp.abs(pred - gt)
    return jnp.mean(
        jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)
    )


def mse(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((a - b) ** 2, axis=(-3, -2, -1))


def psnr(a: jnp.ndarray, b: jnp.ndarray, data_range: float = 1.0) -> jnp.ndarray:
    m = mse(a, b)
    return 20.0 * jnp.log10(data_range / jnp.sqrt(m))


def _gaussian_window(window_size: int, sigma: float) -> jnp.ndarray:
    xs = jnp.arange(window_size, dtype=jnp.float32)
    g = jnp.exp(-((xs - window_size // 2) ** 2) / (2.0 * sigma ** 2))
    return g / jnp.sum(g)


def ssim(
    img1: jnp.ndarray,
    img2: jnp.ndarray,
    window_size: int = 11,
    sigma: float = 1.5,
) -> jnp.ndarray:
    """Windowed SSIM over (C, H, W) images (reference loss_utils.py:26-66:
    separable 11-tap gaussian window, per-channel conv with same padding,
    C1=0.01^2, C2=0.03^2)."""
    if img1.ndim == 3:
        img1 = img1[None]
        img2 = img2[None]
    g = _gaussian_window(window_size, sigma)
    window = jnp.outer(g, g)[None, None]  # (1, 1, W, W)
    c = img1.shape[1]
    kernel = jnp.tile(window, (c, 1, 1, 1))  # depthwise

    def conv(x):
        return jax.lax.conv_general_dilated(
            x,
            kernel,
            window_strides=(1, 1),
            padding="SAME",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            feature_group_count=c,
        )

    mu1 = conv(img1)
    mu2 = conv(img2)
    mu1_sq = mu1 * mu1
    mu2_sq = mu2 * mu2
    mu1_mu2 = mu1 * mu2
    sigma1_sq = conv(img1 * img1) - mu1_sq
    sigma2_sq = conv(img2 * img2) - mu2_sq
    sigma12 = conv(img1 * img2) - mu1_mu2

    C1 = 0.01 ** 2
    C2 = 0.03 ** 2
    ssim_map = ((2 * mu1_mu2 + C1) * (2 * sigma12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (sigma1_sq + sigma2_sq + C2)
    )
    return jnp.mean(ssim_map)
