"""Windowed SSIM (reference utils/loss_util.py:34-64: 11x11 Gaussian window,
sigma 1.5, C1=0.01^2, C2=0.03^2). Images are channels-last [..., H, W, C] in
[0, 1]. Differentiable; the conv lowers to MXU-friendly depthwise convs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    g = np.exp(-((np.arange(size) - size // 2) ** 2) / (2 * sigma**2))
    g = g / g.sum()
    return np.outer(g, g)


def _filter2d(img: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Depthwise 2-D filter on [B, H, W, C] with SAME padding."""
    b, h, w, c = img.shape
    k = kernel.shape[0]
    kern = jnp.broadcast_to(kernel[:, :, None, None], (k, k, 1, c))
    return jax.lax.conv_general_dilated(
        img, kern,
        window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


@functools.partial(jax.jit, static_argnames=("size",))
def ssim(img1: jnp.ndarray, img2: jnp.ndarray, size: int = 11, sigma: float = 1.5):
    """Mean SSIM over [B, H, W, C] image pairs (scalar)."""
    window = jnp.asarray(_gaussian_window(size, sigma), img1.dtype)
    mu1 = _filter2d(img1, window)
    mu2 = _filter2d(img2, window)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = _filter2d(img1 * img1, window) - mu1_sq
    s2 = _filter2d(img2 * img2, window) - mu2_sq
    s12 = _filter2d(img1 * img2, window) - mu12
    c1, c2 = 0.01**2, 0.03**2
    m = ((2 * mu12 + c1) * (2 * s12 + c2)) / ((mu1_sq + mu2_sq + c1) * (s1 + s2 + c2))
    return jnp.mean(m)


def psnr(img1: jnp.ndarray, img2: jnp.ndarray, max_val: float = 1.0) -> jnp.ndarray:
    """PSNR in dB (reference utils/script_util.py:97)."""
    mse = jnp.mean((img1 - img2) ** 2)
    return 10.0 * jnp.log10(max_val**2 / jnp.maximum(mse, 1e-12))
