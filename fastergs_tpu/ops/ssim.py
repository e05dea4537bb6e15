"""Fused DSSIM loss.

Equivalent of the host framework's `fused_dssim` (Taming-3DGS fused SSIM)
consumed by the reference loss (reference: Loss.py:8,16): standard SSIM with
an 11x11 Gaussian window (sigma 1.5), C1=0.01^2, C2=0.03^2, computed on CHW
images with same-size zero padding, returned as (1 - mean SSIM) / 2.

On TPU the "fusion" is XLA's job: the separable convolutions and elementwise
SSIM map fuse into a handful of kernels; no custom op needed.
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp
from jax import lax

_WINDOW_SIZE = 11
_SIGMA = 1.5
_C1 = 0.01 ** 2
_C2 = 0.03 ** 2


@functools.lru_cache()
def _gaussian_window() -> np.ndarray:
    xs = np.arange(_WINDOW_SIZE) - _WINDOW_SIZE // 2
    g = np.exp(-(xs ** 2) / (2.0 * _SIGMA ** 2))
    return (g / g.sum()).astype(np.float32)


def _blur(x: jnp.ndarray) -> jnp.ndarray:
    """Separable 11x11 Gaussian blur of (C, H, W) with zero 'same' padding."""
    c = x.shape[0]
    w = jnp.asarray(_gaussian_window())
    kh = jnp.tile(w.reshape(1, 1, _WINDOW_SIZE, 1), (c, 1, 1, 1))
    kw = jnp.tile(w.reshape(1, 1, 1, _WINDOW_SIZE), (c, 1, 1, 1))
    pad = _WINDOW_SIZE // 2
    y = x[None]  # NCHW
    dn = lax.conv_dimension_numbers(y.shape, kh.shape, ('NCHW', 'OIHW', 'NCHW'))
    y = lax.conv_general_dilated(y, kh, (1, 1), [(pad, pad), (0, 0)],
                                 dimension_numbers=dn, feature_group_count=c)
    y = lax.conv_general_dilated(y, kw, (1, 1), [(0, 0), (pad, pad)],
                                 dimension_numbers=dn, feature_group_count=c)
    return y[0]


def ssim(input: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Mean SSIM of two (C, H, W) images in [0, 1]."""
    mu_x = _blur(input)
    mu_y = _blur(target)
    mu_xx = _blur(input * input)
    mu_yy = _blur(target * target)
    mu_xy = _blur(input * target)
    var_x = mu_xx - mu_x * mu_x
    var_y = mu_yy - mu_y * mu_y
    cov = mu_xy - mu_x * mu_y
    num = (2.0 * mu_x * mu_y + _C1) * (2.0 * cov + _C2)
    den = (mu_x * mu_x + mu_y * mu_y + _C1) * (var_x + var_y + _C2)
    return jnp.mean(num / den)


def fused_dssim(input: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """(1 - SSIM) / 2 on CHW images (reference: Loss.py:16)."""
    return (1.0 - ssim(input, target)) * 0.5


def psnr(preds: jnp.ndarray, target: jnp.ndarray, data_range: float = 1.0) -> jnp.ndarray:
    """Peak signal-to-noise ratio (torchmetrics semantics, reference Loss.py:19,27)."""
    mse = jnp.mean((preds - target) ** 2)
    return 10.0 * jnp.log10(data_range ** 2 / jnp.maximum(mse, 1e-12))
