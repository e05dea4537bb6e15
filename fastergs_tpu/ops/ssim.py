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

# HIGH = 3-pass bf16 decomposition (~f32 accuracy, half of HIGHEST's MXU
# passes). The loss stage is dominated by these dense blur matmuls; the
# SSIM variance cancellation (mu_xx - mu_x^2 against C2 = 9e-4) tolerates
# HIGH's ~1e-7 relative error with orders of magnitude to spare (verified
# on-chip: tools/bench_loss_prec.py).
_BLUR_PRECISION = lax.Precision.HIGH


@functools.lru_cache()
def _gaussian_window() -> np.ndarray:
    xs = np.arange(_WINDOW_SIZE) - _WINDOW_SIZE // 2
    g = np.exp(-(xs ** 2) / (2.0 * _SIGMA ** 2))
    return (g / g.sum()).astype(np.float32)


@functools.lru_cache()
def _banded_blur_matrix(n: int) -> np.ndarray:
    """(n, n) banded matrix applying the 11-tap window with zero padding."""
    w = _gaussian_window()
    m = np.zeros((n, n), np.float32)
    half = _WINDOW_SIZE // 2
    for t in range(_WINDOW_SIZE):
        off = t - half
        d = np.diag(np.full(n - abs(off), w[t], np.float32), off)
        m += d
    return m


def _blur(x: jnp.ndarray, precision=None) -> jnp.ndarray:
    """Separable 11x11 Gaussian blur of (C, H, W) with zero 'same' padding.

    Runs as two banded-matrix matmuls instead of depthwise convolutions:
    an 11-tap depthwise conv maps to the TPU's vector unit, while a dense
    (H, H)/(W, W) banded matmul rides the MXU at ~100x the FLOP rate —
    the net is far faster despite doing n/11 times more multiplies.
    """
    precision = _BLUR_PRECISION if precision is None else precision
    c, h, w_ = x.shape
    mh = jnp.asarray(_banded_blur_matrix(h))      # (H, H): out_h <- in_h
    mw = jnp.asarray(_banded_blur_matrix(w_))     # (W, W): out_w <- in_w
    # W axis: contract last dim with mw^T (symmetric band, mw == mw^T)
    y = lax.dot_general(x, mw, (((2,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=precision)            # (C, H, W)
    # H axis: contract dim 1
    y = lax.dot_general(y, mh, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=precision)            # (C, W, H)
    return jnp.swapaxes(y, 1, 2)


def ssim(input: jnp.ndarray, target: jnp.ndarray,
         precision=None) -> jnp.ndarray:
    """Mean SSIM of two (C, H, W) images in [0, 1].

    `precision` overrides the blur matmul precision (tools/bench_loss_prec.py
    gates the production default against HIGHEST through this hook).
    """
    mu_x = _blur(input, precision)
    mu_y = _blur(target, precision)
    mu_xx = _blur(input * input, precision)
    mu_yy = _blur(target * target, precision)
    mu_xy = _blur(input * target, precision)
    var_x = mu_xx - mu_x * mu_x
    var_y = mu_yy - mu_y * mu_y
    cov = mu_xy - mu_x * mu_y
    num = (2.0 * mu_x * mu_y + _C1) * (2.0 * cov + _C2)
    den = (mu_x * mu_x + mu_y * mu_y + _C1) * (var_x + var_y + _C2)
    return jnp.mean(num / den)


def fused_dssim(input: jnp.ndarray, target: jnp.ndarray,
                precision=None) -> jnp.ndarray:
    """(1 - SSIM) / 2 on CHW images (reference: Loss.py:16)."""
    return (1.0 - ssim(input, target, precision)) * 0.5


def psnr(preds: jnp.ndarray, target: jnp.ndarray, data_range: float = 1.0) -> jnp.ndarray:
    """Peak signal-to-noise ratio (torchmetrics semantics, reference Loss.py:19,27)."""
    mse = jnp.mean((preds - target) ** 2)
    return 10.0 * jnp.log10(data_range ** 2 / jnp.maximum(mse, 1e-12))
