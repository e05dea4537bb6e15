"""Training loss.

Equivalent of the reference FasterGSLoss + host BaseLoss
(reference: Loss.py:12-28): weighted sum of 0.8*L1 + 0.2*DSSIM plus optional
opacity/scale regularizers, with PSNR tracked as a passive quality metric.
Expressed functionally so the whole thing lives inside the jitted train step.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from fastergs_tpu.ops.ssim import fused_dssim, psnr


class LossWeights(NamedTuple):
    lambda_l1: float = 0.8
    lambda_dssim: float = 0.2
    lambda_opacity_reg: float = 0.0   # 0.01 for MCMC (Trainer.py:54)
    lambda_scale_reg: float = 0.0     # 0.01 for MCMC (Trainer.py:55)


def image_loss(image: jnp.ndarray, target: jnp.ndarray,
               weights: LossWeights) -> tuple[jnp.ndarray, dict]:
    """Image-dependent loss terms; returns (total, per-term metrics)."""
    l1 = jnp.mean(jnp.abs(image - target))
    dssim = fused_dssim(image, target)
    total = weights.lambda_l1 * l1 + weights.lambda_dssim * dssim
    metrics = {
        'L1_Color': l1,
        'DSSIM_Color': dssim,
        'PSNR': psnr(image, target, data_range=1.0),
    }
    return total, metrics


def regularization_loss(opacities_activated: jnp.ndarray,
                        scales_activated: jnp.ndarray,
                        active_mask: jnp.ndarray,
                        n_active: jnp.ndarray,
                        weights: LossWeights) -> tuple[jnp.ndarray, dict]:
    """Mean-over-active regularizers (reference: Model.py:134-140, applied via
    Loss.py:17-18). Padded rows are masked out of the mean."""
    denom = jnp.maximum(n_active.astype(jnp.float32), 1.0)
    op_mean = jnp.sum(jnp.where(active_mask[:, None], opacities_activated, 0.0)) / denom
    sc_mean = jnp.sum(jnp.where(active_mask[:, None], scales_activated, 0.0)) / (denom * 3.0)
    total = (weights.lambda_opacity_reg * op_mean
             + weights.lambda_scale_reg * sc_mean)
    return total, {'OPACITY_REGULARIZATION': op_mean,
                   'SCALE_REGULARIZATION': sc_mean}
