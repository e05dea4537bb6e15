"""MCMC densification primitives: relocation adjustment and noise injection.

TPU-native equivalent of the reference's densification backend
(reference: densification/include/kernels_mcmc.cuh, torch_bindings/
densification.py). The `__constant__`-memory binomial coefficient table
(kernels_mcmc.cuh:10-26) becomes a precomputed NumPy constant baked into the
graph; the per-primitive kernels become vectorized jnp expressions.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from fastergs_tpu.ops.math import covariance_from_scale_rotation, sigmoid

MCMC_MAX_N_SAMPLES = 50  # reference: densification_config.h (N <= 50)


@functools.lru_cache()
def _relocation_coefficient_cumsum() -> np.ndarray:
    """Row-cumulative binomial coefficient table.

    Reference precomputes coeff[n, k] = binom(n, k) * (-1)^k / sqrt(k+1)
    (kernels_mcmc.cuh:12-26) and sums over i in [0, n_samples) and k in
    [0, i]. Pre-summing over i here turns the kernel's double loop into one
    row gather + one dot product: S[n-1, k] = sum_{i=0..n-1} coeff[i, k].
    """
    m = MCMC_MAX_N_SAMPLES
    coeff = np.zeros((m, m), dtype=np.float64)
    for n in range(m):
        binom = 1.0
        sign = 1.0
        for k in range(n + 1):
            coeff[n, k] = binom * sign / np.sqrt(k + 1.0)
            binom *= (n - k) / (k + 1.0)
            sign = -sign
    return np.cumsum(coeff, axis=0).astype(np.float32)


def relocation_adjustment(
    old_opacities: jnp.ndarray,  # (M,) activated opacities
    old_scales: jnp.ndarray,     # (M, 3) linear-space scales
    n_samples: jnp.ndarray,      # (M,) int — times each Gaussian was sampled (+1)
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Eq. (9) of 3DGS-MCMC (reference: kernels_mcmc.cuh:28-57).

    new_opacity = 1 - (1 - old)^(1/N); new_scale scaled so the densified
    mixture preserves the original density.
    """
    n = jnp.clip(n_samples.astype(jnp.int32), 1, MCMC_MAX_N_SAMPLES)
    new_op = 1.0 - jnp.power(1.0 - old_opacities, 1.0 / n.astype(jnp.float32))

    table = jnp.asarray(_relocation_coefficient_cumsum())  # (50, 50)
    rows = table[n - 1]                                    # (M, 50)
    k = jnp.arange(MCMC_MAX_N_SAMPLES, dtype=jnp.float32)
    powers = jnp.power(new_op[:, None], k[None, :] + 1.0)  # new_op^(k+1)
    denominator = jnp.sum(rows * powers, axis=-1)
    # the alternating binomial series cancels catastrophically in f32 for
    # high opacity and large N (the reference kernel shares this hazard,
    # kernels_mcmc.cuh:47-54 — its CUDA f32 sum can go <= 0 just the same);
    # guard so a bad row degrades to an unscaled copy instead of inf/NaN
    # scales that would poison Adam
    safe = denominator > 1e-12
    scaling = jnp.where(safe, old_opacities / jnp.where(safe, denominator, 1.0),
                        1.0)
    # Eq. 9 mass-preservation implies the factor is <= 1 for N >= 1 copies;
    # values above 1 only arise from the cancellation failure above
    scaling = jnp.clip(scaling, 1e-6, 1.0)
    new_scales = scaling[:, None] * old_scales
    return new_op, new_scales


def add_noise(
    means: jnp.ndarray,          # (N, 3)
    raw_scales: jnp.ndarray,     # (N, 3) log-space (3D-filter folded upstream)
    raw_rotations: jnp.ndarray,  # (N, 4)
    raw_opacities: jnp.ndarray,  # (N,) logit-space
    noise: jnp.ndarray,          # (N, 3) standard normal samples
    current_lr: jnp.ndarray,     # scalar: 5e5 * lr_means (reference Model.py:471)
    active_mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Covariance-shaped exploration noise on the means
    (reference: kernels_mcmc.cuh:69-127).

    The opacity gate reproduces the reference expression literally:
    1 / (1 + exp(100*opacity - 0.5)) — note the reference computes
    exp(100*op - 0.5), not exp(100*(op - 0.5)) (kernels_mcmc.cuh:122).
    """
    cov3d = covariance_from_scale_rotation(raw_scales, raw_rotations)
    transformed = jnp.einsum('nij,nj->ni', cov3d, noise)
    opacity = sigmoid(raw_opacities.reshape(-1))
    gate = 1.0 / (1.0 + jnp.exp(100.0 * opacity - 0.5))
    delta = (current_lr * gate)[:, None] * transformed
    norm_ok = jnp.sum(raw_rotations * raw_rotations, axis=-1) >= 1e-8
    keep = norm_ok if active_mask is None else (norm_ok & active_mask)
    # never let an exploded covariance (exp overflow) inject inf/NaN
    keep = keep[:, None] & jnp.isfinite(delta)
    return means + jnp.where(keep, delta, 0.0)
