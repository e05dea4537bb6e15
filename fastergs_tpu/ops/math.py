"""Core math primitives shared across the framework.

Quaternion handling matches the reference contract: quaternions are stored
UNNORMALIZED in (w, x, y, z) order and the rotation matrix divides by the
squared norm (reference: rasterization/include/kernel_utils.cuh:15-30,
Cameras.utils.quaternion_to_rotation_matrix usage in Model.py:129).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sigmoid(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.sigmoid(x)


def logit(p: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Inverse sigmoid with clamping (torch.logit(eps=...) semantics)."""
    p = jnp.clip(p, eps, 1.0 - eps)
    return jnp.log(p) - jnp.log1p(-p)


def quaternion_norm_sq(q: jnp.ndarray) -> jnp.ndarray:
    """Squared norm of (..., 4) quaternions."""
    return jnp.sum(q * q, axis=-1)


def quaternion_to_rotation_matrix(q: jnp.ndarray, normalize: bool = True) -> jnp.ndarray:
    """Convert (..., 4) (w, x, y, z) quaternions to (..., 3, 3) rotation matrices.

    Unnormalized quaternions are handled by dividing each quadratic term by the
    squared norm — identical to the reference kernel
    (kernel_utils.cuh:15-30) and invariant to quaternion scale.

    Args:
        q: quaternions, (..., 4) in (w, x, y, z) order.
        normalize: kept for API parity with the host framework; the formula is
            scale-invariant so the flag only guards against zero-norm inputs.
    """
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    norm_sq = r * r + x * x + y * y + z * z
    if normalize:
        norm_sq = jnp.maximum(norm_sq, 1e-12)
    s = 1.0 / norm_sq
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    rx, ry, rz = r * x, r * y, r * z
    row0 = jnp.stack([1.0 - 2.0 * (yy + zz) * s, 2.0 * (xy - rz) * s, 2.0 * (xz + ry) * s], axis=-1)
    row1 = jnp.stack([2.0 * (xy + rz) * s, 1.0 - 2.0 * (xx + zz) * s, 2.0 * (yz - rx) * s], axis=-1)
    row2 = jnp.stack([2.0 * (xz - ry) * s, 2.0 * (yz + rx) * s, 1.0 - 2.0 * (xx + yy) * s], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def covariance_from_scale_rotation(raw_scales: jnp.ndarray, raw_rotations: jnp.ndarray) -> jnp.ndarray:
    """cov3d = R diag(exp(2*raw_scale)) R^T for (..., 3)/(..., 4) inputs.

    Matches the reference's RSS formulation (kernels_forward.cuh:79-96):
    variance = exp(2*raw_scale), cov3d = (R*var) @ R^T.
    """
    variance = jnp.exp(2.0 * raw_scales)  # (..., 3)
    R = quaternion_to_rotation_matrix(raw_rotations, normalize=True)  # (..., 3, 3)
    RSS = R * variance[..., None, :]  # scale columns
    return RSS @ jnp.swapaxes(R, -1, -2)


def float32_ordered_bits(x: jnp.ndarray) -> jnp.ndarray:
    """IEEE-754 bits of a non-negative float32 as int32 — order-preserving.

    The reference uses raw float bits of (positive) depth as radix-sort keys
    (kernels_forward.cuh:206). For non-negative floats the bit pattern is
    monotone in the value, so the same trick works for integer sort keys here.
    """
    return jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.int32)
