"""Spherical-harmonics color evaluation, degrees 0-3.

Vectorized TPU-native equivalent of the reference's per-thread SH evaluation
(reference: rasterization/include/sh_utils.cuh:32-69). The backward pass —
including the gradient of color w.r.t. the view direction and hence the 3D
mean (sh_utils.cuh:71-155) — is obtained through JAX autodiff of this
function; the math is identical because the forward is identical.

`active_sh_bases` is a Python int (static at trace time), matching the
reference where it changes only every 1000 iterations.
"""

from __future__ import annotations

import jax.numpy as jnp

from fastergs_tpu.constants import SH_C0, SH_C1, SH_C2, SH_C3


def eval_sh_color(
    sh_0: jnp.ndarray,        # (N, 1, 3)
    sh_rest: jnp.ndarray,     # (N, B_total - 1, 3)
    means: jnp.ndarray,       # (N, 3) world-space positions
    cam_position: jnp.ndarray,  # (3,)
    active_sh_bases: int,
) -> jnp.ndarray:
    """Returns the raw (unclamped) RGB color per Gaussian, shape (N, 3).

    The 0.5 offset and per-degree signs follow sh_utils.cuh:42-64.
    """
    result = 0.5 + SH_C0 * sh_0[:, 0, :]
    if active_sh_bases > 1:
        d = means - cam_position[None, :]
        d = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-12)
        x, y, z = d[:, 0:1], d[:, 1:2], d[:, 2:3]
        c = sh_rest  # (N, B-1, 3)
        result = (result
                  - SH_C1 * y * c[:, 0]
                  + SH_C1 * z * c[:, 1]
                  - SH_C1 * x * c[:, 2])
        if active_sh_bases > 4:
            xx, yy, zz = x * x, y * y, z * z
            xy, xz, yz = x * y, x * z, y * z
            C2a, C2b, C2c, C2d, _ = SH_C2
            result = (result
                      + C2a * xy * c[:, 3]
                      - C2a * yz * c[:, 4]
                      + (C2b * zz - C2c) * c[:, 5]
                      - C2a * xz * c[:, 6]
                      + C2d * (xx - yy) * c[:, 7])
            if active_sh_bases > 9:
                (C3a, C3b, C3c, C3d, C3e, C3f, C3g, C3h, _, _, _) = SH_C3
                result = (result
                          + y * (C3a * yy - C3b * xx) * c[:, 8]
                          + C3c * xy * z * c[:, 9]
                          + y * (C3d - C3e * zz) * c[:, 10]
                          + z * (C3f * zz - C3g) * c[:, 11]
                          + x * (C3d - C3e * zz) * c[:, 12]
                          + C3h * z * (xx - yy) * c[:, 13]
                          + x * (C3b * yy - C3a * xx) * c[:, 14])
    return result
