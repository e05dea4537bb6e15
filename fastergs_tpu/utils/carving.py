"""Visibility/alpha carving for random initialization.

Equivalent of the reference's `carve` (reference: utils.py:29-52): removes
random-init points never in-frustum (optionally: not in ALL frustums, or
projecting onto zero-alpha pixels with a 3x3 dilation).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from fastergs_tpu.utils.logging import log_info


def _dilate3x3(alpha: np.ndarray) -> np.ndarray:
    """Binary 3x3 dilation of (H, W) bool."""
    padded = np.pad(alpha, 1)
    out = np.zeros_like(alpha)
    for dy in range(3):
        for dx in range(3):
            out |= padded[dy:dy + alpha.shape[0], dx:dx + alpha.shape[1]]
    return out


def carve(points: np.ndarray, views, in_all_frustums: bool,
          enforce_alpha: bool) -> np.ndarray:
    """Reference semantics (utils.py:36-52)."""
    log_info(f'removing points that would not be visible in any training view '
             f'(in_all_frustums={in_all_frustums}, enforce_alpha={enforce_alpha})')
    n = points.shape[0]
    in_frustum_any = np.zeros(n, bool)
    in_frustum_all = np.ones(n, bool)
    in_alpha_all = np.ones(n, bool)
    pts = jnp.asarray(points)
    for view in views:
        xy, _, in_frustum = view.project_points(pts)
        xy = np.asarray(xy)
        in_frustum = np.asarray(in_frustum)
        in_frustum_any |= in_frustum
        if in_all_frustums:
            in_frustum_all &= in_frustum
        if enforce_alpha and in_frustum.any() and view.alpha is not None:
            alpha = _dilate3x3(np.asarray(view.alpha)[0] > 0)
            xyi = np.floor(xy[in_frustum]).astype(np.int64)
            xyi[:, 0] = np.clip(xyi[:, 0], 0, alpha.shape[1] - 1)
            xyi[:, 1] = np.clip(xyi[:, 1], 0, alpha.shape[0] - 1)
            in_alpha_all[in_frustum] &= alpha[xyi[:, 1], xyi[:, 0]]
    valid = in_frustum_any & in_alpha_all & in_frustum_all
    return np.ascontiguousarray(points[valid])
