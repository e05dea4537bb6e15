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
    """Keep only random-init points that some (or every) training view can
    see; optionally also require a non-transparent landing pixel.

    Semantics match the reference's carve (reference: utils.py:36-52):
    a point survives iff it is inside at least one view frustum, inside
    every frustum when ``in_all_frustums`` is set, and — when
    ``enforce_alpha`` is set — lands on a (3x3-dilated) nonzero-alpha pixel
    in every view whose frustum contains it.
    """
    log_info(f'carving random-init points against {len(views)} training '
             f'frustums (require_all={in_all_frustums}, '
             f'alpha_check={enforce_alpha})')
    n = points.shape[0]
    seen_by_some = np.zeros(n, bool)
    seen_by_every = np.ones(n, bool)
    alpha_ok = np.ones(n, bool)
    pts = jnp.asarray(points)
    for view in views:
        xy, _, visible = view.project_points(pts)
        xy = np.asarray(xy)
        visible = np.asarray(visible)
        seen_by_some |= visible
        if in_all_frustums:
            seen_by_every &= visible
        if enforce_alpha and visible.any() and view.alpha is not None:
            mask = _dilate3x3(np.asarray(view.alpha)[0] > 0)
            cols_rows = np.floor(xy[visible]).astype(np.int64)
            cols = np.clip(cols_rows[:, 0], 0, mask.shape[1] - 1)
            rows = np.clip(cols_rows[:, 1], 0, mask.shape[0] - 1)
            alpha_ok[visible] &= mask[rows, cols]
    keep = seen_by_some & alpha_ok & seen_by_every
    return np.ascontiguousarray(points[keep])
