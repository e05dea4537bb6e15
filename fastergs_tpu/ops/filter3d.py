"""Mip-Splatting 3D smoothing filter computation.

TPU-native equivalent of the reference filter3d module
(reference: filter3d/src/filter3d.cu:9-83, Model.py:148-198). The per-view
kernel launches become a `lax.scan` over stacked camera tensors: one jitted
pass computes min-over-views screen-space filter sizes and visibility.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=('clipping_tolerance',))
def compute_3d_filter(
    positions: jnp.ndarray,      # (N, 3)
    w2cs: jnp.ndarray,           # (V, 3, 4) stacked view matrices
    intrinsics: jnp.ndarray,     # (V, 6) fx, fy, cx, cy, width, height
    near_planes: jnp.ndarray,    # (V,)
    distance2filter: jnp.ndarray,  # scalar: sqrt(filter_variance) / max_focal
    active_mask: jnp.ndarray | None = None,
    clipping_tolerance: float = 0.15,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (filter_3d (N,), visibility (N,)).

    Per view (filter3d.cu:9-38): a point inside the (tolerance-expanded)
    frustum contributes a candidate filter distance2filter * z; the filter is
    the min over views. Invisible points inherit the max over visible points
    (Model.py:192-193).
    """
    n = positions.shape[0]
    if active_mask is None:
        active_mask = jnp.ones(n, bool)

    bounds_factor = clipping_tolerance + 0.5

    def per_view(carry, view):
        filt, vis = carry
        w2c, intr, near = view
        fx, fy, cx, cy, w, h = (intr[0], intr[1], intr[2], intr[3], intr[4], intr[5])
        cam_pts = positions @ w2c[:, :3].T + w2c[:, 3]
        z = cam_pts[:, 2]
        # frustum bounds with tolerance (filter3d.cu:57-67)
        pox = cx - 0.5 * w
        poy = cy - 0.5 * h
        left = (-bounds_factor * w - pox) / fx
        right = (bounds_factor * w - pox) / fx
        top = (-bounds_factor * h - poy) / fy
        bottom = (bounds_factor * h - poy) / fy
        in_view = ((z >= near)
                   & (cam_pts[:, 0] >= left * z) & (cam_pts[:, 0] <= right * z)
                   & (cam_pts[:, 1] >= top * z) & (cam_pts[:, 1] <= bottom * z)
                   & active_mask)
        candidate = distance2filter * z
        filt = jnp.where(in_view & (candidate < filt), candidate, filt)
        vis = vis | in_view
        return (filt, vis), None

    init = (jnp.full((n,), jnp.finfo(jnp.float32).max), jnp.zeros(n, bool))
    (filt, vis), _ = jax.lax.scan(per_view, init, (w2cs, intrinsics, near_planes))

    # invisible points get the max filter among visible ones (Model.py:192-193)
    filt_max = jnp.max(jnp.where(vis, filt, -jnp.inf))
    filt_max = jnp.where(jnp.isfinite(filt_max), filt_max, 1.0)
    filt = jnp.where(vis, filt, filt_max)
    return filt, vis


def stack_view_cameras(views) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Stacks a list of Views into (w2cs, intrinsics, near_planes) arrays."""
    import numpy as np
    w2cs = np.stack([v.w2c34 for v in views])
    intr = np.stack([
        [v.camera.focal_x, v.camera.focal_y, v.camera.center_x,
         v.camera.center_y, v.camera.width, v.camera.height]
        for v in views]).astype(np.float32)
    near = np.asarray([v.camera.near_plane for v in views], np.float32)
    return jnp.asarray(w2cs), jnp.asarray(intr), jnp.asarray(near)
