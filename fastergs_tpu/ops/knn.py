"""Root-mean-squared k-nearest-neighbor distances (initial Gaussian scales).

Equivalent of the host's `compute_root_mean_squared_knn_distances`
(reference usage: Model.py:19,211 — 3DGS uses k=3 on the SfM point cloud).
Chunked brute force: one (chunk x N) distance tile at a time so memory stays
bounded; the pairwise distance computation is a matmul, which is exactly
what the MXU wants.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=('k', 'chunk'))
def rms_knn_distances(points: jnp.ndarray, k: int = 3, chunk: int = 1024) -> jnp.ndarray:
    """(N, 3) points → (N,) RMS distance to the k nearest neighbors (self excluded)."""
    n = points.shape[0]
    pad = (-n) % chunk
    pts = jnp.pad(points, ((0, pad), (0, 0)))
    sq = jnp.sum(pts * pts, axis=-1)
    n_chunks = pts.shape[0] // chunk

    def body(i, out):
        block = jax.lax.dynamic_slice_in_dim(pts, i * chunk, chunk)
        bsq = jax.lax.dynamic_slice_in_dim(sq, i * chunk, chunk)
        d2 = (bsq[:, None] + sq[None, :]
              - 2.0 * jnp.dot(block, pts.T, preferred_element_type=jnp.float32,
              precision=jax.lax.Precision.HIGHEST))
        # mask self and padding columns
        cols = jnp.arange(pts.shape[0])
        rows = i * chunk + jnp.arange(chunk)
        d2 = jnp.where(cols[None, :] == rows[:, None], jnp.inf, d2)
        d2 = jnp.where(cols[None, :] >= n, jnp.inf, d2)
        neg_top, _ = jax.lax.top_k(-d2, k)
        mean_sq = jnp.mean(jnp.maximum(-neg_top, 0.0), axis=-1)
        return jax.lax.dynamic_update_slice_in_dim(out, jnp.sqrt(mean_sq), i * chunk, 0)

    out = jax.lax.fori_loop(0, n_chunks, body, jnp.zeros(pts.shape[0]))
    return out[:n]
