"""Morton (Z-order) encoding of 3D positions for memory-coherent ordering.

Equivalent of the host's CudaUtils.MortonEncoding.morton_encode consumed at
reference Model.py:454-458: positions are normalized to the active bounding
box, quantized, bit-interleaved, and the argsort of the codes gives the
ordering applied to all parameter/optimizer arrays. 10 bits per axis (30-bit
code in int32) — the code exists purely to improve locality of subsequent
gathers, so moderate quantization is fine.
"""

from __future__ import annotations

import jax.numpy as jnp

_BITS = 10


def _part_1by2(x: jnp.ndarray) -> jnp.ndarray:
    """Spread the low 10 bits of x so there are 2 zero bits between each."""
    x = x & 0x3FF
    x = (x | (x << 16)) & 0x30000FF
    x = (x | (x << 8)) & 0x300F00F
    x = (x | (x << 4)) & 0x30C30C3
    x = (x | (x << 2)) & 0x9249249
    return x


def morton_encode(positions: jnp.ndarray,
                  valid_mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """(N, 3) float positions → (N,) int32 Morton codes.

    Invalid rows (padding) are pushed past all valid codes so an argsort
    keeps them at the end.
    """
    if valid_mask is None:
        valid_mask = jnp.ones(positions.shape[0], bool)
    big = jnp.float32(3.4e38)
    masked = jnp.where(valid_mask[:, None], positions, big)
    lo = jnp.min(masked, axis=0)
    masked = jnp.where(valid_mask[:, None], positions, -big)
    hi = jnp.max(masked, axis=0)
    extent = jnp.maximum(hi - lo, 1e-12)
    q = jnp.clip(((positions - lo) / extent) * (2 ** _BITS - 1), 0, 2 ** _BITS - 1)
    q = q.astype(jnp.int32)
    code = (_part_1by2(q[:, 0])
            | (_part_1by2(q[:, 1]) << 1)
            | (_part_1by2(q[:, 2]) << 2))
    return jnp.where(valid_mask, code, jnp.int32(0x7FFFFFFF))
