"""Tile binning: Gaussian→(tile, instance) expansion, sorting, tile ranges.

TPU-native redesign of the reference's instance pipeline
(reference: rasterization/src/forward.cu:99-232 and
kernels_forward.cuh:212-361). Key translations:

- The reference's two CUB radix sorts (depth keys over visible primitives,
  then a *stable* sort by tile key that preserves depth order within a tile —
  forward.cu:104-110, 195-202) collapse into ONE lexicographic
  `lax.sort` with two keys (tile, depth-bits). The resulting order is
  identical: instances grouped by tile, depth-ascending within each tile.
- The reference's dynamic instance count (atomic counters + D2H sync,
  forward.cu:99-102) becomes a static instance capacity with sentinel keys:
  invalid/non-contributing instances get tile id == n_tiles and sort to the
  end. Capacity overflow is detected via the returned `n_rect_instances`.
- The warp-cooperative exact-tile enumeration (create_instances_cu,
  kernels_forward.cuh:225-329) becomes a flat `searchsorted` over the
  prefix-summed rect areas: instance slot i finds its owning Gaussian with a
  vectorized binary search, decodes its tile from the rect, and applies the
  exact StopThePop contribution test as a mask.
- extract_instance_ranges_cu (kernels_forward.cuh:331-349) becomes two
  `searchsorted` calls over the sorted tile keys.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from fastergs_tpu.constants import RasterizerConstants, DEFAULT_CONSTANTS
from fastergs_tpu.ops.math import float32_ordered_bits
from fastergs_tpu.ops.projection import Primitives2D, will_primitive_contribute


class TileInstances(NamedTuple):
    """Sorted instance buffers (all static-shaped)."""
    gaussian_idx: jnp.ndarray    # (I,) i32 — owning Gaussian per sorted instance
    tile_idx: jnp.ndarray        # (I,) i32 — tile per sorted instance (n_tiles = invalid)
    tile_start: jnp.ndarray      # (T,) i32 — first instance of each tile
    tile_end: jnp.ndarray        # (T,) i32 — one-past-last instance of each tile
    n_instances: jnp.ndarray     # () i32 — number of contributing instances
    n_rect_instances: jnp.ndarray  # () i32 — rect-expanded count (overflow check)


def build_tile_instances(
    prims: Primitives2D,
    grid_width: int,
    grid_height: int,
    instance_cap: int,
    consts: RasterizerConstants = DEFAULT_CONSTANTS,
    exact_tile_test: bool = True,
) -> TileInstances:
    """Expands visible Gaussians into depth-within-tile sorted instances."""
    n_tiles = grid_width * grid_height
    counts = prims.n_touched_rect  # (N,) zero for culled

    # inclusive prefix sum of rect areas → instance → Gaussian ownership
    offsets = jnp.cumsum(counts)  # (N,)
    total_rect = offsets[-1]

    slot = jnp.arange(instance_cap, dtype=jnp.int32)
    g = jnp.searchsorted(offsets, slot, side='right').astype(jnp.int32)
    in_range = slot < total_rect
    g = jnp.minimum(g, counts.shape[0] - 1)

    # local index within the Gaussian's rect → tile coordinates
    start_of_g = offsets[g] - counts[g]
    local = slot - start_of_g
    rect = prims.rect[g]  # (I, 4) x0, x1, y0, y1
    rect_w = jnp.maximum(rect[:, 1] - rect[:, 0], 1)
    tile_x = rect[:, 0] + local % rect_w
    tile_y = rect[:, 2] + local // rect_w

    contributes = in_range & prims.visible[g]
    if exact_tile_test:
        contributes &= will_primitive_contribute(
            prims.mean2d[g] - 0.5, prims.conic[g], tile_x, tile_y,
            prims.power_threshold[g], consts)

    tile_key = jnp.where(contributes, tile_y * grid_width + tile_x, n_tiles)
    tile_key = tile_key.astype(jnp.int32)
    # IEEE bits of positive depth are order-preserving (kernels_forward.cuh:206)
    depth_key = float32_ordered_bits(prims.depth)[g]

    sorted_tile, _, sorted_g = jax.lax.sort(
        (tile_key, depth_key, g), num_keys=2, is_stable=False)

    tile_ids = jnp.arange(n_tiles, dtype=jnp.int32)
    tile_start = jnp.searchsorted(sorted_tile, tile_ids, side='left').astype(jnp.int32)
    tile_end = jnp.searchsorted(sorted_tile, tile_ids + 1, side='left').astype(jnp.int32)
    n_instances = jnp.searchsorted(sorted_tile, n_tiles, side='left').astype(jnp.int32)

    return TileInstances(
        gaussian_idx=sorted_g,
        tile_idx=sorted_tile,
        tile_start=tile_start,
        tile_end=tile_end,
        n_instances=n_instances,
        n_rect_instances=total_rect.astype(jnp.int32),
    )
