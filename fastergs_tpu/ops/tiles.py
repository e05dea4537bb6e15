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
  forward.cu:99-102) becomes a static instance capacity with sentinel keys.
  The capacity covers EXACT contribution counts (computed per Gaussian in
  ops/projection.py), not rect areas; overflow is detected via the returned
  `n_expanded_instances`.
- The warp-cooperative exact-tile enumeration (create_instances_cu,
  kernels_forward.cuh:225-329) becomes: slot→Gaussian ownership by
  scatter + cumulative max (a monotone step function — no binary search),
  per-Gaussian fields propagated to instances by integer delta-scatter +
  cumsum segment fill (exact for integers, no gathers), and the j-th
  contributing tile decoded from the 64-bit contribution mask with a
  select-bit binary search on prefix popcounts.
- extract_instance_ranges_cu (kernels_forward.cuh:331-349) becomes one
  boundary `searchsorted` over the sorted tile keys.

Performance (v5e, 250k Gaussians → ~3.3M instances): lax.sort ≈ 8 ms; the
naive searchsorted/gather formulation cost >1.1 s, this one ≈ tens of ms.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from fastergs_tpu.constants import (RasterizerConstants, DEFAULT_CONSTANTS,
                                    sort_pad_len)
from fastergs_tpu.ops.math import float32_ordered_bits
from fastergs_tpu.ops.projection import Primitives2D, EXACT_TEST_WINDOW


class TileInstances(NamedTuple):
    """Sorted instance buffers (all static-shaped)."""
    gaussian_idx: jnp.ndarray    # (I,) i32 — owning Gaussian per sorted instance
    tile_idx: jnp.ndarray        # (I,) i32 — tile per sorted instance (n_tiles = invalid)
    tile_start: jnp.ndarray      # (T,) i32 — first instance of each tile
    tile_end: jnp.ndarray        # (T,) i32 — one-past-last instance of each tile
    n_instances: jnp.ndarray     # () i32 — number of contributing instances
    n_expanded_instances: jnp.ndarray  # () i32 — slots required (overflow check)


def _segment_fill_int(columns: jnp.ndarray, has: jnp.ndarray,
                      starts: jnp.ndarray, cap: int) -> jnp.ndarray:
    """Broadcasts per-Gaussian int32 rows to their instance segments.

    columns: (N, C) int32 values; has: (N,) which Gaussians own a segment;
    starts: (N,) first slot of each segment (strictly increasing over `has`).
    Returns (cap, C) where every slot in a segment holds its owner's row.

    Works by scattering per-segment DELTAS at segment starts and integrating
    with a cumsum — exact for integers (the partial sums telescope to the
    original values), and ~an order of magnitude faster than row gathers on
    TPU, where gathers are latency-bound.
    """
    n = columns.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    # index of the previous segment-owning Gaussian (-1 for the first)
    last_incl = jax.lax.cummax(jnp.where(has, idx, -1))
    prev = jnp.concatenate([jnp.full((1,), -1, jnp.int32), last_incl[:-1]])
    prev_vals = jnp.where((prev >= 0)[:, None],
                          columns[jnp.maximum(prev, 0)], 0)
    deltas = jnp.where(has[:, None], columns - prev_vals, 0)
    starts_masked = jnp.where(has, starts, cap).astype(jnp.int32)
    arr = jnp.zeros((cap, columns.shape[1]), jnp.int32).at[starts_masked].add(
        deltas, mode='drop', unique_indices=True, indices_are_sorted=True)
    return jnp.cumsum(arr, axis=0)


def _select_bit(mask_lo: jnp.ndarray, mask_hi: jnp.ndarray,
                j: jnp.ndarray) -> jnp.ndarray:
    """Position of the (j+1)-th set bit of a 64-bit mask (vectorized).

    Two-level: one popcount picks the 32-bit word, then a 5-step binary
    search on prefix popcounts WITHIN the word — prefix masks of a 32-bit
    word are a single shift-sub ((1 << p) - 1 for p in [1, 32] via
    2 << (p-1)), no clip/select gymnastics. ~2.5x fewer VPU ops per slot
    than the flat 6-step 64-bit search this replaces (the expansion decode,
    not the sort, dominates the stream build — round-5 finding).
    """
    lo = mask_lo.astype(jnp.uint32)
    hi = mask_hi.astype(jnp.uint32)
    n_lo = jax.lax.population_count(lo).astype(jnp.int32)
    in_hi = j >= n_lo
    word = jnp.where(in_hi, hi, lo)
    jw = jnp.where(in_hi, j - n_lo, j).astype(jnp.uint32)

    pos = jnp.zeros_like(j)
    for step in (16, 8, 4, 2, 1):
        cand = pos + step
        # prefix mask of bits [0, cand): cand in [1, 32] -> (2 << (cand-1)) - 1
        m = (jnp.uint32(2) << (cand - 1).astype(jnp.uint32)) - 1
        pop = jax.lax.population_count(word & m).astype(jnp.uint32)
        pos = jnp.where(pop <= jw, cand, pos)
    return pos + jnp.where(in_hi, 32, 0)


def _expand_instances(prims: Primitives2D, grid_width: int, grid_height: int,
                      instance_cap: int, extra_cols: jnp.ndarray | None = None):
    """Expands Gaussians into unsorted (tile_key, depth_key, owner) slots.

    Returns (tile_key, depth_key, own, total, extra) of length instance_cap;
    out-of-range slots carry tile_key == n_tiles (sentinel). The slot→owner
    map rides the SAME delta-scatter + cumsum as the other integer columns
    (one scatter total — XLA scatters carry a large fixed cost on TPU).

    extra_cols: optional (N, K) i32 per-Gaussian payload broadcast to the
    slots through the same exact fill (both fill paths reproduce raw
    bitpatterns exactly, so f32 fields can ride bitcast); `extra` is a list
    of K filled (cap,) payload columns (None if extra_cols is None).
    """
    n_tiles = grid_width * grid_height
    counts = prims.n_touched  # (N,) exact (or conservative) counts, 0 if culled

    offsets = jnp.cumsum(counts)
    total = offsets[-1]
    starts = (offsets - counts).astype(jnp.int32)
    has = counts > 0

    # per-instance integer fields via segment fill (no gathers). Small
    # fields ride PACKED words — the fill cost scales with column count,
    # and packing is safe because both fill paths reproduce rows exactly
    # (the Pallas kernel copies them; the scatter+cumsum fallback
    # telescopes exactly in modular i32 arithmetic).
    rect = prims.rect
    n = counts.shape[0]
    x0_c = rect[:, 0]
    w_c = jnp.maximum(rect[:, 1] - rect[:, 0], 1)
    y0_c = rect[:, 2]
    geom = x0_c | (w_c << 10) | (y0_c << 20)          # 10b | 10b | 10b
    ownex = (jnp.arange(n, dtype=jnp.int32)
             | (prims.exact.astype(jnp.int32) << 30))  # owner 30b | exact 1b
    col_list = [
        starts,                                       # 0: segment start
        geom,                                         # 1: x0 | width | y0
        float32_ordered_bits(prims.depth),            # 2: depth sort key
        prims.tile_mask[:, 0],                        # 3: mask lo
        prims.tile_mask[:, 1],                        # 4: mask hi
        ownex,                                        # 5: owner | exact
    ]
    n_extra = 0
    if extra_cols is not None:
        n_extra = extra_cols.shape[1]
        col_list += [extra_cols[:, c] for c in range(n_extra)]

    from fastergs_tpu.ops.fill import (ROWS as FILL_ROWS,
                                       can_use_fill_kernel, segment_fill_rows)
    # the Pallas fill kernel beats the delta-scatter+cumsum lowering ~5x on
    # TPU; the fallback keeps odd capacities and big pure-CPU (oracle)
    # paths on the XLA formulation (the kernel in interpret mode is for
    # small-cap test coverage)
    use_kernel = (len(col_list) <= FILL_ROWS
                  and can_use_fill_kernel(n, instance_cap)
                  and (jax.default_backend() == 'tpu'
                       or instance_cap <= (1 << 14)))
    if use_kernel:
        pad = [jnp.zeros((n,), jnp.int32)] * (FILL_ROWS - len(col_list))
        rows_t = jnp.stack(col_list + pad, axis=0)
        filled_t = segment_fill_rows(rows_t, starts, instance_cap)
        fcol = [filled_t[c] for c in range(len(col_list))]
    else:
        filled = _segment_fill_int(jnp.stack(col_list, axis=1), has, starts,
                                   instance_cap)
        fcol = [filled[:, c] for c in range(len(col_list))]

    extra = fcol[6:] if extra_cols is not None else None
    own = fcol[5] & 0x3FFFFFFF
    exact = fcol[5] >> 30

    slot = jnp.arange(instance_cap, dtype=jnp.int32)
    in_range = slot < total
    local = slot - fcol[0]
    # j-th contributing tile: select the j-th set mask bit (exact Gaussians)
    # or enumerate the rect directly (conservative fallback)
    pos = jnp.where(exact > 0,
                    _select_bit(fcol[3], fcol[4], local),
                    local)
    g_x0 = fcol[1] & 1023
    g_w = (fcol[1] >> 10) & 1023
    g_y0 = fcol[1] >> 20
    # divmod by the DYNAMIC rect width via f32 reciprocal-multiply + a +/-1
    # fixup — the VPU has no integer divide; XLA's expansion of a dynamic-
    # divisor i32 div is tens of ops per lane. Exact: pos = q*g_w + r with
    # pos <= 2^20 < 2^24, so the correctly-rounded-ish f32 quotient is
    # within 1 of floor(pos/g_w) and the fixup lands it.
    q = jnp.floor(pos.astype(jnp.float32) /
                  g_w.astype(jnp.float32)).astype(jnp.int32)
    r = pos - q * g_w
    under = r < 0
    over = r >= g_w
    q = q + jnp.where(over, 1, 0) - jnp.where(under, 1, 0)
    r = r + jnp.where(under, g_w, 0) - jnp.where(over, g_w, 0)
    tile_x = g_x0 + r
    tile_y = g_y0 + q

    tile_key = jnp.where(in_range, tile_y * grid_width + tile_x, n_tiles)
    return tile_key.astype(jnp.int32), fcol[2], own, total, extra


def _apply_tile_row_band(tile_key, grid_width, n_tiles, tile_row_band):
    """Sentinels out instances whose tile row lies outside [lo, hi).

    Applied BEFORE the sort, so banded streams stay tile-monotonic — the
    device-banding hook of the Gaussian-sharded multi-chip step
    (parallel/gaussian_parallel.py): each device blends only its band of
    tile rows.
    """
    if tile_row_band is None:
        return tile_key
    lo, hi = tile_row_band
    row = tile_key // grid_width
    in_band = (row >= lo) & (row < hi)
    return jnp.where(in_band, tile_key, n_tiles)


def build_tile_instances(
    prims: Primitives2D,
    grid_width: int,
    grid_height: int,
    instance_cap: int,
    consts: RasterizerConstants = DEFAULT_CONSTANTS,
    exact_tile_test: bool = True,  # kept for API compat; test runs in preprocess
    tile_row_band=None,
) -> TileInstances:
    """Expands Gaussians into depth-within-tile sorted instances."""
    del exact_tile_test
    n_tiles = grid_width * grid_height
    tile_key, depth_key, own, total, _ = _expand_instances(
        prims, grid_width, grid_height, instance_cap)
    tile_key = _apply_tile_row_band(tile_key, grid_width, n_tiles,
                                    tile_row_band)

    # single lexicographic sort replaces the reference's dual radix sort
    # (depth keys then stable tile keys, forward.cu:104-110,195-202)
    sorted_tile, _, sorted_g = jax.lax.sort(
        (tile_key, depth_key, own), num_keys=2, is_stable=False)

    # [start, end) per tile without another sort: scatter-min each tile's
    # first slot, then a reverse running min fills empty tiles with the next
    # tile's start (equivalent of extract_instance_ranges_cu,
    # kernels_forward.cuh:331-349, built from a scatter instead of boundary
    # detection)
    slots = jnp.arange(instance_cap, dtype=jnp.int32)
    first = jnp.full(n_tiles + 1, instance_cap, jnp.int32).at[sorted_tile].min(
        slots, mode='drop')
    n_instances = jnp.minimum(first[n_tiles], instance_cap)
    bounds = jax.lax.cummin(first.at[n_tiles].set(n_instances), reverse=True)
    tile_start = bounds[:n_tiles]
    tile_end = bounds[1:]

    return TileInstances(
        gaussian_idx=sorted_g,
        tile_idx=sorted_tile,
        tile_start=tile_start,
        tile_end=tile_end,
        n_instances=n_instances,
        n_expanded_instances=total.astype(jnp.int32),
    )


class CompactTileInstances(NamedTuple):
    """Tile-sorted instance stream with NO padding or ranges.

    Feeds the chunk-major streaming blend kernels (ops/blend_stream.py),
    which detect tile boundaries from `tile_idx` in-kernel — so no per-tile
    histogram, alignment dummies, or searchsorted ranges are needed.
    """
    gaussian_idx: jnp.ndarray    # (I,) i32; sentinel = n_gaussians
    tile_idx: jnp.ndarray        # (I,) i32; sentinel = n_tiles
    n_instances: jnp.ndarray     # () i32 contributing instances (≤ cap)
    n_expanded_instances: jnp.ndarray  # () i32 slots required (overflow)


def build_tile_instances_compact(
    prims: Primitives2D,
    grid_width: int,
    grid_height: int,
    instance_cap: int,
    consts: RasterizerConstants = DEFAULT_CONSTANTS,
    tile_row_band=None,
) -> CompactTileInstances:
    """Expansion + ONE lexicographic sort; nothing else.

    The single sort replaces the reference's dual radix sort
    (forward.cu:104-110, 195-202); sentinel slots (tile == n_tiles,
    owner == n_gaussians) sort to the end of the stream.
    """
    n_gaussians = prims.rect.shape[0]
    tile_key, depth_key, own, total, _ = _expand_instances(
        prims, grid_width, grid_height, instance_cap)
    tile_key = _apply_tile_row_band(tile_key, grid_width,
                                    grid_width * grid_height, tile_row_band)
    slot = jnp.arange(instance_cap, dtype=jnp.int32)
    own = jnp.where(slot < total, own, n_gaussians)
    sorted_tile, _, sorted_g = jax.lax.sort(
        (tile_key, depth_key, own), num_keys=2, is_stable=False)
    return CompactTileInstances(
        gaussian_idx=sorted_g,
        tile_idx=sorted_tile,
        n_instances=jnp.minimum(total, instance_cap).astype(jnp.int32),
        n_expanded_instances=total.astype(jnp.int32),
    )


def build_tile_instances_stream(
    prims: Primitives2D,
    pack9_sg: jnp.ndarray,
    grid_width: int,
    grid_height: int,
    instance_cap: int,
    consts: RasterizerConstants = DEFAULT_CONSTANTS,
    tile_row_band=None,
) -> tuple[CompactTileInstances, jnp.ndarray]:
    """Compact binning that carries the 9 blend-field columns through the
    expansion and the sort, so no post-sort row gather is needed.

    The reference gathers per-instance fields after its tile sort
    (forward.cu:195-202 feeds blend_cu via the sorted index list); on TPU
    a row gather costs ~12 ns/row (latency-bound) while sort payload is
    bandwidth-bound and nearly free (measured: 3→12 sort operands adds
    ~0.2 ms at 1.15M instances vs 17 ms for the gather). The fields ride
    the exact telescoping delta-scatter/cumsum as bitcast i32 (modular
    partial sums reproduce every bitpattern exactly) and the lexicographic
    sort as non-key operands.

    pack9_sg must be gradient-free (stop_gradient); differentiability is
    restored by `attach_stream_grad`, whose VJP performs the deterministic
    per-Gaussian reduction (the analog of kernels_backward.cuh:459-470).

    Returns (CompactTileInstances, rows10): rows10 is a tuple of 10 (I,)
    f32 columns — 0-8 the blend fields (equal to pack9_sg[gaussian_idx].T
    rows, zeros at sentinel slots), 9 the tile id — the sort outputs feed
    the streaming kernels DIRECTLY (no stacked (16, I) layout ever
    materializes in HBM).
    """
    n_gaussians = prims.rect.shape[0]
    fields_i32 = jax.lax.bitcast_convert_type(pack9_sg, jnp.int32)
    tile_key, depth_key, own, total, extra = _expand_instances(
        prims, grid_width, grid_height, instance_cap, extra_cols=fields_i32)
    n_tiles = grid_width * grid_height
    tile_key = _apply_tile_row_band(tile_key, grid_width, n_tiles,
                                    tile_row_band)
    slot = jnp.arange(instance_cap, dtype=jnp.int32)
    live = (slot < total) & (tile_key < n_tiles)
    own = jnp.where(live, own, n_gaussians)
    # sentinel slots must blend to nothing: zero fields (alpha == 0, inert)
    extra = [jnp.where(live, c, 0) for c in extra]

    # Sort at the capacity itself when it is CAP_ALIGN-aligned (production
    # caps are — see constants.round_up_capacity); otherwise pad with
    # max-key sentinels to an alignment XLA compiles fast and slice back.
    # Real instances (≤ cap) are unaffected since sentinels sort to the
    # tail.
    sort_len = sort_pad_len(instance_cap)
    pad = sort_len - instance_cap
    ops_in = [tile_key, depth_key, own] + list(extra)
    if pad:
        pad_vals = [n_tiles, 0, n_gaussians] + [0] * 9
        ops_in = [jnp.concatenate(
            [o, jnp.full((pad,), v, jnp.int32)]) for o, v in
            zip(ops_in, pad_vals)]
    ops = jax.lax.sort(tuple(ops_in), num_keys=2, is_stable=False)
    if pad:
        ops = tuple(o[:instance_cap] for o in ops)
    sorted_tile, _, sorted_g = ops[0], ops[1], ops[2]
    rows10 = tuple(
        jax.lax.bitcast_convert_type(c, jnp.float32) for c in ops[3:]
    ) + (sorted_tile.astype(jnp.float32),)
    inst = CompactTileInstances(
        gaussian_idx=sorted_g,
        tile_idx=sorted_tile,
        n_instances=jnp.minimum(total, instance_cap).astype(jnp.int32),
        n_expanded_instances=total.astype(jnp.int32),
    )
    return inst, rows10


@jax.custom_vjp
def attach_stream_grad(pack9: jnp.ndarray, rows10,
                       gaussian_idx: jnp.ndarray):
    """Passthrough of rows10 (columns 0-8 == pack9[gaussian_idx].T rows,
    sentinel-zeroed) that restores differentiability w.r.t. pack9: the VJP
    reduces the per-instance field cotangents (columns 0-8; the tile
    column is non-differentiable) to per-Gaussian sums — the deterministic
    segment reduction replacing the reference's atomic accumulation
    (kernels_backward.cuh:459-470)."""
    del pack9, gaussian_idx
    return rows10


def _attach_stream_grad_fwd(pack9, rows10, gaussian_idx):
    return rows10, (pack9.shape[0], gaussian_idx)


def _attach_stream_grad_bwd(res, d_rows):
    import numpy as np
    n, gidx = res
    # deterministic per-Gaussian reduction: owner-sort (bandwidth-bound
    # payload) + Pallas window segment-sum — ~2x faster than the XLA
    # scatter-add lowering (sort + serialized per-row updates)
    from fastergs_tpu.ops.segreduce import reduce_by_gaussian
    d_pack9 = reduce_by_gaussian(d_rows, gidx, n, n_data_rows=9).T
    return (d_pack9,
            jax.tree_util.tree_map(jnp.zeros_like, d_rows),
            np.zeros(gidx.shape, jax.dtypes.float0))


attach_stream_grad.defvjp(_attach_stream_grad_fwd, _attach_stream_grad_bwd)


