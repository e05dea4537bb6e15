"""Sequential multi-column prefix sums (Pallas).

The binning segment fill (ops/tiles.py:_segment_fill_int) integrates
delta-scattered rows with a column-wise cumsum over the instance capacity.
XLA's cumsum lowering costs ~10 ms at (2^20, 15) i32; this kernel runs the
same scan as one sequential pass: per grid step a (BLK, C) block is
prefix-summed with log2(BLK) sublane shifts and offset by a carried (1, C)
row — pure bandwidth plus a handful of VPU passes.

Exactness: integer adds are associative, so the blocked scan reproduces
jnp.cumsum bit-for-bit on int32 (the telescoping fill depends on modular
exactness — see _segment_fill_int).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLK = 2048   # rows per grid step


def _scan_kernel(x_blk, out_blk, carry):
    k = pl.program_id(0)

    @pl.when(k == 0)
    def _():
        carry[:] = jnp.zeros_like(carry)

    x = x_blk[:, :]
    # Hillis-Steele inclusive scan along sublanes: shift down by 2^s and
    # add; rows shifted past the top contribute zero.
    n = x.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    s = 1
    while s < n:
        shifted = pltpu.roll(x, s, axis=0)
        x = x + jnp.where(row >= s, shifted, 0)
        s *= 2
    x = x + carry[:]
    out_blk[:, :] = x
    carry[:] = x[n - 1:n, :]


def cumsum_columns(arr: jnp.ndarray, interpret=None) -> jnp.ndarray:
    """Column-wise inclusive cumsum of an (R, C) int32/float32 array.

    R must be a multiple of BLK (the binning capacities are). Matches
    jnp.cumsum(arr, axis=0) exactly for integer dtypes.
    """
    r, c = arr.shape
    assert r % BLK == 0, f'rows ({r}) must be a multiple of {BLK}'
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    n_steps = r // BLK
    return pl.pallas_call(
        _scan_kernel,
        out_shape=jax.ShapeDtypeStruct((r, c), arr.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(n_steps,),
            in_specs=[pl.BlockSpec((BLK, c), lambda k: (k, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((BLK, c), lambda k: (k, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((1, c), arr.dtype)],
        ),
        interpret=interpret,
    )(arr)
