"""Per-Gaussian gradient reduction: owner-sorted instance rows -> per-owner sums.

`segment_reduce_rows` accepts a sequence of up-to-ROWS (I,) f32 rows (or one
stacked (ROWS, I) array) plus non-decreasing owner ids and returns
(n_rows, n_owners + 1) per-owner sums; `reduce_by_gaussian` adds the owner
sort in front for unsorted streams.

The deterministic TPU analog of the reference's atomicAdd gradient
accumulation (reference: kernels_backward.cuh:459-470). XLA lowers
`.at[idx].add` to a row-latency-bound scatter (~12 ns/row, ~20 ms at
garden scale); instead we sort the rows by owner id (wide TPU sorts are
bandwidth-bound and nearly free at power-of-two lengths — see
ops/tiles.py:build_tile_instances_stream) and run a sequential Pallas
window kernel that turns the sorted runs into per-owner sums with one-hot
MXU matmuls: owners fall into fixed 512-wide windows; each grid step
accumulates its instances into the current window accumulator in VMEM and
flushes finalized windows to HBM with lane-aligned DMAs. Pure bandwidth +
trivial MXU work.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fastergs_tpu.constants import sort_pad_len

STEP = 512     # instances per grid step
W = 512        # owner-window width (lane-aligned flush DMAs)
ROWS = 16      # field rows (sublane tiling multiple; rows 0-8 carry data)


def _iota2(shape, dim):
    return jax.lax.broadcasted_iota(jnp.int32, shape, dim)


def _reduce_kernel(own_blk, *refs, n_steps: int, n_windows: int,
                   n_rows: int):
    """Sequential pass over owner-sorted rows.

    smem: [0] current window index. acc: (ROWS, W) accumulator for the
    current window. Owners are NON-DECREASING across the stream, so each
    window is finalized exactly once; windows with no instances keep the
    zero-aliased output. Flushes are inline start+wait: they are rare
    (~N/W + n_steps total) and tiny (32 KB), and conditional cross-step
    semaphore state measurably stalls the Mosaic pipeline (~seconds/step).

    The one-hot placement matrix is built TRANSPOSED, entirely in lane
    space: onehot_T[w, i] = (own[i] == j*W + w) is a (W, 1) iota against
    the (1, STEP) owner row — no lane->sublane transpose of the owners
    exists anywhere. (Round-5 history: the original kernel transposed the
    owners with two HIGHEST (STEP, STEP) x (STEP, 1) identity matvecs per
    grid step — measured as ~2/3 of the kernel's entire runtime; passing
    the owners as a (STEP, 1) block instead forces a 128x-padded tiled
    relayout XLA-side, which is even slower.) The accumulation contracts
    rows (ROWS, STEP) with onehot_T (W, STEP) along dim 1 of BOTH
    operands — the MXU streams the transposed-rhs form natively.

    The data rows arrive as n_rows SEPARATE (1, STEP) refs (the sort's
    output columns) instead of one stacked (ROWS, I) array: stacking and
    zero-padding 16 rows at garden scale materializes ~125 MB of pure
    relayout copies per step — assembling the (ROWS, STEP) block from the
    row refs inside the kernel is free by comparison.
    """
    row_refs = refs[:n_rows]
    _zeros_ref, out_hbm, acc, smem, sems = refs[n_rows:]
    k = pl.program_id(0)

    @pl.when(k == 0)
    def _():
        smem[0] = 0
        acc[:] = jnp.zeros((ROWS, W), jnp.float32)

    own = own_blk[0:1, :]                                   # (1, STEP) i32
    win = own // W
    pad_rows = ([jnp.zeros((ROWS - n_rows, STEP), jnp.float32)]
                if n_rows < ROWS else [])
    rows = jnp.concatenate([r[0:1, :] for r in row_refs] + pad_rows, axis=0)
    sub_w = _iota2((W, 1), 0)                               # (W, 1) i32
    max_win = jnp.max(win)

    def flush(j):
        cp = pltpu.make_async_copy(
            acc, out_hbm.at[:, pl.ds(pl.multiple_of(j * W, W), W)], sems)
        cp.start()
        cp.wait()
        acc[:] = jnp.zeros((ROWS, W), jnp.float32)

    # hi/lo split of the data rows, computed once per grid step: the
    # accumulation matmul's one-hot side is EXACTLY representable in bf16,
    # so rows = hi + lo (two bf16 limbs, ~16 mantissa bits) makes the
    # placement product exact to ~1e-5 relative in TWO default-precision
    # MXU passes instead of HIGHEST's six — the matmul is this kernel's
    # dominant cost (M=16 of 128 sublanes is already only 12.5% utilized)
    rows_hi = rows.astype(jnp.bfloat16)
    rows_lo = (rows - rows_hi.astype(jnp.float32)).astype(jnp.bfloat16)

    def _place(data_bf, onehot_t_bf):
        # contract STEP on dim 1 of BOTH operands: (ROWS, STEP) x (W, STEP)
        # -> (ROWS, W); the transposed-rhs form needs no operand transpose
        return jax.lax.dot_general(
            data_bf, onehot_t_bf, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    def body(state):
        j, done, it = state
        # onehot_T[w, i] = (own[i] == j*W + w): window membership AND
        # in-window position in ONE lane-space compare
        onehot_t = jnp.where(own == j * W + sub_w, 1.0, 0.0)   # (W, STEP)
        onehot_t_bf = onehot_t.astype(jnp.bfloat16)            # 0/1: exact
        acc[:] += _place(rows_hi, onehot_t_bf) + _place(rows_lo, onehot_t_bf)
        done_here = max_win <= j

        @pl.when(jnp.logical_not(done_here) & (j < n_windows))
        def _():
            flush(j)

        nxt = jnp.min(jnp.where(win > j, win, n_windows))
        return jnp.where(done_here, j, nxt), done_here, it + 1

    j0 = smem[0]
    j, _, _ = jax.lax.while_loop(lambda s: jnp.logical_not(s[1]), body,
                                 (j0, jnp.bool_(False), jnp.int32(0)))
    smem[0] = j

    @pl.when(k == n_steps - 1)
    def _():
        jf = smem[0]

        @pl.when(jf < n_windows)
        def _():
            flush(jf)


def segment_reduce_rows(rows, own: jnp.ndarray,
                        n_owners: int, interpret=None) -> jnp.ndarray:
    """rows: (ROWS, I) f32 instance rows OR a sequence of up-to-ROWS (I,)
    f32 rows (passed to the kernel as separate refs — no stacked array is
    ever materialized). own: (I,) i32 NON-DECREASING owner ids in
    [0, n_owners]. Returns (ROWS-or-n_rows, n_owners + 1) per-owner sums
    (the last column collects the sentinel id n_owners).

    Owners must be sorted ascending (sort upstream with the wide
    bandwidth-bound TPU sort). I must be a multiple of STEP.
    """
    n_inst = own.shape[0]
    assert n_inst % STEP == 0, 'instance count must be STEP-aligned'
    if isinstance(rows, jnp.ndarray):
        assert rows.shape[1] == n_inst
        row_list = [rows[r] for r in range(rows.shape[0])]
    else:
        row_list = list(rows)
    n_rows = len(row_list)
    assert n_rows <= ROWS
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    n_windows = -(-(n_owners + 1) // W)  # +1: sentinel id == n_owners
    n_pad = n_windows * W
    n_steps = n_inst // STEP

    out = pl.pallas_call(
        functools.partial(_reduce_kernel, n_steps=n_steps,
                          n_windows=n_windows, n_rows=n_rows),
        out_shape=jax.ShapeDtypeStruct((ROWS, n_pad), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(n_steps,),
            in_specs=[
                pl.BlockSpec((1, STEP), lambda k: (0, k),
                             memory_space=pltpu.VMEM),     # owners
            ] + [
                pl.BlockSpec((1, STEP), lambda k: (0, k),
                             memory_space=pltpu.VMEM)      # one per data row
                for _ in range(n_rows)
            ] + [
                pl.BlockSpec(memory_space=pl.ANY),         # zeros alias
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM((ROWS, W), jnp.float32),        # accumulator
                pltpu.SMEM((2,), jnp.int32),
                pltpu.SemaphoreType.DMA(()),
            ],
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        input_output_aliases={1 + n_rows: 0},
    )(own.reshape(1, n_inst),
      *[r.reshape(1, n_inst) for r in row_list],
      jnp.zeros((ROWS, n_pad), jnp.float32))
    return out[:n_rows, :n_owners + 1]


def reduce_by_gaussian(rows_t: jnp.ndarray, own: jnp.ndarray,
                       n_gaussians: int, n_data_rows: int = 9,
                       interpret=None) -> jnp.ndarray:
    """Sorts (ROWS_any, I) instance rows by owner and segment-reduces them.

    own may contain the sentinel id n_gaussians (dropped slots; their sums
    land in a discarded extra row). Returns (n_data_rows, n_gaussians).
    The sort carries only the data rows (bandwidth-bound payload).
    """
    n_inst = own.shape[0]
    # sort at aligned lengths only (see constants.sort_pad_len: wide
    # variadic TPU sorts at arbitrary lengths can take minutes to compile);
    # pad slots carry the sentinel owner and zero rows (summed into the
    # discarded extra row)
    sort_len = max(sort_pad_len(n_inst), STEP)
    pad_n = sort_len - n_inst
    ops_in = [own] + [jax.lax.bitcast_convert_type(rows_t[r], jnp.int32)
                      for r in range(n_data_rows)]
    if pad_n:
        ops_in = [jnp.concatenate(
            [o, jnp.full((pad_n,), v, jnp.int32)])
            for o, v in zip(ops_in, [n_gaussians] + [0] * n_data_rows)]
    ops = jax.lax.sort(tuple(ops_in), num_keys=1, is_stable=False)
    sorted_own = ops[0]
    sorted_rows = [jax.lax.bitcast_convert_type(o, jnp.float32)
                   for o in ops[1:]]
    out = segment_reduce_rows(sorted_rows, sorted_own,
                              n_gaussians, interpret=interpret)
    return out[:n_data_rows, :n_gaussians]
