"""Segment fill: broadcast per-Gaussian rows to their instance slots (Pallas).

The binning expansion must materialize, for every instance slot, the
attributes of its owning Gaussian (reference counterpart: create_instances_cu
enumerates per-primitive tile instances warp-cooperatively,
kernels_forward.cuh:225-329). Round 1 solved slot->owner with a delta
scatter at segment starts + column cumsum (exact in modular i32 — see
ops/tiles.py:_segment_fill_int); measured on v5e the scatter costs ~11 ms at
garden scale because XLA lowers scatters to row-serial updates even with
sorted unique indices.

This kernel exploits what the scatter lowering cannot: `starts` is SORTED.
One sequential pass walks the output slots in 128-lane groups while sliding
a 128-entry window over the Gaussian table (Mosaic's lane gather —
tpu.dynamic_gather — only supports operands of EXACTLY 128 lanes, so both
the search probes and the row fetch are built on (sublanes, 128) tiles):

- owner(slot) = max{i : starts[i] <= slot}, found with an 8-step binary
  search over the window's start offsets (lane gathers on a sublane-
  broadcast (8, 128) tile);
- the owner's 16 attribute rows are fetched with ONE (16, 128) lane gather;
- the window advances by exactly 128 rows (lane-aligned HBM DMA starts)
  through a RINGW-deep prefetch ring — windows are consumed strictly in
  order, so RINGW fetches stay in flight and the per-window DMA latency
  (~4 us, the whole cost of the naive inline start+wait version) is hidden;
- a slot whose owner precedes the window (upper_bound == 0) belongs to the
  LAST entry of the previous window, kept as an explicit carry column;
- zero-length segments (culled Gaussians) need no compaction: ties at a
  shared start offset resolve to the LAST row, which is exactly the
  segment's true owner.

The 16 attribute rows and the start offsets ride ONE stacked (17, N) input
so each window is a single DMA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B = 1024        # output slots per grid step (8 sequential 128-slot groups)
GRP = 128       # slots per group == Mosaic gather lane width
W = 128         # Gaussian-row window (== gather lane width)
ROWS = 16       # attribute rows (sublane tiling multiple)
SROW = ROWS     # stacked-layout row holding the start offsets
STK = 24        # stacked rows incl. padding (sublane DMA slices need %8)
RINGW = 8       # window prefetch depth


def _fill_kernel(stk_hbm, out_blk, wbuf, carry, grp_res, grp_fin, smem, sems,
                 *, n_rows: int):
    """out_blk[:, g*128+s] = rows[:, owner(k*B + g*128 + s)].

    smem: [0] current window, [1] next window to fetch (top of the ring).
    wbuf: (RINGW, 17, W) stacked windows; carry: previous window's last row.
    """
    k = pl.program_id(0)
    n_win = n_rows // W

    def copy(w):
        slot = jax.lax.rem(w, RINGW)
        return pltpu.make_async_copy(
            stk_hbm.at[:, pl.ds(w * W, W)], wbuf.at[slot], sems.at[slot])

    @pl.when(k == 0)
    def _():
        smem[0] = 0
        carry[:, :] = jnp.zeros((ROWS, W), jnp.int32)
        for i in range(RINGW):
            @pl.when(i < n_win)
            def _(i=i):
                copy(jnp.int32(i)).start()
        smem[1] = jnp.minimum(RINGW, n_win)
        copy(jnp.int32(0)).wait()

    # per-group while loops carry ONLY a scalar done flag (Mosaic cannot
    # reconcile broadcast-layout vectors across scf.while yields); the
    # group's result/finald live in VMEM scratch instead
    for g in range(B // GRP):
        slots = (k * B + g * GRP
                 + jax.lax.broadcasted_iota(jnp.int32, (8, GRP), 1))
        grp_fin[:, :] = jnp.zeros((8, GRP), jnp.int32)

        def body(_, slots=slots):
            finald = grp_fin[:, :] > 0                         # (8, GRP)
            cur = smem[0]
            cur_slot = jax.lax.rem(cur, RINGW)
            ws = jnp.broadcast_to(wbuf[cur_slot, SROW:SROW + 1, :], (8, W))
            # upper_bound: pos = #(ws <= slot) in [0, W], ws sorted ascending
            pos = jnp.zeros((8, GRP), jnp.int32)
            step = W
            while step >= 1:
                cand = pos + step
                probe = jnp.take_along_axis(
                    ws, jnp.minimum(cand - 1, W - 1), axis=1)
                pos = jnp.where((cand <= W) & (probe <= slots), cand, pos)
                step //= 2
            owner = jnp.clip(pos - 1, 0, W - 1)
            pos16 = jnp.broadcast_to(pos[0:1, :], (ROWS, GRP))
            idx16 = jnp.broadcast_to(owner[0:1, :], (ROWS, GRP))
            win_rows = wbuf[cur_slot, 0:ROWS, :]               # (16, W)
            gathered = jnp.take_along_axis(win_rows, idx16, axis=1)
            # upper_bound == 0: the owner is the previous window's last row
            gathered = jnp.where(pos16 == 0, carry[:, :], gathered)
            is_last_win = cur >= n_win - 1
            fin16 = jnp.broadcast_to(finald[0:1, :], (ROWS, GRP))
            grp_res[:, :] = jnp.where(fin16, grp_res[:, :], gathered)
            finald = finald | (pos < W) | is_last_win
            grp_fin[:, :] = finald.astype(jnp.int32)
            done = jnp.all(finald[0:1, :])

            @pl.when(jnp.logical_not(done))
            def _():
                # advance: keep the window's last row as the carry column,
                # refill the freed ring slot, wait the next window's fetch
                carry[:, :] = jnp.broadcast_to(
                    wbuf[cur_slot, 0:ROWS, W - 1:W], (ROWS, W))
                top = smem[1]

                @pl.when(top < n_win)
                def _():
                    copy(top).start()
                    smem[1] = top + 1

                w2 = cur + 1
                smem[0] = w2
                copy(w2).wait()

            return done

        jax.lax.while_loop(lambda done: jnp.logical_not(done), body,
                           jnp.bool_(False))
        out_blk[:, g * GRP:(g + 1) * GRP] = grp_res[:, :]

    # last grid step: drain in-flight window fetches before kernel exit
    @pl.when(k == pl.num_programs(0) - 1)
    def _():
        def drain(w):
            copy(w).wait()
            return w + 1

        jax.lax.while_loop(lambda w: w < smem[1], drain, smem[0] + 1)


def can_use_fill_kernel(n_rows: int, cap: int) -> bool:
    return cap % B == 0 and n_rows >= W and n_rows % W == 0


def segment_fill_rows(rows_t: jnp.ndarray, starts: jnp.ndarray, cap: int,
                      interpret=None) -> jnp.ndarray:
    """rows_t: (ROWS, N) i32 per-Gaussian attribute rows; starts: (N,) i32
    NON-DECREASING segment start offsets (starts[0] == 0; zero-length
    segments allowed). Returns (ROWS, cap) i32 with out[:, s] =
    rows_t[:, owner(s)]; slots past the last segment repeat the final row
    (callers mask them via their slot < total tests).
    """
    n_rows = rows_t.shape[1]
    assert rows_t.shape == (ROWS, n_rows)
    assert can_use_fill_kernel(n_rows, cap), (n_rows, cap)
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    n_steps = cap // B
    stacked = jnp.concatenate(
        [rows_t, starts.reshape(1, n_rows),
         jnp.zeros((STK - ROWS - 1, n_rows), jnp.int32)], axis=0)
    return pl.pallas_call(
        functools.partial(_fill_kernel, n_rows=n_rows),
        out_shape=jax.ShapeDtypeStruct((ROWS, cap), jnp.int32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(n_steps,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),       # stacked (24, N)
            ],
            out_specs=pl.BlockSpec((ROWS, B), lambda k: (0, k),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((RINGW, STK, W), jnp.int32),        # window ring
                pltpu.VMEM((ROWS, W), jnp.int32),              # carry rows
                pltpu.VMEM((ROWS, GRP), jnp.int32),            # group result
                pltpu.VMEM((8, GRP), jnp.int32),               # group finald
                pltpu.SMEM((2,), jnp.int32),
                pltpu.SemaphoreType.DMA((RINGW,)),
            ],
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(stacked)
