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
One sequential pass walks the output slots in 1024-slot blocks while sliding
a two-window (2 x 128 entry) view over the Gaussian table:

- owner(slot) = max{i : starts[i] <= slot} = upper_bound - 1. The
  upper_bound over the 256 resident entries is computed for ALL 1024 block
  slots at once as ONE MXU matmul: pos = 1^T @ (startsT <= slots), a
  (256, 1024) 0/1 matrix contracted against ones (bf16 products are exact
  for 0/1, f32 accumulation exact below 2^24);
- the owner's 16 attribute rows are fetched with one (16, 128) lane gather
  per 128-slot group and per resident window (Mosaic's tpu.dynamic_gather
  only supports operands of exactly 128 lanes);
- a slot whose owner precedes the view (upper_bound == 0) belongs to the
  LAST entry of the window before it, kept as an explicit carry column;
- the view advances by one 128-entry window when the block's last slot
  resolves past the first window; windows arrive through a RINGW-deep
  prefetch ring of lane-aligned DMAs, and their starts are transposed to
  sublanes once per window on arrival;
- blocks whose owners span MORE than the resident view (rare: long culled
  runs) fall back to a per-group advance loop with the same matmul search
  over the single current window;
- zero-length segments (culled Gaussians) need no compaction: ties at a
  shared start offset resolve to the LAST row, which is exactly the
  segment's true owner.

The 16 attribute rows and the start offsets ride ONE stacked (24, N) input
so each window is a single DMA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B = 1024        # output slots per grid step
SUBB = 512      # slots per sub-block: the unit that must fit the 2-window
                # view (1024 slots can span >256 entries at low counts/slot)
GRP = 128       # gather group width == Mosaic gather lane width
W = 128         # Gaussian-row window (== gather lane width)
ROWS = 16       # attribute rows (sublane tiling multiple)
SROW = ROWS     # stacked-layout row holding the start offsets
STK = 24        # stacked rows incl. padding (sublane DMA slices need %8)
RINGW = 8       # window prefetch depth


def _ones_bf16(n):
    return jnp.ones((1, n), jnp.bfloat16)


def _count_leq(wsT, slots, width):
    """pos[l] = #(wsT[:, 0] <= slots[0, l]) via one MXU matmul.

    wsT: (n_entries, 1) i32 sorted; slots: (1, width) i32. Exact: bf16 0/1
    products, f32 accumulation. Returns (1, width) i32 in [0, n_entries].
    """
    n_entries = wsT.shape[0]
    cmp = (jnp.broadcast_to(wsT, (n_entries, width))
           <= jnp.broadcast_to(slots, (n_entries, width)))
    cmp16 = cmp.astype(jnp.bfloat16)
    pos = jax.lax.dot_general(_ones_bf16(n_entries), cmp16,
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    return pos.astype(jnp.int32)


def _fill_kernel(stk_hbm, out_blk, wbuf, wst, carry, grp_res, grp_fin, smem,
                 sems, *, n_rows: int):
    """out_blk[:, s] = rows[:, owner(k*B + s)].

    smem: [0] current window, [1] next window to fetch (ring top),
    [2] highest window waited (wsT computed). wbuf: (RINGW, STK, W) stacked
    windows; wst: (RINGW, W, 8) per-window transposed starts; carry: the
    last row of the window preceding the current one.
    """
    k = pl.program_id(0)
    n_win = n_rows // W

    def copy(w):
        slot = jax.lax.rem(w, RINGW)
        return pltpu.make_async_copy(
            stk_hbm.at[:, pl.ds(w * W, W)], wbuf.at[slot], sems.at[slot])

    def wait_one(w):
        """Completes window w's fetch and transposes its starts."""
        copy(w).wait()
        slot = jax.lax.rem(w, RINGW)
        ws_row = wbuf[slot, SROW:SROW + 1, :]                  # (1, W)
        wst[slot] = jnp.broadcast_to(ws_row, (8, W)).T         # (W, 8)

    def wait_upto(t):
        def body(wtd):
            wait_one(wtd + 1)
            return wtd + 1

        smem[2] = jax.lax.while_loop(lambda wtd: wtd < t, body, smem[2])

    def refill_one(c):
        """Starts the next window fetch if the ring has room."""
        top = smem[1]

        @pl.when((top < n_win) & (top < c + RINGW))
        def _():
            copy(top).start()
            smem[1] = top + 1

    @pl.when(k == 0)
    def _():
        smem[0] = 0
        carry[:, :] = jnp.zeros((ROWS, W), jnp.int32)
        for i in range(RINGW):
            @pl.when(i < n_win)
            def _(i=i):
                copy(jnp.int32(i)).start()
        smem[1] = jnp.minimum(RINGW, n_win)
        wait_one(jnp.int32(0))
        smem[2] = 0

    for sub in range(B // SUBB):
        _fill_subblock(k, sub, out_blk, wbuf, wst, carry, grp_res, grp_fin,
                       smem, n_win, wait_upto, refill_one)

    # last grid step: drain in-flight window fetches before kernel exit
    @pl.when(k == pl.num_programs(0) - 1)
    def _():
        def drain(w):
            copy(w).wait()
            return w + 1

        jax.lax.while_loop(lambda w: w < smem[1], drain, smem[2] + 1)


def _fill_subblock(k, sub, out_blk, wbuf, wst, carry, grp_res, grp_fin, smem,
                   n_win, wait_upto, refill_one):
    base = k * B + sub * SUBB
    c = smem[0]
    wait_upto(jnp.minimum(c + 1, n_win - 1))
    slot0 = jax.lax.rem(c, RINGW)
    slot1 = jax.lax.rem(c + 1, RINGW)
    have1 = c + 1 < n_win

    slots = base + jax.lax.broadcasted_iota(jnp.int32, (1, SUBB), 1)
    ws0T = wst[slot0][:, 0:1]                                  # (W, 1)
    ws1T = wst[slot1][:, 0:1]
    pos0 = _count_leq(ws0T, slots, SUBB)
    pos1 = _count_leq(ws1T, slots, SUBB) * have1.astype(jnp.int32)
    pos = pos0 + pos1                                          # (1, SUBB)

    # owners beyond the resident view force the slow path — unless the view
    # already reaches the end of the table (then entry 2W-1 IS the owner)
    view_is_end = c + 1 >= n_win - 1
    pos_max = jnp.max(pos)
    slow = (pos_max >= 2 * W) & jnp.logical_not(view_is_end)

    @pl.when(jnp.logical_not(slow))
    def _():
        rows0 = wbuf[slot0, 0:ROWS, :]                         # (16, W)
        rows1 = wbuf[slot1, 0:ROWS, :]
        for g in range(SUBB // GRP):
            posg = pos[:, g * GRP:(g + 1) * GRP]               # (1, GRP)
            pos16 = jnp.broadcast_to(posg, (ROWS, GRP))
            idx0 = jnp.clip(pos16 - 1, 0, W - 1)
            idx1 = jnp.clip(pos16 - 1 - W, 0, W - 1)
            g0 = jnp.take_along_axis(rows0, idx0, axis=1)
            g1 = jnp.take_along_axis(rows1, idx1, axis=1)
            out = jnp.where(pos16 == 0, carry[:, 0:GRP],
                            jnp.where(pos16 <= W, g0, g1))
            out_blk[:, sub * SUBB + g * GRP:
                    sub * SUBB + (g + 1) * GRP] = out

        # advance once when the block's last owner left the first window
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, SUBB), 1)
        pos_last = jnp.max(jnp.where(lane == SUBB - 1, pos, 0))

        @pl.when(pos_last > W)
        def _():
            carry[:, :] = jnp.broadcast_to(rows0[:, W - 1:W], (ROWS, W))
            refill_one(c + 1)
            smem[0] = c + 1
            wait_upto(jnp.minimum(c + 2, n_win - 1))

    @pl.when(slow)
    def _():
        # rare: the sub-block's owners span beyond the two resident windows
        # (long culled runs). Per-group single-window advance loop.
        for g in range(SUBB // GRP):
            slots_g = (base + g * GRP
                       + jax.lax.broadcasted_iota(jnp.int32, (1, GRP), 1))
            grp_fin[:, :] = jnp.zeros((8, GRP), jnp.int32)

            def body(_, slots_g=slots_g):
                finald = grp_fin[0:1, :] > 0                   # (1, GRP)
                cc = smem[0]
                sl = jax.lax.rem(cc, RINGW)
                posg = _count_leq(wst[sl][:, 0:1], slots_g, GRP)
                pos16 = jnp.broadcast_to(posg, (ROWS, GRP))
                rows_c = wbuf[sl, 0:ROWS, :]
                idx = jnp.clip(pos16 - 1, 0, W - 1)
                gathered = jnp.take_along_axis(rows_c, idx, axis=1)
                gathered = jnp.where(pos16 == 0, carry[:, 0:GRP], gathered)
                ok = (posg < W) | (cc >= n_win - 1)            # (1, GRP)
                fin16 = jnp.broadcast_to(finald, (ROWS, GRP))
                grp_res[:, :] = jnp.where(fin16, grp_res[:, :], gathered)
                new_fin = finald | ok
                grp_fin[:, :] = jnp.broadcast_to(new_fin, (8, GRP)).astype(
                    jnp.int32)
                done = jnp.all(new_fin)

                @pl.when(jnp.logical_not(done))
                def _():
                    carry[:, :] = jnp.broadcast_to(rows_c[:, W - 1:W],
                                                   (ROWS, W))
                    refill_one(cc + 1)
                    smem[0] = cc + 1
                    wait_upto(cc + 1)

                return done

            jax.lax.while_loop(lambda done: jnp.logical_not(done), body,
                               jnp.bool_(False))
            out_blk[:, sub * SUBB + g * GRP:
                    sub * SUBB + (g + 1) * GRP] = grp_res[:, :]


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
                pltpu.VMEM((RINGW, W, 8), jnp.int32),          # starts^T
                pltpu.VMEM((ROWS, W), jnp.int32),              # carry rows
                pltpu.VMEM((ROWS, GRP), jnp.int32),            # group result
                pltpu.VMEM((8, GRP), jnp.int32),               # group finald
                pltpu.SMEM((3,), jnp.int32),
                pltpu.SemaphoreType.DMA((RINGW,)),
            ],
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(stacked)
