"""Isolate the cost drivers of the owner-sort + segreduce backward
reduction (ops/segreduce.py) at garden scale on the real chip.

Sections:
  sort10     the 10-op owner sort alone (key + 9 payload rows)
  seg-cur    segment_reduce_rows as shipped (HIGHEST one-hot matmul)
  seg-nomm   variant kernel: matmul replaced by a trivial row sum
             (isolates grid/loop/flush overhead from MXU work)
  seg-def    variant: DEFAULT (bf16 1-pass) one-hot matmul — onehot side
             is exactly bf16; data side rounds (precision floor probe)
  full       reduce_by_gaussian (sort + kernel, production entry)

Usage: python tools/microbench_segreduce_r4.py [n_inst] [n_gaussians]
Development tool; prints ms per section.
"""

import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, '/root/repo')

from fastergs_tpu.ops import segreduce
from fastergs_tpu.ops.segreduce import (
    STEP, W, ROWS, _reduce_kernel, _to_sub, _iota2, segment_reduce_rows,
    reduce_by_gaussian)

N_INST = int(sys.argv[1]) if len(sys.argv) > 1 else 1_245_184
N_GAUSS = int(sys.argv[2]) if len(sys.argv) > 2 else 150_000
REPS = 10


def timed(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) * 1e3 / REPS


def variant_kernel(own_blk, rows_blk, zeros_ref, out_hbm, acc, smem, sems,
                   n_steps: int, n_windows: int, mode: str):
    """_reduce_kernel with the accumulation matmul swapped per mode."""
    del zeros_ref
    k = pl.program_id(0)

    @pl.when(k == 0)
    def _():
        smem[0] = 0
        acc[:] = jnp.zeros((ROWS, W), jnp.float32)

    own = own_blk[0:1, :]
    win = own // W
    win_sub = _to_sub(win)
    ol_sub = _to_sub(own - win * W)
    rows = rows_blk[:, :]
    lane_w = _iota2((1, W), 1).astype(jnp.float32)
    max_win = jnp.max(win)

    def flush(j):
        cp = pltpu.make_async_copy(
            acc, out_hbm.at[:, pl.ds(pl.multiple_of(j * W, W), W)], sems)
        cp.start()
        cp.wait()
        acc[:] = jnp.zeros((ROWS, W), jnp.float32)

    def body(state):
        j, done, it = state
        sel = (win_sub == j.astype(jnp.float32))
        onehot = jnp.where(sel, (ol_sub == lane_w).astype(jnp.float32), 0.0)
        if mode == 'nomm':
            # no placement matmul: accumulate a broadcast row sum (wrong
            # result, same memory/loop structure)
            acc[:] += jnp.sum(rows, axis=1, keepdims=True) + onehot[:1, :1]
        elif mode == 'default':
            acc[:] += jax.lax.dot_general(
                rows.astype(jnp.bfloat16), onehot.astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        elif mode == 'split3':
            # one-sided exact split: the one-hot side is exactly bf16;
            # the data side splits into 3 mantissa-disjoint bf16 terms
            # (bits via shifts — int literals inline in Mosaic) whose
            # partial products are exact -> 3 DEFAULT passes == HIGHEST
            ob = onehot.astype(jnp.bfloat16)
            rem = rows
            part = jnp.zeros_like(acc[:])
            for i in range(3):
                if i < 2:
                    bits = jax.lax.bitcast_convert_type(rem, jnp.int32)
                    hi = jax.lax.bitcast_convert_type(
                        jax.lax.shift_left(
                            jax.lax.shift_right_logical(bits, 16), 16),
                        jnp.float32)
                else:
                    hi = rem
                part += jax.lax.dot_general(
                    hi.astype(jnp.bfloat16), ob, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                rem = rem - hi
            acc[:] += part
        else:
            acc[:] += jax.lax.dot_general(
                rows, onehot, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
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


def run_variant(rows_t, own, n_owners, mode):
    n_inst = own.shape[0]
    n_windows = -(-(n_owners + 1) // W)
    n_pad = n_windows * W
    n_steps = n_inst // STEP
    out = pl.pallas_call(
        functools.partial(variant_kernel, n_steps=n_steps,
                          n_windows=n_windows, mode=mode),
        out_shape=jax.ShapeDtypeStruct((ROWS, n_pad), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(n_steps,),
            in_specs=[
                pl.BlockSpec((1, STEP), lambda k: (0, k),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((ROWS, STEP), lambda k: (0, k),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM((ROWS, W), jnp.float32),
                pltpu.SMEM((2,), jnp.int32),
                pltpu.SemaphoreType.DMA(()),
            ],
        ),
        interpret=jax.default_backend() != 'tpu',
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        input_output_aliases={2: 0},
    )(own.reshape(1, n_inst), rows_t, jnp.zeros((ROWS, n_pad), jnp.float32))
    return out[:, :n_owners + 1]


def main():
    rng = np.random.default_rng(0)
    # realistic owner distribution: each instance picks a Gaussian with
    # multiplicity ~8 (sorted ascending, as the production sort produces)
    own_np = np.sort(rng.integers(0, N_GAUSS, N_INST)).astype(np.int32)
    rows_np = rng.normal(0, 1, (ROWS, N_INST)).astype(np.float32)
    rows_np[9:] = 0.0
    own = jnp.asarray(own_np)
    rows_t = jnp.asarray(rows_np)
    rows9 = rows_t[:9]
    # pre-sorted inputs for kernel-only sections
    print(f'n_inst={N_INST:,} n_gaussians={N_GAUSS:,} '
          f'steps={N_INST // STEP}', flush=True)

    sort_fn = jax.jit(lambda o, r: jax.lax.sort(
        tuple([o] + [jax.lax.bitcast_convert_type(r[i], jnp.int32)
                     for i in range(9)]), num_keys=1, is_stable=False)[0])
    print(f'sort10    {timed(sort_fn, own, rows9):8.2f} ms', flush=True)

    seg = jax.jit(functools.partial(segment_reduce_rows,
                                    n_owners=N_GAUSS))
    print(f'seg-cur   {timed(lambda: seg(rows_t, own)):8.2f} ms',
          flush=True)

    for mode in ('nomm', 'default', 'split3'):
        f = jax.jit(functools.partial(run_variant, n_owners=N_GAUSS,
                                      mode=mode))
        print(f'seg-{mode:5s} {timed(lambda: f(rows_t, own)):8.2f} ms',
              flush=True)

    full = jax.jit(functools.partial(reduce_by_gaussian,
                                     n_gaussians=N_GAUSS))
    print(f'full      {timed(lambda: full(rows9, own)):8.2f} ms',
          flush=True)

    # correctness spot check vs numpy f64
    want = np.zeros((9, N_GAUSS), np.float64)
    np.add.at(want.T, own_np, rows_np[:9].T.astype(np.float64))
    split3_fn = jax.jit(functools.partial(run_variant, n_owners=N_GAUSS,
                                          mode='split3'))
    for name, fn in (('seg-cur', lambda: seg(rows_t, own)),
                     ('split3', lambda: split3_fn(rows_t, own))):
        got = np.asarray(fn())[:9, :N_GAUSS]
        err = np.max(np.abs(got - want) / np.maximum(np.abs(want), 1e-3))
        print(f'{name} max rel err vs f64: {err:.2e}', flush=True)


if __name__ == '__main__':
    main()
