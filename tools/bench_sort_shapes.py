"""DCE-safe sort-shape experiments for the two production wide sorts.

Round-4 question: the owner sort (1 key + 9 payload, ~1.2M rows) is the
dominant cost of the gradient reduction, and the stream-build sort
(2 keys + 10 payload) dominates binning. lax.sort cost scales with
rows x stages; sorting P independent parts batched along dim 0 cuts the
stage count (log^2 depth) and may vectorize better. The window reduction
kernel can consume P sorted parts with read-modify-write flushes, so a
batched owner sort is a drop-in IF it wins here.

Every output leaf is consumed (sum) and fed back into the inputs — a
single-element fetch lets XLA silently drop unused sort operands (seen
round 4: a 10-op sort became a 2-op sort and "measured" 4.5 ms).

Usage: python tools/bench_sort_shapes.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from fastergs_tpu.utils.compilation_cache import enable_persistent_cache
enable_persistent_cache()

REPS = 10
N_GAUSS = 150_000
T = 4346


def chain(fn):
    def run(*args):
        def body(i, carry):
            acc, a = carry
            out = fn(*a)
            v = jnp.float32(0.0)
            for leaf in jax.tree_util.tree_leaves(out):
                v = v + jnp.sum(leaf.astype(jnp.float32))
            zero = (v.astype(jnp.int32) * 0)
            a = tuple(x + zero.astype(x.dtype) for x in a)
            return acc + v, a
        acc, _ = jax.lax.fori_loop(0, REPS, body, (jnp.float32(0), args))
        return acc
    return jax.jit(run)


def timeit(name, fn, *args):
    t0 = time.perf_counter()
    out = fn(*args)
    float(np.asarray(out).ravel()[0])
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = fn(*args)
    float(np.asarray(out).ravel()[0])
    dt = (time.perf_counter() - t0) / REPS * 1e3
    print(f'{name:56s} {dt:8.2f} ms  (first {compile_s:5.1f} s)', flush=True)


def main():
    rng = np.random.default_rng(0)

    def mk(shape, hi):
        return jnp.asarray(rng.integers(0, hi, shape).astype(np.int32))

    def owner_ops(shape):
        own = mk(shape, N_GAUSS + 1)
        pay = [mk(shape, 1 << 30) for _ in range(9)]
        return own, pay

    def sort_flat(o, *ps):
        return jax.lax.sort((o,) + ps, num_keys=1, is_stable=False)

    # ---- owner-sort shapes ----
    I = 19 * (1 << 16)           # 1,245,184 = current train cap
    own, pay = owner_ops((I,))
    timeit('owner flat 10 ops @ 19*2^16', chain(sort_flat), own, *pay)

    own, pay = owner_ops((1 << 20,))
    timeit('owner flat 10 ops @ 2^20', chain(sort_flat), own, *pay)

    own, pay = owner_ops((1 << 21,))
    timeit('owner flat 10 ops @ 2^21', chain(sort_flat), own, *pay)

    for P, L in ((19, 1 << 16), (10, 1 << 17), (38, 1 << 15), (152, 1 << 13)):
        own, pay = owner_ops((P, L))
        timeit(f'owner batched 10 ops @ ({P}, 2^{L.bit_length()-1})',
               chain(sort_flat), own, *pay)

    # ---- stream-sort shapes (binning): 2 keys + 10 payload ----
    def stream_ops(n):
        tile = mk((n,), T + 1)
        depth = mk((n,), 1 << 30)
        pay = [mk((n,), 1 << 30) for _ in range(10)]
        return tile, depth, pay

    def sort_2k(t, d, *ps):
        return jax.lax.sort((t, d) + ps, num_keys=2, is_stable=False)

    def sort_fused(k, *ps):
        return jax.lax.sort((k,) + ps, num_keys=1, is_stable=False)

    I2 = 19 * (1 << 16)
    tile, depth, pay = stream_ops(I2)
    timeit('stream 12 ops num_keys=2 @ 19*2^16', chain(sort_2k),
           tile, depth, *pay)
    # fused (tile, depth) key: tile needs ceil(log2(T+2)) bits (13 here), so
    # only 32-13=19 depth bits fit. Pack in uint32 and flip the sign bit so
    # the i32 sort order equals the u32 order (tile << 19 overflows i32's
    # sign bit for tile >= 4096 — a raw i32 pack would NOT be tile-major).
    fused_u = (tile.astype(jnp.uint32) << 19) | (depth.astype(jnp.uint32) >> 13)
    fused = (fused_u ^ jnp.uint32(0x80000000)).astype(jnp.int32)
    timeit('stream fused-key 11 ops num_keys=1 @ 19*2^16',
           chain(sort_fused), fused, *pay)


if __name__ == '__main__':
    main()
