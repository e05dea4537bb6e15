"""Round-4 sort experiments: can the binning sort get cheaper?

Variants of the production tile-instance sort (12 i32 operands at 2^21):
  A. current: (tile, depth, own, 9 payload) num_keys=2
  B. fused single key (tile << 19 | depth19), num_keys=1, same payload
  C. fused key at a NON-power-of-two length (compile + runtime cost)
  D. fused key + only 6 payload operands (bf16-packed field pairs)

Also times the owner-sort shape used by the gradient reduction
(1 key + 9 payload). Development tool; prints ms per run and compile secs.
"""

import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from fastergs_tpu.utils.compilation_cache import enable_persistent_cache

enable_persistent_cache()

I = 1 << 21
I_NP2 = 1_310_720     # non-power-of-two candidate capacity
T = 4346              # garden tiles
N = 262_144
REPS = 10


def _fetch(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.asarray(leaf, jnp.float32).ravel()[0])


def timeit(name, fn, *args):
    t0 = time.perf_counter()
    out = fn(*args)
    _fetch(out)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = fn(*args)
    _fetch(out)
    dt = (time.perf_counter() - t0) / REPS * 1e3
    print(f'{name:52s} {dt:8.2f} ms   (first call {compile_s:6.1f} s)')
    return out


def rep(fn, n=REPS):
    def run(*args):
        def body(i, carry):
            acc, a = carry
            out = fn(*a)
            leaf = jax.tree_util.tree_leaves(out)[0]
            v = jnp.asarray(leaf, jnp.float32).ravel()[0]
            a = (a[0] + (0 * v).astype(a[0].dtype),) + a[1:]
            return acc + v, a
        acc, _ = jax.lax.fori_loop(0, n, body, (jnp.float32(0.0), args))
        return acc
    return jax.jit(run)


def main():
    rng = np.random.default_rng(0)

    def make(n):
        tile = rng.integers(0, T + 1, n).astype(np.int32)
        depth = rng.integers(0, 1 << 30, n).astype(np.int32)
        own = rng.integers(0, N + 1, n).astype(np.int32)
        pay = [rng.integers(-(1 << 30), 1 << 30, n).astype(np.int32)
               for _ in range(9)]
        return (jnp.asarray(tile), jnp.asarray(depth), jnp.asarray(own),
                [jnp.asarray(p) for p in pay])

    tile, depth, own, pay = make(I)
    print(f'I={I}  I_np2={I_NP2}  T={T}')

    # A: current production sort
    def sort_a(t, d, o, *ps):
        return jax.lax.sort((t, d, o) + ps, num_keys=2, is_stable=False)

    timeit('A: 12 ops, num_keys=2, 2^21', rep(sort_a), tile, depth, own, *pay)

    # B: fused single key
    key = (tile.astype(jnp.uint32) << jnp.uint32(19)) | (
        depth.astype(jnp.uint32) >> jnp.uint32(13))
    sign_flip = jnp.int32(-(1 << 31))  # flip sign bit: u32 order as i32

    def sort_b(k, o, *ps):
        return jax.lax.sort((k, o) + ps, num_keys=1, is_stable=False)

    timeit('B: fused u32 key, 11 ops, num_keys=1, 2^21', rep(sort_b),
           key.astype(jnp.int32) ^ sign_flip, own, *pay)

    # B2: fused key + keep full depth as payload (exactness recoverable?)
    def sort_b2(k, d, o, *ps):
        return jax.lax.sort((k, d, o) + ps, num_keys=2, is_stable=False)

    timeit('B2: fused key + depth tiebreak (num_keys=2)', rep(sort_b2),
           key.astype(jnp.int32) ^ sign_flip, depth, own, *pay)

    # C: non-power-of-two length
    t2, d2, o2, p2 = make(I_NP2)
    k2 = (t2.astype(jnp.uint32) << jnp.uint32(19)) | (
        d2.astype(jnp.uint32) >> jnp.uint32(13))
    timeit('C: fused key, 11 ops, 1,310,720 (np2)', rep(sort_b),
           k2.astype(jnp.int32) ^ sign_flip, o2, *p2)

    # C2: current 12-op 2-key at np2 length
    timeit('C2: 12 ops num_keys=2, 1,310,720 (np2)', rep(sort_a),
           t2, d2, o2, *p2)

    # D: fused key + 6 payload ops
    def sort_d(k, o, *ps):
        return jax.lax.sort((k, o) + ps, num_keys=1, is_stable=False)

    timeit('D: fused key, 2+5 ops, 2^21', rep(sort_d),
           key.astype(jnp.int32) ^ sign_flip, own, *pay[:5])

    # owner-sort shape (gradient reduction): 1 key + 9 payload @ 2^21
    def sort_own(o, *ps):
        return jax.lax.sort((o,) + ps, num_keys=1, is_stable=False)

    timeit('owner sort: 10 ops num_keys=1, 2^21', rep(sort_own), own, *pay)

    t3, d3, o3, p3 = make(1 << 20)
    timeit('A at 2^20 (reference point)', rep(sort_a), t3, d3, o3, *p3)


if __name__ == '__main__':
    main()
