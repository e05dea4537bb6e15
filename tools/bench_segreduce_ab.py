"""A/B timing of the production gradient reduction (sort + window kernel).

Host-chained reps (each call consumes a scalar of the previous output) —
the tunnel dispatch latency biases all variants equally, which is fine for
an A/B. The r4 chained-fori harness (bench_reduce_split.py) compiles for
>20 min on the tunneled backend; this one compiles in ~1 min.

Usage: python tools/bench_segreduce_ab.py [n_inst] [n_gaussians]
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

from fastergs_tpu.ops.segreduce import reduce_by_gaussian, segment_reduce_rows

N_INST = int(sys.argv[1]) if len(sys.argv) > 1 else 1_245_184
N_GAUSS = int(sys.argv[2]) if len(sys.argv) > 2 else 150_000
REPS = 20


def timeit(name, fn, *args):
    t0 = time.perf_counter()
    out = fn(*args)
    float(np.asarray(out).ravel()[0])
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    bump = jnp.float32(0.0)
    for _ in range(REPS):
        out = fn(*(a + bump.astype(a.dtype) for a in args))
        bump = 0.0 * jnp.asarray(out).ravel()[0].astype(jnp.float32)
    float(np.asarray(out).ravel()[0])
    dt = (time.perf_counter() - t0) / REPS * 1e3
    print(f'{name:44s} {dt:8.2f} ms  (first {compile_s:5.1f} s)', flush=True)


def main():
    rng = np.random.default_rng(0)
    own = jnp.asarray(rng.integers(0, N_GAUSS, N_INST).astype(np.int32))
    rows = jnp.asarray(rng.standard_normal((9, N_INST)), jnp.float32)
    own_sorted = jnp.sort(own)

    full = jax.jit(lambda r, o: reduce_by_gaussian(r, o, N_GAUSS))
    timeit(f'reduce_by_gaussian (sort+kernel) @ {N_INST}', full, rows, own)

    ker = jax.jit(lambda r, o: segment_reduce_rows(
        [r[i] for i in range(9)], o, N_GAUSS))
    timeit(f'window kernel alone (sorted) @ {N_INST}', ker, rows, own_sorted)


if __name__ == '__main__':
    main()
