"""Split the owner-sort + segreduce reduction cost with trustworthy timing.

Each section is timed by materializing the FULL output to host once per
rep batch is too slow through the tunnel, so we chain reps with a data
dependency that cannot be DCE'd (feed a scalar derived from the output
back into the input) and fetch the full result at the end.

Usage: python tools/bench_reduce_split.py [n_inst] [n_gaussians]
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

from fastergs_tpu.ops.segreduce import reduce_by_gaussian, segment_reduce_rows, ROWS, STEP

N_INST = int(sys.argv[1]) if len(sys.argv) > 1 else 1_245_184
N_GAUSS = int(sys.argv[2]) if len(sys.argv) > 2 else 150_000
REPS = 10


def chain(fn):
    """fn(rows, own) -> out. Returns jitted REPS-chained version.

    EVERY output leaf is consumed by a full reduction — consuming a single
    element lets XLA dead-code-eliminate unused sort operands (a 10-op sort
    silently becomes a 2-op sort)."""
    def run(rows, own):
        def body(i, carry):
            acc, r = carry
            out = fn(r, own)
            v = jnp.float32(0.0)
            for leaf in jax.tree_util.tree_leaves(out):
                v = v + jnp.sum(jnp.asarray(leaf, jnp.float32))
            return acc + v, r + (0.0 * v).astype(r.dtype)
        acc, _ = jax.lax.fori_loop(0, REPS, body, (jnp.float32(0), rows))
        return acc
    return jax.jit(run)


def timeit(name, fn, *args):
    out = fn(*args)
    float(np.asarray(out).ravel()[0])
    t0 = time.perf_counter()
    out = fn(*args)
    float(np.asarray(out).ravel()[0])
    dt = (time.perf_counter() - t0) / REPS * 1e3
    print(f'{name:40s} {dt:8.2f} ms')


def main():
    rng = np.random.default_rng(0)
    # tile-ordered owner stream approximation: random owners (unsorted)
    own_raw = rng.integers(0, N_GAUSS, N_INST).astype(np.int32)
    rows = jnp.asarray(rng.standard_normal((9, N_INST)), jnp.float32)
    own = jnp.asarray(own_raw)
    own_sorted = jnp.sort(own)

    # full production reduction: sort + window kernel
    timeit('reduce_by_gaussian (sort + kernel)',
           chain(lambda r, o: reduce_by_gaussian(r, o, N_GAUSS)), rows, own)

    # sort alone (10 ops)
    def sort10(r, o):
        return jax.lax.sort((o,) + tuple(
            jax.lax.bitcast_convert_type(r[i], jnp.int32) for i in range(9)),
            num_keys=1, is_stable=False)
    timeit('owner sort alone (1 key + 9 payload)', chain(sort10), rows, own)

    # kernel alone on pre-sorted owners
    pad = jnp.zeros((ROWS - 9, N_INST), jnp.float32)
    rows16 = jnp.concatenate([rows, pad], axis=0)

    def ker(r, o):
        return segment_reduce_rows(r, o, N_GAUSS)
    timeit('window kernel alone (sorted owners)',
           chain(ker), rows16, own_sorted)


if __name__ == '__main__':
    main()
