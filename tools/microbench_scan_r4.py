"""Round-4 scan experiments: the segmented lane cumsum is the dominant MXU
load of the blend kernels (two (P=256, C=128) @ (C, C) HIGHEST tri-matmuls
per 128-instance sub-chunk).

Variants (all inside a representative Pallas kernel so Mosaic lowering and
pipelining are real):
  A. current: HIGHEST (6-pass) f32 tri matmul
  B. one-sided 3-way bf16 split (tri is EXACTLY bf16-representable; the
     data side splits into 3 bf16 terms carrying the full 24-bit mantissa)
     -> 3 DEFAULT passes, f32 accumulate: bit-comparable to HIGHEST
  C. one-sided 2-way split (16-bit effective mantissa)
  D. VPU log-step shifted-add scan (exact f32 adds, no MXU)

Prints ms per variant + max abs error vs the f64 oracle. Development tool.
"""

import sys
import os
import time
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fastergs_tpu.utils.compilation_cache import enable_persistent_cache

enable_persistent_cache()

P, C = 256, 128
N_STEPS = 4096      # grid steps at garden scale (2^21 / 512)
SUBS = 4
REPS = 5


def _tri():
    ri = jax.lax.broadcasted_iota(jnp.int32, (C, C), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (C, C), 1)
    return (ri <= ci).astype(jnp.float32)


def _mm_highest(x, t):
    return jax.lax.dot_general(x, t, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)


def _mm_split(x, t, terms):
    tb = t.astype(jnp.bfloat16)
    out = None
    rem = x
    for _ in range(terms):
        hi = rem.astype(jnp.bfloat16)
        part = jax.lax.dot_general(hi, tb, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        out = part if out is None else out + part
        rem = rem - hi.astype(jnp.float32)
    return out


def _scan_vpu(x):
    out = x
    step = 1
    col = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)
    while step < C:
        rolled = pltpu.roll(out, step, axis=1)
        out = out + jnp.where(col >= step, rolled, 0.0)
        step *= 2
    return out


def make_kernel(mode):
    def kernel(x_ref, o_ref):
        acc = jnp.zeros((P, C), jnp.float32)
        for s in range(SUBS):
            x = x_ref[:, s * C:(s + 1) * C]
            if mode == 'highest':
                y = _mm_highest(x, _tri())
            elif mode == 'split3':
                y = _mm_split(x, _tri(), 3)
            elif mode == 'split2':
                y = _mm_split(x, _tri(), 2)
            else:
                y = _scan_vpu(x)
            acc = acc + y
        o_ref[:, :] = acc
    return kernel


def run(mode, x):
    f = pl.pallas_call(
        make_kernel(mode),
        out_shape=jax.ShapeDtypeStruct((P, C), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(N_STEPS,),
            in_specs=[pl.BlockSpec((P, SUBS * C), lambda k: (0, k),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((P, C), lambda k: (0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        interpret=jax.default_backend() != 'tpu',
    )
    return jax.jit(f)(x)


def main():
    rng = np.random.default_rng(0)
    # log-transmittance-like data: negative, wide dynamic range
    x_np = -np.abs(rng.normal(0, 2.0, (P, N_STEPS * SUBS * C))
                   ).astype(np.float32)
    x = jnp.asarray(x_np)

    # numeric oracle on one (P, C) tile
    tile = x_np[:, :C].astype(np.float64)
    oracle = tile @ np.tril(np.ones((C, C))).T  # cumsum along axis 1

    for mode in ('highest', 'split3', 'split2', 'vpu'):
        out = run(mode, x)
        float(jnp.sum(out))
        t0 = time.perf_counter()
        out = run(mode, x)
        float(jnp.sum(out))
        dt = (time.perf_counter() - t0) * 1e3
        # error check on a single tile via plain jit
        def one(xt):
            if mode == 'highest':
                return _mm_highest(xt, _tri())
            if mode == 'split3':
                return _mm_split(xt, _tri(), 3)
            if mode == 'split2':
                return _mm_split(xt, _tri(), 2)
            return jnp.cumsum(xt, axis=1)
        got = np.asarray(jax.jit(one)(jnp.asarray(tile.astype(np.float32))))
        err = np.max(np.abs(got - oracle) / np.maximum(np.abs(oracle), 1e-6))
        print(f'{mode:10s} {dt:8.2f} ms   max rel err vs f64: {err:.2e}')


if __name__ == '__main__':
    main()
