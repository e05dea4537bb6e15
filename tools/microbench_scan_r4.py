"""Round-4 scan experiments: the segmented lane cumsum is the dominant MXU
load of the blend kernels (two (P=256, C=128) @ (C, C) HIGHEST tri-matmuls
per 128-instance sub-chunk).

Variants (inside a Pallas kernel, data generated IN-kernel so nothing is
DMA'd — isolates pure math throughput at the blend kernels' shapes):
  none     no matmul (kernel overhead + data-gen floor)
  default  one bf16 pass (precision floor, speed ceiling)
  highest  current: HIGHEST f32 matmul (XLA picks the pass count)
  split2   one-sided 2-term bf16 split of the DATA side (tri side is
           exactly bf16); terms isolated by MANTISSA BITMASKING, not dtype
           round-trips (XLA's allow-excess-precision folds bf16->f32
           round-trips to identity, silently degrading the split)
  split3   3-term masked split: bits 1-8 / 9-16 / 17-24 of the f32
           mantissa — the term products are exact, so the sum matches a
           true f32 matmul up to f32 accumulation order
  vpu      log-step shifted-add lane scan (exact f32 adds, no MXU)

Prints ms per variant + max rel err vs the f64 oracle. Development tool.
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


def _mm_prec(x, t, precision):
    return jax.lax.dot_general(x, t, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=precision)


def _chop_hi16(x):
    """Top-16-bit part of f32 (sign+exp+7 mantissa bits): exactly
    bf16-representable, and NOT foldable by allow-excess-precision.
    Shift-based masking (int literals inline in Mosaic; an `& const`
    mask becomes a captured i32[] constant pallas rejects)."""
    bits = jax.lax.bitcast_convert_type(x, jnp.int32)
    hi = jax.lax.shift_left(jax.lax.shift_right_logical(bits, 16), 16)
    return jax.lax.bitcast_convert_type(hi, jnp.float32)


def _mm_split(x, t, terms):
    tb = t.astype(jnp.bfloat16)
    out = None
    rem = x
    for i in range(terms):
        hi = _chop_hi16(rem) if i < terms - 1 else rem
        part = jax.lax.dot_general(hi.astype(jnp.bfloat16), tb,
                                   (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        out = part if out is None else out + part
        rem = rem - hi
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


def _gen(k, sub):
    """Pseudo-random-ish (P, C) data from iota (no HBM input)."""
    r = jax.lax.broadcasted_iota(jnp.int32, (P, C), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (P, C), 1)
    h = (r * 37 + c * 101 + k * 7919 + sub * 131) & 1023
    return -(h.astype(jnp.float32) + 0.5) * (1.0 / 256.0)


def apply_mode(mode, x):
    if mode == 'none':
        return x
    if mode == 'default':
        return _mm_prec(x, _tri(), jax.lax.Precision.DEFAULT)
    if mode == 'highest':
        return _mm_prec(x, _tri(), jax.lax.Precision.HIGHEST)
    if mode == 'split2':
        return _mm_split(x, _tri(), 2)
    if mode == 'split3':
        return _mm_split(x, _tri(), 3)
    return _scan_vpu(x)


def make_kernel(mode):
    def kernel(o_ref):
        k = pl.program_id(0)

        @pl.when(k == 0)
        def _():
            o_ref[:, :] = jnp.zeros((P, C), jnp.float32)

        acc = jnp.zeros((P, C), jnp.float32)
        for s in range(SUBS):
            acc = acc + apply_mode(mode, _gen(k, s))
        o_ref[:, :] += acc
    return kernel


@functools.lru_cache(maxsize=None)
def make_run(mode):
    f = pl.pallas_call(
        make_kernel(mode),
        out_shape=jax.ShapeDtypeStruct((P, C), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(N_STEPS,),
            in_specs=[],
            out_specs=pl.BlockSpec((P, C), lambda k: (0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        interpret=jax.default_backend() != 'tpu',
    )
    return jax.jit(f)


def main():
    rng = np.random.default_rng(0)
    tile = -np.abs(rng.normal(0, 2.0, (P, C))).astype(np.float32)
    oracle = tile.astype(np.float64) @ np.tril(np.ones((C, C))).T

    for mode in ('none', 'default', 'highest', 'split2', 'split3', 'vpu'):
        run = make_run(mode)
        t0 = time.perf_counter()
        float(jnp.sum(run()))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(REPS):
            float(jnp.sum(run()))
        dt = (time.perf_counter() - t0) * 1e3 / REPS

        # error check outside pallas via plain jit
        if mode == 'none':
            err = 0.0
        else:
            def one(xt, mode=mode):
                if mode == 'vpu':
                    return jnp.cumsum(xt, axis=1)
                return apply_mode(mode, xt)
            got = np.asarray(jax.jit(one)(jnp.asarray(tile)))
            err = float(np.max(np.abs(got - oracle)
                               / np.maximum(np.abs(oracle), 1e-6)))
        print(f'{mode:10s} {dt:8.2f} ms   (compile {compile_s:5.1f} s)   '
              f'max rel err vs f64: {err:.2e}', flush=True)


if __name__ == '__main__':
    main()
