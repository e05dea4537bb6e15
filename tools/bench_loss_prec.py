"""DSSIM blur precision experiment: HIGHEST (bf16_6x) vs HIGH (bf16_3x).

The loss stage costs ~6 ms/step, dominated by ten+ dense (H,H)/(W,W)
banded blur matmuls at HIGHEST. HIGH halves the MXU passes; this script
measures the speed and the fwd/grad error vs HIGHEST at garden resolution
on the real chip. SSIM's variance terms cancel (mu_xx - mu_x^2 against
C2 = 9e-4), so the error gate is strict: rel grad error must stay < 1e-4.

Usage: python tools/bench_loss_prec.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from fastergs_tpu.utils.compilation_cache import enable_persistent_cache
enable_persistent_cache()

from fastergs_tpu.ops import ssim as ssim_mod

H, W = 840, 1297
REPS = 10


def make_loss(precision):
    # the PRODUCTION loss path (ops/ssim.fused_dssim), parameterized on the
    # blur matmul precision — the gate measures the code training runs, so
    # the two can't drift (advisor r4 finding)
    def loss(img, tgt):
        dssim = ssim_mod.fused_dssim(img, tgt, precision=precision)
        l1 = jnp.mean(jnp.abs(img - tgt))
        return 0.8 * l1 + 0.2 * dssim

    return jax.jit(jax.value_and_grad(loss))


def rep(fn):
    def run(img, tgt):
        def body(i, carry):
            acc, a = carry
            v, g = fn(a, tgt)
            s = v + jnp.sum(g)
            return acc + s, a + 0.0 * s
        acc, _ = jax.lax.fori_loop(0, REPS, body, (jnp.float32(0), img))
        return acc
    return jax.jit(run)


def timeit(name, fn, *args):
    out = fn(*args)
    float(np.asarray(out).ravel()[0])
    t0 = time.perf_counter()
    out = fn(*args)
    float(np.asarray(out).ravel()[0])
    print(f'{name:30s} {(time.perf_counter() - t0) / REPS * 1e3:8.2f} ms')


def main():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((3, H, W)), jnp.float32)
    tgt = jnp.clip(img + 0.1 * jnp.asarray(
        rng.standard_normal((3, H, W)), jnp.float32), 0, 1)

    hi = make_loss(lax.Precision.HIGHEST)
    md = make_loss(lax.Precision.HIGH)
    v_hi, g_hi = hi(img, tgt)
    v_md, g_md = md(img, tgt)
    g_hi, g_md = np.asarray(g_hi), np.asarray(g_md)
    scale = np.abs(g_hi).max()
    print(f'loss HIGHEST={float(v_hi):.7f}  HIGH={float(v_md):.7f}  '
          f'dv={abs(float(v_hi) - float(v_md)):.2e}')
    print(f'grad max abs err={np.abs(g_hi - g_md).max():.3e}  '
          f'(rel to max |g|={scale:.3e}: '
          f'{np.abs(g_hi - g_md).max() / scale:.3e})')

    timeit('loss+grad HIGHEST', rep(hi), img, tgt)
    timeit('loss+grad HIGH', rep(md), img, tgt)


if __name__ == '__main__':
    main()
