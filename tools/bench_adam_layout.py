"""Microbench: Adam update cost vs parameter array layout.

Hypothesis: elementwise updates on (N, 15, 3) arrays are lane-padded
(3 -> 128) by the TPU tiled layout, wasting ~97% of VPU/bandwidth; the
same update on a flattened view should run at HBM speed. Informs whether
ops/adam.py should flatten internally.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from fastergs_tpu.utils.compilation_cache import enable_persistent_cache

enable_persistent_cache()

CAP = 262144
REPS = 20


def _fetch(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.asarray(leaf, jnp.float32).ravel()[0])


def timeit(name, fn, *args):
    out = fn(*args)
    _fetch(out)
    t0 = time.perf_counter()
    out = fn(*args)
    _fetch(out)
    dt = (time.perf_counter() - t0) / REPS * 1e3
    print(f'{name:46s} {dt:8.3f} ms')
    return out


def rep(fn):
    def run(*args):
        def body(i, carry):
            acc, a = carry
            out = fn(*a)
            v = jnp.float32(0.0)
            for leaf in jax.tree_util.tree_leaves(out):
                if jnp.issubdtype(leaf.dtype, jnp.floating):
                    v = v + jnp.sum(leaf.astype(jnp.float32))
            v = 1e-12 * v
            a0 = jax.tree_util.tree_map(
                lambda x: x + (0.0 * v).astype(x.dtype), a[0])
            return acc + v, ((a0,) + a[1:])
        acc, _ = jax.lax.fori_loop(0, REPS, body, (jnp.float32(0.0), args))
        return acc
    return jax.jit(run)


def main():
    from fastergs_tpu.ops.adam import AdamConfig, adam_step, AdamState

    key = jax.random.PRNGKey(0)
    shapes = {
        'means': (CAP, 3), 'scales': (CAP, 3), 'rotations': (CAP, 4),
        'opacities': (CAP, 1), 'sh_coefficients_0': (CAP, 1, 3),
        'sh_coefficients_rest': (CAP, 15, 3),
    }
    params = {k: jax.random.normal(key, s, jnp.float32)
              for k, s in shapes.items()}
    grads = {k: jax.random.normal(key, s, jnp.float32) * 1e-3
             for k, s in shapes.items()}
    state = AdamState(
        mu=jax.tree_util.tree_map(jnp.zeros_like, params),
        nu=jax.tree_util.tree_map(jnp.zeros_like, params),
        step=jnp.int32(5))
    lrs = {k: jnp.float32(1e-3) for k in params}
    active = jnp.arange(CAP, dtype=jnp.int32) < CAP - 7

    def f_masked(params, grads, state):
        return adam_step(params, grads, state, lrs, AdamConfig(), mask=active)

    def f_nomask(params, grads, state):
        return adam_step(params, grads, state, lrs, AdamConfig(), mask=None)

    def f_flat(params, grads, state):
        pf = {k: v.reshape(-1) for k, v in params.items()}
        gf = {k: v.reshape(-1) for k, v in grads.items()}
        sf = AdamState(
            mu={k: v.reshape(-1) for k, v in state.mu.items()},
            nu={k: v.reshape(-1) for k, v in state.nu.items()},
            step=state.step)
        np_, ns = adam_step(pf, gf, sf, lrs, AdamConfig(), mask=None)
        return ({k: v.reshape(params[k].shape) for k, v in np_.items()},
                AdamState(mu={k: v.reshape(params[k].shape)
                              for k, v in ns.mu.items()},
                          nu={k: v.reshape(params[k].shape)
                              for k, v in ns.nu.items()},
                          step=ns.step))

    timeit('adam masked (N,15,3) shaped', rep(f_masked), params, grads, state)
    timeit('adam unmasked shaped', rep(f_nomask), params, grads, state)
    timeit('adam flat-reshaped', rep(f_flat), params, grads, state)

    # single big elementwise op: shaped vs flat
    x = jax.random.normal(key, (CAP, 15, 3), jnp.float32)

    def g_shaped(x):
        return x * 1.0001 + 0.5 * x * x

    def g_flat(x):
        xf = x.reshape(-1)
        return (xf * 1.0001 + 0.5 * xf * xf).reshape(x.shape)

    timeit('elementwise (N,15,3)', rep(g_shaped), x)
    timeit('elementwise flat', rep(g_flat), x)

    from fastergs_tpu.utils.memory import device_memory_stats
    print('memory_stats:', device_memory_stats())


if __name__ == '__main__':
    main()
