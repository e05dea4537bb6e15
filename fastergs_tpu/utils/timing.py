"""Reliable device timing on backends with unreliable block_until_ready.

The axon-tunneled TPU backend can return from block_until_ready before the
computation finishes; wall-clock timing of K chained in-graph repetitions
with a scalar fetch at the end, differenced across two K values, cancels
both the dispatch latency and the fetch roundtrip:
    per_op = (T(k2) - T(k1)) / (k2 - k1)
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp


def device_time_per_call(make_loop: Callable[[int], Callable], k1: int = 2,
                         k2: int = 10, repeats: int = 2) -> float:
    """make_loop(k) must return a jitted nullary-or-args callable running the
    op k times with data dependencies, returning a scalar. Returns seconds
    per op."""
    f1, f2 = make_loop(k1), make_loop(k2)
    float(f1())  # compile
    float(f2())
    best = float('inf')
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(f1())
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(f2())
        t2 = time.perf_counter() - t0
        best = min(best, (t2 - t1) / (k2 - k1))
    return max(best, 0.0)


def chain_loop(op: Callable, init_args: tuple, k: int,
               perturb: Callable | None = None) -> Callable:
    """Builds a jitted callable running `op` k times with a data dependency
    through a scalar accumulator (prevents overlap/DCE)."""

    @jax.jit
    def run():
        def body(i, carry):
            acc, args = carry
            out = op(*args)
            leaf = jax.tree_util.tree_leaves(out)[0]
            acc = acc + leaf.reshape(-1)[0].astype(jnp.float32)
            if perturb is not None:
                args = perturb(args, acc)
            return acc, args
        acc, _ = jax.lax.fori_loop(0, k, body, (jnp.float32(0.0), init_args))
        return acc

    return run
