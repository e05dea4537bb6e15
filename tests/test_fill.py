"""Pallas segment-fill kernel vs the XLA delta-scatter fill (interpret)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from fastergs_tpu.ops.fill import ROWS, B, segment_fill_rows
from fastergs_tpu.ops.tiles import _segment_fill_int


def _reference_fill(rows_t, starts, cap):
    """NumPy oracle: out[:, s] = rows[:, max{i: starts[i] <= s}]."""
    starts = np.asarray(starts)
    owners = np.searchsorted(starts, np.arange(cap), side='right') - 1
    owners = np.clip(owners, 0, starts.shape[0] - 1)
    return np.asarray(rows_t)[:, owners]


def _run_case(counts, cap, seed=0):
    rng = np.random.default_rng(seed)
    n = counts.shape[0]
    rows = rng.integers(-2**31, 2**31 - 1, (ROWS, n), dtype=np.int64)
    rows = rows.astype(np.int32)
    offsets = np.cumsum(counts)
    starts = (offsets - counts).astype(np.int32)
    out = segment_fill_rows(jnp.asarray(rows), jnp.asarray(starts), cap)
    ref = _reference_fill(rows, starts, cap)
    total = int(offsets[-1])
    # in-range slots must match the oracle exactly (raw bitpatterns)
    np.testing.assert_array_equal(np.asarray(out)[:, :min(total, cap)],
                                  ref[:, :min(total, cap)])
    return np.asarray(out), starts, total


def test_fill_random_segments():
    rng = np.random.default_rng(1)
    counts = rng.integers(0, 9, 1024).astype(np.int32)
    _run_case(counts, 4 * B)


def test_fill_zero_runs_and_big_segments():
    # long culled runs (zero counts) + segments spanning multiple windows
    counts = np.zeros(2048, np.int32)
    counts[0] = 3000          # spans >1 output block
    counts[700] = 1           # after a 699-row zero run
    counts[701:720] = 5
    counts[2047] = 50
    _run_case(counts, 4 * B)


def test_fill_total_exceeds_cap():
    counts = np.full(1024, 7, np.int32)  # total 7168 > cap 4096
    _run_case(counts, 4 * B)


def test_fill_matches_scatter_fill():
    """Equivalence with the production fallback (_segment_fill_int)."""
    rng = np.random.default_rng(3)
    counts = rng.integers(0, 6, 1024).astype(np.int32)
    n = counts.shape[0]
    cols = rng.integers(-2**20, 2**20, (n, 6)).astype(np.int32)
    offsets = np.cumsum(counts)
    starts = (offsets - counts).astype(np.int32)
    has = counts > 0
    cap = 2 * B
    old = _segment_fill_int(jnp.asarray(cols), jnp.asarray(has),
                            jnp.asarray(starts), cap)
    rows_t = np.zeros((ROWS, n), np.int32)
    rows_t[:6] = cols.T
    new = segment_fill_rows(jnp.asarray(rows_t), jnp.asarray(starts), cap)
    total = min(int(offsets[-1]), cap)
    np.testing.assert_array_equal(np.asarray(new)[:6, :total],
                                  np.asarray(old).T[:, :total])
