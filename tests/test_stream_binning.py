"""Sort-carried field streams vs the gather formulation (ops/tiles.py).

The stream builder rides the 9 blend-field columns through the exact
bitcast-telescoping expansion and the lexicographic sort instead of a
post-sort row gather (reference counterpart: the sorted index list feeding
blend_cu, forward.cu:195-202). These tests pin down:
- bitwise equality of the carried rows vs pack9[gaussian_idx],
- gradient parity of attach_stream_grad (whose VJP is the owner-sorted
  Pallas segment reduction, ops/segreduce.py) vs the scatter-add transpose,
- non-power-of-two capacities (padded sort path),
- the segment-reduce kernel against a NumPy oracle.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from fastergs_tpu.constants import DEFAULT_CONSTANTS
from fastergs_tpu.data.synthetic import random_gaussian_scene
from fastergs_tpu.ops.blend import pack_blend_inputs
from fastergs_tpu.ops.projection import CameraParams, preprocess, grid_size
from fastergs_tpu.ops.segreduce import ROWS, segment_reduce_rows
from fastergs_tpu.ops.tiles import (attach_stream_grad,
                                    build_tile_instances_compact,
                                    build_tile_instances_stream)


@pytest.fixture(scope='module')
def scene():
    s = random_gaussian_scene(3000, seed=0)
    w, h = 160, 120
    w2c = np.eye(4, dtype=np.float32)[:3]
    w2c[2, 3] = 3.0
    cam = CameraParams(
        w2c=jnp.asarray(w2c), cam_position=jnp.asarray([0.0, 0.0, -3.0]),
        focal_x=jnp.float32(100.0), focal_y=jnp.float32(100.0),
        center_x=jnp.float32(w / 2), center_y=jnp.float32(h / 2),
        near_plane=jnp.float32(0.05), far_plane=jnp.float32(100.0),
        width=w, height=h)
    prims = preprocess(
        jnp.asarray(s['means']), jnp.asarray(s['scales']),
        jnp.asarray(s['rotations']), jnp.asarray(s['opacities']),
        jnp.asarray(s['sh_coefficients_0']),
        jnp.asarray(s['sh_coefficients_rest']), cam,
        active_sh_bases=16, consts=DEFAULT_CONSTANTS)
    sg = jax.tree_util.tree_map(jax.lax.stop_gradient, prims)
    gw, gh = grid_size(w, h, DEFAULT_CONSTANTS)
    pack9 = pack_blend_inputs(prims.mean2d, prims.conic, prims.opacity,
                              prims.color)
    return sg, pack9, gw, gh


@pytest.mark.parametrize('cap', [1 << 15, 20480, 12348])
def test_stream_rows_bitwise_equal_gather(scene, cap):
    sg, pack9, gw, gh = scene
    inst_old = build_tile_instances_compact(sg, gw, gh, cap,
                                            DEFAULT_CONSTANTS)
    pack_s = jnp.concatenate([pack9, jnp.zeros((1, 9))], 0)
    rows_old = pack_s[inst_old.gaussian_idx]
    inst_new, rows10 = build_tile_instances_stream(
        sg, pack9, gw, gh, cap, DEFAULT_CONSTANTS)
    np.testing.assert_array_equal(np.asarray(inst_new.tile_idx),
                                  np.asarray(inst_old.tile_idx))
    np.testing.assert_array_equal(np.asarray(inst_new.gaussian_idx),
                                  np.asarray(inst_old.gaussian_idx))
    np.testing.assert_array_equal(np.stack([np.asarray(r) for r in rows10[:9]]),
                                  np.asarray(rows_old.T))
    np.testing.assert_array_equal(
        np.asarray(rows10[9]).astype(np.int32),
        np.asarray(inst_old.tile_idx))


def test_attach_stream_grad_matches_scatter_transpose(scene):
    sg, pack9, gw, gh = scene
    cap = 1 << 15
    inst, _ = build_tile_instances_stream(sg, pack9, gw, gh, cap,
                                          DEFAULT_CONSTANTS)
    gidx = inst.gaussian_idx

    def f_gather(p9):
        ps = jnp.concatenate([p9, jnp.zeros((1, 9), p9.dtype)], 0)
        return jnp.sum(jnp.sin(ps[gidx]) * 0.3)

    def f_stream(p9):
        _, r10 = build_tile_instances_stream(
            sg, jax.lax.stop_gradient(p9), gw, gh, cap, DEFAULT_CONSTANTS)
        r10 = attach_stream_grad(p9, r10, gidx)
        return jnp.sum(jnp.sin(jnp.stack(r10[:9], axis=1)) * 0.3)

    g_a = jax.grad(f_gather)(pack9)
    g_b = jax.grad(f_stream)(pack9)
    np.testing.assert_allclose(np.asarray(g_b), np.asarray(g_a),
                               rtol=2e-5, atol=2e-6)


def test_segment_reduce_rows_oracle():
    rng = np.random.default_rng(0)
    for I, N in [(2048, 700), (1024, 2000), (512, 10)]:
        own = np.sort(rng.integers(0, N + 1, I)).astype(np.int32)
        rows = rng.standard_normal((ROWS, I)).astype(np.float32)
        out = segment_reduce_rows(jnp.asarray(rows), jnp.asarray(own), N,
                                  interpret=True)
        ref = np.zeros((ROWS, N + 1), np.float32)
        np.add.at(ref.T, own, rows.T)
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)


def test_reduce_by_gaussian_non_pow2():
    from fastergs_tpu.ops.segreduce import reduce_by_gaussian
    rng = np.random.default_rng(5)
    I, N = 1536, 400  # non-power-of-two instance count
    own = rng.integers(0, N + 1, I).astype(np.int32)
    rows = rng.standard_normal((9, I)).astype(np.float32)
    out = reduce_by_gaussian(jnp.asarray(rows), jnp.asarray(own), N,
                             interpret=True)
    ref = np.zeros((9, N + 1), np.float32)
    np.add.at(ref.T, own, rows.T)
    np.testing.assert_allclose(np.asarray(out), ref[:, :N], atol=1e-4)


def test_select_bit_oracle():
    """The two-level (word-select + 5-step in-word search) select-bit
    matches a bit-scan oracle on random 64-bit masks (round-5 decode diet
    rewrite of the flat 6-step 64-bit search)."""
    from fastergs_tpu.ops.tiles import _select_bit
    rng = np.random.default_rng(17)
    n = 4096
    lo = rng.integers(0, 1 << 32, n, dtype=np.uint64).astype(np.uint32)
    hi = rng.integers(0, 1 << 32, n, dtype=np.uint64).astype(np.uint32)
    # sparse masks too (typical splats touch few tiles)
    hi[: n // 2] &= rng.integers(0, 1 << 32, n // 2, dtype=np.uint64).astype(
        np.uint32)
    lo[: n // 4] &= np.uint32(0xFF)
    full = (hi.astype(np.uint64) << np.uint64(32)) | lo.astype(np.uint64)
    pc = np.array([int(m).bit_count() for m in full])
    j = (rng.random(n) * np.maximum(pc, 1)).astype(np.int32)
    j = np.minimum(j, np.maximum(pc - 1, 0))
    got = np.asarray(_select_bit(jnp.asarray(lo.view(np.int32)),
                                 jnp.asarray(hi.view(np.int32)),
                                 jnp.asarray(j)))

    def ref_select(m, jj):
        c = 0
        for p in range(64):
            if (int(m) >> p) & 1:
                if c == jj:
                    return p
                c += 1
        return 0

    ref = np.array([ref_select(m, int(jj)) for m, jj in zip(full, j)])
    ok = pc > 0
    np.testing.assert_array_equal(got[ok], ref[ok])
