"""Unit tests for padded-capacity model maintenance (densify/prune/sort) and
the MCMC/filter/pruning ops."""

import numpy as np
import jax
import jax.numpy as jnp

from fastergs_tpu.models.maintenance import (
    ModelState, active_mask, compact, apply_ordering, morton_sort,
    reset_opacities, adaptive_density_control, mcmc_densification,
    importance_pruning)
from fastergs_tpu.ops.adam import init_adam_state, adam_step, AdamConfig
from fastergs_tpu.ops.mcmc import relocation_adjustment
from fastergs_tpu.ops.morton import morton_encode
from fastergs_tpu.ops.ssim import fused_dssim, ssim


def _make_state(n=20, cap=32, seed=0):
    rng = np.random.default_rng(seed)
    params = {
        'means': jnp.asarray(rng.normal(0, 1, (cap, 3)).astype(np.float32)),
        'sh_coefficients_0': jnp.asarray(rng.normal(0, 1, (cap, 1, 3)).astype(np.float32)),
        'sh_coefficients_rest': jnp.asarray(rng.normal(0, 0.1, (cap, 15, 3)).astype(np.float32)),
        'opacities': jnp.asarray(rng.normal(1.0, 1, (cap, 1)).astype(np.float32)),
        'scales': jnp.asarray(rng.uniform(-4, -2, (cap, 3)).astype(np.float32)),
        'rotations': jnp.asarray(rng.normal(0, 1, (cap, 4)).astype(np.float32)),
    }
    return ModelState(
        params=params, adam=init_adam_state(params),
        densification_info=jnp.zeros((2, cap)),
        filter_3d=jnp.zeros(cap), n_active=jnp.int32(n))


def test_compact_preserves_order_and_moments():
    st = _make_state()
    st = st._replace(adam=st.adam._replace(
        mu=dict(st.adam.mu, means=st.params['means'] * 0.5)))
    keep = jnp.asarray([True, False] * 10 + [True] * 12)  # pattern over cap
    st2 = compact(st, keep)
    assert int(st2.n_active) == 10
    kept_rows = np.asarray(st.params['means'])[np.arange(0, 20, 2)]
    np.testing.assert_allclose(np.asarray(st2.params['means'])[:10], kept_rows)
    # moments moved together with params
    np.testing.assert_allclose(np.asarray(st2.adam.mu['means'])[:10],
                               kept_rows * 0.5)


def test_morton_sort_keeps_active_in_front():
    st = _make_state(n=17)
    st2 = morton_sort(st)
    assert int(st2.n_active) == 17
    # same set of active means, just reordered
    a = np.sort(np.asarray(st.params['means'])[:17], axis=0)
    b = np.sort(np.asarray(st2.params['means'])[:17], axis=0)
    np.testing.assert_allclose(a, b)
    # spatially sorted: morton codes nondecreasing
    codes = np.asarray(morton_encode(st2.params['means'],
                                     np.arange(32) < 17))[:17]
    assert np.all(np.diff(codes) >= 0)


def test_reset_opacities_clamps():
    st = _make_state()
    st2 = reset_opacities(st, use_original_3d_filter=False)
    assert float(jnp.max(st2.params['opacities'])) <= -4.595119 + 1e-4
    assert float(jnp.max(jnp.abs(st2.adam.mu['opacities']))) == 0.0


def test_adc_duplicates_and_splits():
    st = _make_state(n=20, cap=64)
    # force: high grad signal on rows 0-4, tiny scales on 0-2 (duplicate),
    # large scales on 3-4 (split)
    info = np.zeros((2, 64), np.float32)
    info[0, :20] = 1.0
    info[1, :5] = 1.0
    scales = np.full((64, 3), -6.0, np.float32)
    scales[3:5] = 0.5   # large
    st = st._replace(
        densification_info=jnp.asarray(info),
        params=dict(st.params, scales=jnp.asarray(scales),
                    opacities=jnp.full((64, 1), 2.0)))
    st2, n_req = adaptive_density_control(
        st, jax.random.PRNGKey(0), grad_threshold=0.5, min_opacity=0.005,
        prune_large_gaussians=jnp.bool_(False), percent_dense=0.01,
        cameras_extent=1.0)
    # 20 + 3 dup + 2*2 split = 27 requested; 2 split originals pruned → 25
    assert int(n_req) == 27
    assert int(st2.n_active) == 25
    # split children have scales shrunk by 1/1.6 (rows beyond n_active are
    # stale padding by design — only the active slice is meaningful)
    active_scales = np.asarray(st2.params['scales'])[:25]
    np.testing.assert_allclose(
        float(active_scales.max()), 0.5 + np.log(0.625), atol=1e-5)


def test_mcmc_relocation_replaces_dead():
    st = _make_state(n=20, cap=64)
    ops = np.full((64, 1), 2.0, np.float32)
    ops[5:8] = -20.0  # dead
    st = st._replace(params=dict(st.params, opacities=jnp.asarray(ops)))
    st2, _ = mcmc_densification(st, jax.random.PRNGKey(1), min_opacity=0.005,
                                cap_max=jnp.int32(21))
    # dead slots now hold copies of live Gaussians (opacity above threshold)
    new_ops = np.asarray(st2.params['opacities'])[:int(st2.n_active), 0]
    assert np.all(new_ops > np.log(0.005 / 0.995) + 1e-3)
    # growth: min(cap_max, 1.05*20) = 21
    assert int(st2.n_active) == 21


def test_relocation_adjustment_n1_identity():
    op = jnp.asarray([0.3, 0.9])
    sc = jnp.asarray([[0.1, 0.2, 0.3], [1.0, 1.0, 1.0]])
    new_op, new_sc = relocation_adjustment(op, sc, jnp.asarray([1, 1]))
    np.testing.assert_allclose(np.asarray(new_op), np.asarray(op), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(new_sc), np.asarray(sc), rtol=1e-4)


def test_relocation_adjustment_n2_opacity():
    # N=2: new_op = 1 - (1-op)^(1/2)
    op = jnp.asarray([0.75])
    new_op, new_sc = relocation_adjustment(
        op, jnp.ones((1, 3)), jnp.asarray([2]))
    np.testing.assert_allclose(float(new_op[0]), 0.5, rtol=1e-5)
    # scales shrink when splitting mass
    assert float(new_sc[0, 0]) < 1.0


def test_importance_pruning_fraction():
    st = _make_state(n=20, cap=32)
    scores = jnp.asarray(np.arange(32, dtype=np.float32))
    st2 = importance_pruning(st, scores, pruning_ratio=0.3)
    # k = int(0.3*19)+1 = 6 → prune scores <= 5 → 14 left
    assert int(st2.n_active) == 14
    # survivors are the high scorers, order preserved
    np.testing.assert_allclose(np.asarray(st2.params['means'])[:14],
                               np.asarray(st.params['means'])[6:20])


def test_adam_matches_reference_formula():
    params = {'x': jnp.asarray([1.0, 2.0])}
    grads = {'x': jnp.asarray([0.1, -0.2])}
    state = init_adam_state(params)
    lrs = {'x': jnp.float32(0.01)}
    p1, s1 = adam_step(params, grads, state, lrs, AdamConfig(eps=1e-15))
    # manual reference math (adam.cu:22-34), step=1
    g = np.array([0.1, -0.2])
    m = 0.1 * g
    v = 0.001 * g * g
    denom = np.sqrt(v) / np.sqrt(1 - 0.999) + 1e-15
    expected = np.array([1.0, 2.0]) - (0.01 / (1 - 0.9)) * m / denom
    np.testing.assert_allclose(np.asarray(p1['x']), expected, rtol=1e-5)
    assert int(s1.step) == 1


def test_blur_matches_direct_convolution():
    """The banded-matmul blur must equal the 11x11 zero-padded conv."""
    from fastergs_tpu.ops.ssim import _blur, _gaussian_window
    rng = np.random.default_rng(1)
    x = rng.uniform(0, 1, (3, 37, 53)).astype(np.float32)
    w = _gaussian_window()
    half = len(w) // 2
    xp = np.pad(x, ((0, 0), (half, half), (half, half)))
    ref = np.zeros_like(x)
    for i in range(len(w)):
        for j in range(len(w)):
            ref += w[i] * w[j] * xp[:, i:i + 37, j:j + 53]
    out = np.asarray(_blur(jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, atol=2e-6)


def test_ssim_identity_and_range():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((3, 32, 40)).astype(np.float32))
    assert float(ssim(img, img)) > 0.999
    assert float(fused_dssim(img, img)) < 1e-3
    other = jnp.asarray(rng.random((3, 32, 40)).astype(np.float32))
    d = float(fused_dssim(img, other))
    assert 0.0 < d < 0.5
