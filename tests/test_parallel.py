"""View-parallel training step: correctness vs the single-chip step."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow
import jax
import jax.numpy as jnp

from fastergs_tpu.data.synthetic import make_synthetic_dataset
from fastergs_tpu.engine.loss import LossWeights
from fastergs_tpu.engine.train_step import TrainStepStatics, train_step
from fastergs_tpu.models.gaussians import FasterGSModel
from fastergs_tpu.parallel.data_parallel import (
    make_mesh, make_view_parallel_train_step)


def _setup():
    dataset, _ = make_synthetic_dataset(
        n_gaussians=200, n_views=8, width=48, height=32, focal=40.0, seed=5,
        instance_cap=1 << 12, test_step=10_000)
    data = dataset.to_device_dataset()
    model = FasterGSModel(sh_degree=3).build()
    pc = dataset.point_cloud
    model.gaussians.initialize_from_point_cloud(pc[0], pc[1], use_mcmc=False,
                                                capacity=256)
    statics = TrainStepStatics(
        width=48, height=32, active_sh_bases=1, proper_antialiasing=False,
        use_original_3d_filter=False, use_optimized_3d_filter=False,
        update_densification_info=True, inject_noise=False,
        use_random_background=False, instance_cap=1 << 12, chunk=16,
        loss_weights=LossWeights())
    lrs = {k: jnp.float32(1e-3) for k in model.gaussians.state.params}
    return data, model, statics, lrs


def test_dp_identical_views_matches_single_chip():
    """With every device seeing the SAME view, the psum-mean gradient equals
    the single-view gradient, so DP and single-chip steps must agree."""
    data, model, statics, lrs = _setup()
    mesh = make_mesh(8)
    dp_step = make_view_parallel_train_step(mesh, statics)

    view = jnp.int32(2)
    key = jax.random.PRNGKey(0)
    # both steps donate their state input — give each its own copy
    state_a = jax.tree_util.tree_map(jnp.copy, model.gaussians.state)
    state_b = jax.tree_util.tree_map(jnp.copy, model.gaussians.state)
    single_state, single_metrics = train_step(
        state_a, data, view, lrs, jnp.float32(0.0), key, statics)

    dp_state, dp_metrics = dp_step(
        state_b, data, jnp.full((8,), 2, jnp.int32), lrs,
        jnp.float32(0.0), key)

    np.testing.assert_allclose(
        np.asarray(dp_state.params['means']),
        np.asarray(single_state.params['means']), atol=1e-6)
    assert abs(float(dp_metrics['loss']) - float(single_metrics['loss'])) < 1e-6
    # densification info: DP accumulates the SUM over devices (8 identical
    # views → 8x the visibility counts of a single step)
    np.testing.assert_allclose(
        np.asarray(dp_state.densification_info[0]),
        8.0 * np.asarray(single_state.densification_info[0]), atol=1e-5)


def test_dp_distinct_views_runs_and_improves():
    data, model, statics, lrs = _setup()
    mesh = make_mesh(8)
    dp_step = make_view_parallel_train_step(mesh, statics)
    state = model.gaussians.state
    key = jax.random.PRNGKey(1)
    views = jnp.arange(8, dtype=jnp.int32)
    losses = []
    for i in range(12):
        key, sub = jax.random.split(key)
        state, metrics = dp_step(state, data, views, lrs, jnp.float32(0.0),
                                 sub)
        losses.append(float(metrics['loss']))
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()


def test_gaussian_parallel_matches_single_chip():
    """Gaussian-sharded step (params/Adam sharded by N, blend banded by tile
    rows, psum-combined image and cotangents) must reproduce the single-chip
    step on the same view."""
    from fastergs_tpu.engine.train_step import train_step_impl
    from fastergs_tpu.parallel.gaussian_parallel import (
        make_gaussian_parallel_train_step)
    from fastergs_tpu.parallel.gaussian_parallel import make_mesh as gp_mesh

    data, model, statics, lrs = _setup()
    mesh = gp_mesh(8)
    state_a = jax.tree_util.tree_map(jnp.copy, model.gaussians.state)
    state_b = jax.tree_util.tree_map(jnp.copy, model.gaussians.state)
    assert state_a.params['means'].shape[0] % 8 == 0

    view = jnp.int32(3)
    key = jax.random.PRNGKey(0)
    single_state, single_metrics = jax.jit(
        train_step_impl, static_argnames=('statics',))(
        state_a, data, view, lrs, jnp.float32(0.0), key, statics)

    gp_step = make_gaussian_parallel_train_step(mesh, statics)(state_b)
    gp_state, gp_metrics = gp_step(state_b, data, view, lrs,
                                   jnp.float32(0.0), key)

    assert abs(float(gp_metrics['loss'])
               - float(single_metrics['loss'])) < 1e-5
    for k in ('means', 'scales', 'opacities'):
        np.testing.assert_allclose(np.asarray(gp_state.params[k]),
                                   np.asarray(single_state.params[k]),
                                   atol=2e-5, err_msg=k)
    np.testing.assert_allclose(
        np.asarray(gp_state.densification_info),
        np.asarray(single_state.densification_info), atol=1e-4)


def test_gaussian_parallel_trains():
    from fastergs_tpu.parallel.gaussian_parallel import (
        make_gaussian_parallel_train_step)
    from fastergs_tpu.parallel.gaussian_parallel import make_mesh as gp_mesh

    data, model, statics, lrs = _setup()
    mesh = gp_mesh(8)
    state = model.gaussians.state
    gp_step = make_gaussian_parallel_train_step(mesh, statics)(state)
    key = jax.random.PRNGKey(1)
    losses = []
    for i in range(10):
        key, sub = jax.random.split(key)
        state, metrics = gp_step(state, data, jnp.int32(i % 8), lrs,
                                 jnp.float32(0.0), sub)
        losses.append(float(metrics['loss']))
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()


def test_trainer_parallel_modes():
    """Trainer-level integration: PARALLEL_MODE drives the multi-chip steps
    (including maintenance resharding across densification)."""
    from fastergs_tpu.data.synthetic import make_synthetic_dataset as mk
    from fastergs_tpu.engine.renderer import FasterGSRenderer
    from fastergs_tpu.engine.trainer import FasterGSTrainer
    from fastergs_tpu.ops.ssim import psnr

    dataset, _ = mk(n_gaussians=300, n_views=8, width=48, height=32,
                    focal=40.0, seed=7, instance_cap=1 << 12)

    for mode in ('views', 'gaussians'):
        model = FasterGSModel(sh_degree=3).build()
        renderer = FasterGSRenderer(model, {'INSTANCE_CAP': 1 << 12})
        trainer = FasterGSTrainer(model, renderer, {
            'PARALLEL_MODE': mode,
            'NUM_ITERATIONS': 40,
            'DENSIFICATION_START_ITERATION': 10,
            'DENSIFICATION_END_ITERATION': 30,
            'DENSIFICATION_INTERVAL': 10,
            'OPACITY_RESET_INTERVAL': 10_000,
            'MORTON_ORDERING_INTERVAL': 10_000,
            'INSTANCE_CAP': 1 << 12,
            'LOG_INTERVAL': 20,
        })
        trainer.run(dataset)
        vals = [float(psnr(renderer.render_image(v, benchmark=True)['rgb'],
                           jnp.asarray(v.rgb)))
                for v in dataset.test_views]
        assert np.isfinite(vals).all(), mode
        hist = [m['loss'] for _, m in trainer.metrics_history]
        assert hist[-1] < hist[0] * 1.5, (mode, hist)


def test_hybrid_2d_matches_batched_single_chip():
    """Hybrid (views x gaussians) mesh: with random bg and noise off, the
    2x4 hybrid step must match the single-chip batched step
    (views_per_step=2) on the same view pair to fp tolerance."""
    from fastergs_tpu.parallel.gaussian_parallel import (
        make_hybrid_mesh, make_hybrid_parallel_train_step)

    data, model, statics, lrs = _setup()
    statics_b = statics._replace(views_per_step=2)
    views = jnp.asarray([1, 5], jnp.int32)
    key = jax.random.PRNGKey(3)

    state_a = jax.tree_util.tree_map(jnp.copy, model.gaussians.state)
    single_state, single_metrics = train_step(
        state_a, data, views, lrs, jnp.float32(0.0), key, statics_b)

    mesh = make_hybrid_mesh(2, 4)
    hy_step = make_hybrid_parallel_train_step(mesh, statics)(
        model.gaussians.state)
    state_b = jax.tree_util.tree_map(jnp.copy, model.gaussians.state)
    hy_state, hy_metrics = hy_step(state_b, data, views, lrs,
                                   jnp.float32(0.0), key)

    for k in ('means', 'scales', 'opacities', 'sh_coefficients_0'):
        a = np.asarray(single_state.params[k])
        b = np.asarray(hy_state.params[k])
        np.testing.assert_allclose(b, a, atol=2e-5,
                                   err_msg=f'param mismatch: {k}')
    assert abs(float(hy_metrics['loss']) - float(single_metrics['loss'])) < 1e-4
    # densification info matches the batched accumulation (sum of 2 views)
    np.testing.assert_allclose(
        np.asarray(hy_state.densification_info),
        np.asarray(single_state.densification_info), atol=1e-4)


def test_hybrid_2d_training_improves():
    from fastergs_tpu.parallel.gaussian_parallel import (
        make_hybrid_mesh, make_hybrid_parallel_train_step)
    data, model, statics, lrs = _setup()
    mesh = make_hybrid_mesh(2, 4)
    step = make_hybrid_parallel_train_step(mesh, statics)(
        model.gaussians.state)
    state = model.gaussians.state
    key = jax.random.PRNGKey(4)
    losses = []
    for i in range(10):
        key, sub = jax.random.split(key)
        views = jnp.asarray([(2 * i) % 8, (2 * i + 1) % 8], jnp.int32)
        state, metrics = step(state, data, views, lrs, jnp.float32(0.0), sub)
        losses.append(float(metrics['loss']))
    assert losses[-1] < losses[0]
