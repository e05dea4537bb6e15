"""4D (dynamic) Gaussian family: temporal adapter semantics + end-to-end
training on a synthetic video."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow
import jax.numpy as jnp

from fastergs_tpu.data.synthetic import (
    make_synthetic_dataset, make_synthetic_video_dataset)
from fastergs_tpu.models.gaussians4d import FasterGS4DModel, temporal_adapt
from fastergs_tpu.engine.renderer import FasterGSRenderer
from fastergs_tpu.engine.trainer import FasterGSTrainer
from fastergs_tpu.ops.ssim import psnr


def test_temporal_adapt_static_limit():
    """With zero motion and a huge time window, the 4D model must reduce to
    the static model exactly."""
    n = 10
    rng = np.random.default_rng(0)
    params = {
        'means': jnp.asarray(rng.normal(0, 1, (n, 3)).astype(np.float32)),
        'rotations': jnp.asarray(rng.normal(0, 1, (n, 4)).astype(np.float32)),
        'velocities': jnp.zeros((n, 3)),
        'accelerations': jnp.zeros((n, 3)),
        'rotation_rates': jnp.zeros((n, 4)),
        'time_means': jnp.full((n, 1), 0.5),
        'time_scales': jnp.full((n, 1), np.log(100.0)),
    }
    m, r, f = temporal_adapt(params, jnp.float32(0.9))
    np.testing.assert_allclose(np.asarray(m), np.asarray(params['means']))
    np.testing.assert_allclose(np.asarray(r), np.asarray(params['rotations']))
    np.testing.assert_allclose(np.asarray(f), 1.0, atol=1e-5)


def test_temporal_adapt_motion_and_window():
    params = {
        'means': jnp.zeros((1, 3)),
        'rotations': jnp.asarray([[1.0, 0, 0, 0]]),
        'velocities': jnp.asarray([[1.0, 2.0, 3.0]]),
        'accelerations': jnp.asarray([[0.5, 0.0, 0.0]]),
        'rotation_rates': jnp.zeros((1, 4)),
        'time_means': jnp.asarray([[0.25]]),
        'time_scales': jnp.asarray([[np.log(0.1)]]),
    }
    m, _, f = temporal_adapt(params, jnp.float32(0.75))
    dt = 0.5
    np.testing.assert_allclose(
        np.asarray(m[0]), [1.0 * dt + 0.5 * dt * dt, 2.0 * dt, 3.0 * dt],
        rtol=1e-6)
    np.testing.assert_allclose(float(f[0]), np.exp(-0.5 * (dt / 0.1) ** 2),
                               rtol=1e-5)


def test_4d_training_improves_psnr(tmp_path):
    dataset, _ = make_synthetic_video_dataset(
        n_gaussians=300, n_cameras=6, n_times=4, width=64, height=48,
        focal=55.0, seed=2, instance_cap=1 << 14)
    model = FasterGS4DModel(sh_degree=3).build()
    renderer = FasterGSRenderer(model, {'INSTANCE_CAP': 1 << 14})
    trainer = FasterGSTrainer(model, renderer, {
        'NUM_ITERATIONS': 200,
        'DENSIFICATION_START_ITERATION': 80,
        'DENSIFICATION_END_ITERATION': 160,
        'DENSIFICATION_INTERVAL': 80,
        'OPACITY_RESET_INTERVAL': 10_000,
        'MORTON_ORDERING_INTERVAL': 10_000,
        'INSTANCE_CAP': 1 << 14,
        'LOG_INTERVAL': 50,
    })
    trainer.output_directory = tmp_path
    trainer.callbacks.run_pre(dataset)
    assert 'velocities' in model.gaussians.state.params

    def test_psnr():
        vals = [float(psnr(renderer.render_image(v, benchmark=True)['rgb'],
                           jnp.asarray(v.rgb))) for v in dataset.test_views]
        return float(np.mean(vals))

    p0 = test_psnr()
    for it in range(trainer.NUM_ITERATIONS):
        trainer.callbacks.run_training(it, dataset)
    p1 = test_psnr()
    trainer.callbacks.run_post(trainer.NUM_ITERATIONS, dataset)
    assert p1 > p0 + 1.5, (p0, p1)
    # temporal params got gradients (motion was learned, not frozen)
    v = np.asarray(model.gaussians.state.params['velocities'])
    assert np.abs(v).max() > 1e-4


def test_4d_mcmc_training(tmp_path):
    """MCMC relocation/growth operates on the temporal param groups too
    (maintenance surgery is key-generic over the params dict)."""
    dataset, _ = make_synthetic_video_dataset(
        n_gaussians=250, n_cameras=5, n_times=3, width=64, height=48,
        focal=55.0, seed=4, instance_cap=1 << 14)
    model = FasterGS4DModel(sh_degree=1).build()
    renderer = FasterGSRenderer(model, {'INSTANCE_CAP': 1 << 14})
    trainer = FasterGSTrainer(model, renderer, {
        'NUM_ITERATIONS': 160,
        'USE_MCMC': True,
        'MAX_PRIMITIVES': 800,
        'DENSIFICATION_START_ITERATION': 50,
        'DENSIFICATION_END_ITERATION': 140,
        'DENSIFICATION_INTERVAL': 40,
        'MORTON_ORDERING_INTERVAL': 10_000,
        'LOSS': {'LAMBDA_OPACITY_REGULARIZATION': 0.01,
                 'LAMBDA_SCALE_REGULARIZATION': 0.01},
        'INSTANCE_CAP': 1 << 14,
        'LOG_INTERVAL': 50,
    })
    trainer.output_directory = tmp_path
    trainer.callbacks.run_pre(dataset)
    n0 = model.gaussians.n_active

    def test_psnr():
        vals = [float(psnr(renderer.render_image(v, benchmark=True)['rgb'],
                           jnp.asarray(v.rgb))) for v in dataset.test_views]
        return float(np.mean(vals))

    p0 = test_psnr()
    for it in range(trainer.NUM_ITERATIONS):
        trainer.callbacks.run_training(it, dataset)
    p1 = test_psnr()
    assert model.gaussians.n_active > n0  # MCMC growth happened
    assert p1 > p0 + 1.0, (p0, p1)
    # temporal groups stayed consistent through relocation/growth surgery
    st = model.gaussians.state
    cap = st.params['means'].shape[0]
    for k in ('velocities', 'time_means', 'rotation_rates'):
        assert st.params[k].shape[0] == cap
        assert np.isfinite(np.asarray(st.params[k])).all()
