"""End-to-end training: synthetic scene → trainer loop → PSNR improves.

This is the framework-level integration test (driver config #2 analog on
synthetic data): full trainer with callbacks, densification, optimizer, and
the jitted train step.
"""

import numpy as np
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow

from fastergs_tpu.data.synthetic import make_synthetic_dataset
from fastergs_tpu.models.gaussians import FasterGSModel
from fastergs_tpu.engine.renderer import FasterGSRenderer
from fastergs_tpu.engine.trainer import FasterGSTrainer
from fastergs_tpu.ops.ssim import psnr


def _make_trainer(overrides):
    model = FasterGSModel(sh_degree=3).build()
    renderer = FasterGSRenderer(model, {'INSTANCE_CAP': 1 << 16})
    trainer = FasterGSTrainer(model, renderer, overrides)
    return model, renderer, trainer


def _test_psnr(model, renderer, dataset):
    vals = []
    for view in dataset.test_views:
        out = renderer.render_image(view, to_chw=True, benchmark=True)
        vals.append(float(psnr(out['rgb'], jnp.asarray(view.rgb))))
    return float(np.mean(vals))


@pytest.fixture(scope='module')
def synthetic():
    return make_synthetic_dataset(n_gaussians=400, n_views=12, width=64,
                                  height=48, focal=55.0, seed=3,
                                  instance_cap=1 << 14)


def test_training_improves_psnr_adc(synthetic):
    dataset, _ = synthetic
    model, renderer, trainer = _make_trainer({
        'NUM_ITERATIONS': 220,
        'DENSIFICATION_START_ITERATION': 60,
        'DENSIFICATION_END_ITERATION': 180,
        'DENSIFICATION_INTERVAL': 60,
        'OPACITY_RESET_INTERVAL': 10_000,  # no reset in this short run
        'MORTON_ORDERING_INTERVAL': 100,
        'MORTON_ORDERING_END_ITERATION': 200,
        'INSTANCE_CAP': 1 << 14,
        'LOG_INTERVAL': 50,
    })
    trainer.callbacks.run_pre(dataset)
    psnr_before = _test_psnr(model, renderer, dataset)
    for it in range(trainer.NUM_ITERATIONS):
        trainer.callbacks.run_training(it, dataset)
    psnr_after = _test_psnr(model, renderer, dataset)
    trainer.callbacks.run_post(trainer.NUM_ITERATIONS, dataset)

    assert psnr_after > psnr_before + 3.0, (psnr_before, psnr_after)
    assert psnr_after > 18.0, psnr_after
    # metrics were recorded and loss finite
    assert trainer.metrics_history
    assert np.isfinite(trainer.metrics_history[-1][1]['loss'])


def test_training_improves_psnr_mcmc(synthetic, tmp_path):
    dataset, _ = synthetic
    model, renderer, trainer = _make_trainer({
        'NUM_ITERATIONS': 180,
        'USE_MCMC': True,
        'MAX_PRIMITIVES': 1500,
        'DENSIFICATION_START_ITERATION': 60,
        'DENSIFICATION_END_ITERATION': 150,
        'DENSIFICATION_INTERVAL': 60,
        'MORTON_ORDERING_INTERVAL': 10_000,
        'LOSS': {'LAMBDA_OPACITY_REGULARIZATION': 0.01,
                 'LAMBDA_SCALE_REGULARIZATION': 0.01},
        'INSTANCE_CAP': 1 << 14,
        'LOG_INTERVAL': 50,
    })
    trainer.output_directory = tmp_path
    trainer.callbacks.run_pre(dataset)
    psnr_before = _test_psnr(model, renderer, dataset)
    for it in range(trainer.NUM_ITERATIONS):
        trainer.callbacks.run_training(it, dataset)
    psnr_after = _test_psnr(model, renderer, dataset)
    trainer.callbacks.run_post(trainer.NUM_ITERATIONS, dataset)

    assert psnr_after > psnr_before + 2.0, (psnr_before, psnr_after)
    # finalize wrote the gaussian count file (reference Trainer.py:222-227)
    content = (tmp_path / 'n_gaussians.txt').read_text()
    assert 'N_Gaussians:' in content


def test_fused_window_overflow_grows_cap_and_replays(synthetic):
    """A mid-window instance overflow must grow the cap and replay the
    window at the new capacity BEFORE the next densify event (the reference
    instead sizes buffers exactly every frame, forward.cu:99-102)."""
    dataset, _ = synthetic
    model, renderer, trainer = _make_trainer({
        'NUM_ITERATIONS': 100,
        'INSTANCE_CAP': 512,   # far below the scene's instance demand
        'LOG_INTERVAL': 50,
    })
    trainer.callbacks.run_pre(dataset)
    trainer._run_fused_window(0, 4)
    assert trainer.INSTANCE_CAP > 512, 'overflow did not grow the cap'
    # the replay ran at the grown capacity: recorded demand fits the cap
    trainer._flush_metrics()
    _, host = trainer.metrics_history[-1]
    assert host['n_rect_instances'] <= trainer.INSTANCE_CAP
    assert np.isfinite(host['loss'])


def test_batched_views_per_step(synthetic):
    """VIEWS_PER_STEP>1: mean-gradient batched steps train stably."""
    dataset, _ = synthetic
    model, renderer, trainer = _make_trainer({
        'NUM_ITERATIONS': 80,
        'VIEWS_PER_STEP': 2,
        'OPACITY_RESET_INTERVAL': 10_000,
        'MORTON_ORDERING_INTERVAL': 10_000,
        'DENSIFICATION_START_ITERATION': 10_000,
        'INSTANCE_CAP': 1 << 14,
        'LOG_INTERVAL': 40,
    })
    trainer.callbacks.run_pre(dataset)
    psnr_before = _test_psnr(model, renderer, dataset)
    for it in range(trainer.NUM_ITERATIONS):
        trainer.callbacks.run_training(it, dataset)
    psnr_after = _test_psnr(model, renderer, dataset)
    assert psnr_after > psnr_before + 1.0, (psnr_before, psnr_after)
    trainer._flush_metrics()
    assert np.isfinite(trainer.metrics_history[-1][1]['loss'])


def test_fused_window_batched_views(synthetic):
    dataset, _ = synthetic
    model, renderer, trainer = _make_trainer({
        'NUM_ITERATIONS': 64,
        'VIEWS_PER_STEP': 2,
        'INSTANCE_CAP': 1 << 14,
        'LOG_INTERVAL': 16,
    })
    trainer.callbacks.run_pre(dataset)
    trainer._run_fused_window(0, 16)
    trainer._flush_metrics()
    assert np.isfinite(trainer.metrics_history[-1][1]['loss'])
