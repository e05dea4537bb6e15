"""End-to-end coverage of the optional feature paths: Speedy-Splat pruning,
Mip-Splatting 3D filter (both formulations), random background, random
initialization with carving."""

import numpy as np
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow

from fastergs_tpu.data.synthetic import make_synthetic_dataset
from fastergs_tpu.models.gaussians import FasterGSModel
from fastergs_tpu.engine.renderer import FasterGSRenderer
from fastergs_tpu.engine.trainer import FasterGSTrainer
from fastergs_tpu.ops.ssim import psnr


@pytest.fixture(scope='module')
def synthetic():
    return make_synthetic_dataset(n_gaussians=300, n_views=10, width=64,
                                  height=48, focal=55.0, seed=7,
                                  instance_cap=1 << 13)


def _run(dataset, overrides, n_iters, model=None, tmp_path='.'):
    model = model or FasterGSModel(sh_degree=3).build()
    renderer = FasterGSRenderer(model, {'INSTANCE_CAP': 1 << 13,
                                        **overrides.pop('RENDERER', {})})
    trainer = FasterGSTrainer(model, renderer, {
        'NUM_ITERATIONS': n_iters,
        'INSTANCE_CAP': 1 << 13,
        'LOG_INTERVAL': 50,
        'MORTON_ORDERING_INTERVAL': 10_000,
        'OPACITY_RESET_INTERVAL': 10_000,
        **overrides})
    trainer.output_directory = tmp_path
    trainer.callbacks.run_pre(dataset)
    for it in range(n_iters):
        trainer.callbacks.run_training(it, dataset)
    return model, renderer, trainer


def test_speedyplat_pruning_path(synthetic):
    dataset, _ = synthetic
    model, renderer, trainer = _run(dataset, {
        'DENSIFICATION_START_ITERATION': 30,
        'DENSIFICATION_END_ITERATION': 60,
        'DENSIFICATION_INTERVAL': 30,
        'SPEEDYSPLAT_PRUNING': {
            'USE': True, 'START_ITERATION': 30, 'END_ITERATION': 200,
            'INTERVAL': 30, 'SOFT_PRUNING_RATIO': 0.2,
            'HARD_PRUNING_RATIO': 0.1},
    }, 130)
    # hard pruning fired (iteration 90 and 120 >= end+interval) and the model
    # still renders finite images
    out = renderer.render_image(dataset.test_views[0], benchmark=True)
    assert bool(jnp.isfinite(out['rgb']).all())
    assert model.gaussians.n_active > 0


@pytest.mark.parametrize('original', [False, True])
def test_filter3d_path(synthetic, original):
    dataset, _ = synthetic
    model, renderer, trainer = _run(dataset, {
        'DENSIFICATION_START_ITERATION': 40,
        'DENSIFICATION_END_ITERATION': 80,
        'DENSIFICATION_INTERVAL': 40,
        'FILTER_3D': {'USE': True, 'ORIGINAL_FORMULATION': original,
                      'FILTER_VARIANCE': 0.2},
    }, 100)
    g = model.gaussians
    assert g.use_original_3d_filter == original
    assert g.use_optimized_3d_filter == (not original)
    out = renderer.render_image(dataset.test_views[0], benchmark=True)
    assert bool(jnp.isfinite(out['rgb']).all())
    if not original:
        # optimized formulation clamps log-scales to the (log) filter
        scales = np.asarray(g.state.params['scales'])[:g.n_active]
        filt = np.asarray(g.state.filter_3d)[:g.n_active]
        assert np.all(scales >= filt[:, None] - 1e-5)
    # cleanup bakes the filter and leaves a renderable model
    n = g.training_cleanup(min_opacity=1 / 255)
    assert n > 0 and not g.use_original_3d_filter and not g.use_optimized_3d_filter
    out2 = renderer.render_image(dataset.test_views[0], benchmark=True)
    assert bool(jnp.isfinite(out2['rgb']).all())


def test_random_init_with_carving_and_random_bg(synthetic):
    dataset, _ = synthetic
    model, renderer, trainer = _run(dataset, {
        'RANDOM_INITIALIZATION': {
            'FORCE': True, 'N_POINTS': 2000, 'ENABLE_CARVING': True,
            'CARVING_IN_ALL_FRUSTUMS': False, 'CARVING_ENFORCE_ALPHA': False},
        'USE_RANDOM_BACKGROUND_COLOR': True,
        'DENSIFICATION_START_ITERATION': 40,
        'DENSIFICATION_END_ITERATION': 120,
        'DENSIFICATION_INTERVAL': 40,
    }, 150)
    # carving kept only points visible from some camera
    assert 0 < model.gaussians.n_active
    vals = [float(psnr(renderer.render_image(v, benchmark=True)['rgb'],
                       jnp.asarray(v.rgb))) for v in dataset.test_views]
    assert np.isfinite(vals).all()
    assert float(np.mean(vals)) > 10.0  # learned something from random init


def test_scale_modifier_inference(synthetic):
    dataset, _ = synthetic
    model, renderer, trainer = _run(dataset, {}, 30)
    out1 = renderer.render_image(dataset.test_views[0])
    renderer.SCALE_MODIFIER = 0.3
    out2 = renderer.render_image(dataset.test_views[0])
    # shrunken splats cover less area → images differ
    assert float(jnp.abs(out1['rgb'] - out2['rgb']).max()) > 1e-3
