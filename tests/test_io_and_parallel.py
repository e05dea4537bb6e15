"""Checkpoint round-trip, PLY round-trip, config YAML, CLI assembly,
multi-chip dry run, and pruning scores sanity."""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow
import jax
import jax.numpy as jnp

from fastergs_tpu.models.gaussians import FasterGSModel
from fastergs_tpu.models.checkpoint import save_checkpoint, load_checkpoint
from fastergs_tpu.models.ply import write_ply, read_ply, ply_dict_to_param_arrays
from fastergs_tpu.config import ConfigParameterList, load_yaml_config, save_yaml_config


def _small_model(n=50, seed=0, sh_degree=3):
    rng = np.random.default_rng(seed)
    model = FasterGSModel(sh_degree=sh_degree).build()
    model.gaussians.initialize_from_point_cloud(
        rng.normal(0, 1, (n, 3)).astype(np.float32),
        rng.random((n, 3)).astype(np.float32), use_mcmc=False, capacity=64)
    return model


def test_checkpoint_roundtrip(tmp_path):
    model = _small_model()
    g = model.gaussians
    g.active_sh_degree = 2
    g.active_sh_bases = 9
    path = str(tmp_path / 'ckpt.npz')
    save_checkpoint(path, model)

    model2 = FasterGSModel(sh_degree=3).build()
    load_checkpoint(path, model2)
    g2 = model2.gaussians
    assert g2.n_active == g.n_active
    assert g2.active_sh_degree == 2 and g2.active_sh_bases == 9
    for k in g.state.params:
        np.testing.assert_array_equal(np.asarray(g.state.params[k]),
                                      np.asarray(g2.state.params[k]))


def test_ply_roundtrip(tmp_path):
    model = _small_model(n=30)
    d = model.get_ply_dict()
    assert any('SplatRenderMode: default' in c for c in d['comments'])
    path = str(tmp_path / 'model.ply')
    write_ply(path, d)
    back = read_ply(path)
    assert back['comments'] == d['comments']
    params = ply_dict_to_param_arrays(back, sh_degree=3)
    np.testing.assert_allclose(params['means'],
                               np.asarray(model.gaussians.means), atol=1e-6)
    np.testing.assert_allclose(
        params['sh_coefficients_rest'],
        np.asarray(model.gaussians.sh_coefficients_rest), atol=1e-6)
    # rotations stored normalized
    norms = np.linalg.norm(params['rotations'], axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)


def test_config_yaml_roundtrip(tmp_path):
    cfg = ConfigParameterList(
        TRAINING=ConfigParameterList(NUM_ITERATIONS=123,
                                     LOSS=ConfigParameterList(LAMBDA_L1=0.7)),
        MODEL=ConfigParameterList(SH_DEGREE=2))
    path = str(tmp_path / 'cfg.yaml')
    save_yaml_config(cfg, path)
    cfg2 = load_yaml_config(path)
    assert cfg2.TRAINING.NUM_ITERATIONS == 123
    assert cfg2.TRAINING.LOSS.LAMBDA_L1 == 0.7
    assert cfg2.resolve('MODEL.SH_DEGREE') == 2


def test_reference_config_loads_into_trainer(tmp_path):
    """The shipped reference YAML must be consumable end-to-end."""
    import shutil
    from fastergs_tpu.engine.trainer import FasterGSTrainer
    from fastergs_tpu.engine.renderer import FasterGSRenderer
    cfg = load_yaml_config(os.path.join(
        os.path.dirname(__file__), '..', 'configs', 'fastergs_garden.yaml'))
    model = FasterGSModel(sh_degree=cfg.MODEL.SH_DEGREE).build()
    renderer = FasterGSRenderer(model, cfg.RENDERER.to_dict())
    overrides = cfg.TRAINING.to_dict()
    for key in ('LOAD_CHECKPOINT', 'MODEL_NAME', 'RUN_VALIDATION', 'DATA',
                'BACKUP', 'TIMING', 'WANDB', 'GUI', 'WRITE_VRAM_STATS'):
        overrides.pop(key, None)
    trainer = FasterGSTrainer(model, renderer, overrides)
    assert trainer.NUM_ITERATIONS == 30_000
    assert trainer.DENSIFICATION_END_ITERATION == 14_900
    assert trainer.OPTIMIZER.LEARNING_RATE_SH_COEFFICIENTS_REST == 0.000125
    assert trainer.resolve_config('FILTER_3D.USE') is False


def test_dryrun_multichip_8_devices():
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_graft_entry_jittable():
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (3, 400, 400)
    assert bool(jnp.isfinite(out).all())


def test_pruning_scores_rank_invisible_lowest():
    from fastergs_tpu.ops.pruning import update_pruning_scores
    from tests.helpers import make_camera, make_scene, make_settings
    cam = make_camera(width=48, height=32)
    scene = make_scene(n=100, seed=11)
    # make gaussian 0 dominant (high opacity, front) and gaussian 1 invisible
    means = np.asarray(scene[0]).copy()
    means[1, 2] = -50.0  # behind camera
    scene = (jnp.asarray(means),) + scene[1:]
    settings = make_settings(cam)
    scores = update_pruning_scores(
        jnp.zeros(100), *scene, settings, instance_cap=1 << 13)
    scores = np.asarray(scores)
    assert scores[1] == 0.0
    assert scores.max() > 0.0
