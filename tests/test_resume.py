"""Checkpoint → resume continuity: a split run matches the model surface of
an uninterrupted run (same schedule, restored optimizer state)."""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow
import jax.numpy as jnp

from fastergs_tpu.data.synthetic import make_synthetic_dataset
from fastergs_tpu.models.gaussians import FasterGSModel
from fastergs_tpu.models.checkpoint import save_checkpoint, load_checkpoint
from fastergs_tpu.engine.renderer import FasterGSRenderer
from fastergs_tpu.engine.trainer import FasterGSTrainer
from fastergs_tpu.ops.ssim import psnr


def _trainer(overrides, model=None):
    model = model or FasterGSModel(sh_degree=3).build()
    renderer = FasterGSRenderer(model, {'INSTANCE_CAP': 1 << 13})
    trainer = FasterGSTrainer(model, renderer, {
        'INSTANCE_CAP': 1 << 13, 'LOG_INTERVAL': 50,
        'MORTON_ORDERING_INTERVAL': 10_000,
        'OPACITY_RESET_INTERVAL': 10_000,
        'DENSIFICATION_START_ITERATION': 10_000,
        **overrides})
    return model, renderer, trainer


def test_resume_from_checkpoint(tmp_path):
    dataset, _ = make_synthetic_dataset(n_gaussians=200, n_views=8, width=48,
                                        height=32, focal=40.0, seed=9,
                                        instance_cap=1 << 13)
    # phase 1: train 60 iterations, checkpoint
    model1, renderer1, trainer1 = _trainer({'NUM_ITERATIONS': 60})
    trainer1.output_directory = tmp_path
    trainer1.callbacks.run_pre(dataset)
    for it in range(60):
        trainer1.callbacks.run_training(it, dataset)
    model1.num_iterations_trained = 60
    ckpt = str(tmp_path / 'ckpt.npz')
    save_checkpoint(ckpt, model1, trainer1)

    # phase 2: fresh trainer resumes from the checkpoint and continues
    model2, renderer2, trainer2 = _trainer({
        'NUM_ITERATIONS': 100, 'LOAD_CHECKPOINT': ckpt})
    trainer2.output_directory = tmp_path
    trainer2.callbacks.run_pre(dataset)
    assert trainer2.start_iteration == 60
    g1, g2 = model1.gaussians, model2.gaussians
    # restored state matches exactly (params + Adam moments + step count)
    np.testing.assert_array_equal(np.asarray(g1.state.params['means']),
                                  np.asarray(g2.state.params['means']))
    np.testing.assert_array_equal(np.asarray(g1.state.adam.mu['scales']),
                                  np.asarray(g2.state.adam.mu['scales']))
    assert int(g1.state.adam.step) == int(g2.state.adam.step)
    # mid-training resume restores the SAVED schedule position (degree 0 at
    # iteration 60; the 1000-iteration SH schedule continues from there)
    assert g2.active_sh_degree == g1.active_sh_degree == 0

    # continue training; PSNR keeps improving from the restored point
    def test_psnr(renderer):
        return float(np.mean([
            float(psnr(renderer.render_image(v, benchmark=True)['rgb'],
                       jnp.asarray(v.rgb))) for v in dataset.test_views]))

    p_before = test_psnr(renderer2)
    for it in range(60, 100):
        trainer2.callbacks.run_training(it, dataset)
    p_after = test_psnr(renderer2)
    assert p_after > p_before - 0.2  # no regression from the restore


def test_periodic_checkpoints_written(tmp_path):
    dataset, _ = make_synthetic_dataset(n_gaussians=150, n_views=6, width=48,
                                        height=32, focal=40.0, seed=10,
                                        instance_cap=1 << 12)
    model, renderer, trainer = _trainer({
        'NUM_ITERATIONS': 50, 'BACKUP': {'INTERVAL': 20}})
    trainer.output_directory = tmp_path
    trainer.callbacks.run_pre(dataset)
    for it in range(50):
        trainer.callbacks.run_training(it, dataset)
    files = sorted(os.listdir(tmp_path))
    assert 'checkpoint_000020.npz' in files
    assert 'checkpoint_000040.npz' in files
    # the periodic checkpoint loads back cleanly
    model2 = FasterGSModel(sh_degree=3).build()
    load_checkpoint(str(tmp_path / 'checkpoint_000040.npz'), model2)
    assert model2.num_iterations_trained == 40


def test_resumed_run_metrics_jsonl(tmp_path):
    """The streamed metrics.jsonl survives a kill + resume: the resumed
    process appends to the pre-crash prefix and finalize must NOT rewrite
    the file from its (partial) in-memory history (round-5 crash-resilience
    for the garden evidence run)."""
    import json
    dataset, _ = make_synthetic_dataset(n_gaussians=150, n_views=6, width=48,
                                        height=32, focal=40.0, seed=11,
                                        instance_cap=1 << 12)
    model1, _, trainer1 = _trainer({'NUM_ITERATIONS': 40, 'LOG_INTERVAL': 10})
    trainer1.output_directory = tmp_path
    trainer1.callbacks.run_pre(dataset)
    for it in range(40):  # "crashes" after 40 of 60: no finalize call
        trainer1.callbacks.run_training(it, dataset)
    trainer1._flush_metrics()
    model1.num_iterations_trained = 40
    ckpt = str(tmp_path / 'ckpt.npz')
    save_checkpoint(ckpt, model1, trainer1)
    mpath = tmp_path / 'metrics.jsonl'
    rows = [json.loads(l) for l in mpath.read_text().splitlines()]
    assert rows and rows[-1]['iteration'] == 39

    model2, _, trainer2 = _trainer({
        'NUM_ITERATIONS': 60, 'LOG_INTERVAL': 10, 'LOAD_CHECKPOINT': ckpt})
    trainer2.output_directory = tmp_path
    trainer2.run(dataset, fuse=False)  # includes finalize
    rows = [json.loads(l) for l in mpath.read_text().splitlines()]
    its = [r['iteration'] for r in rows if 'PSNR' in r]
    # pre-crash prefix intact AND the resumed tail present
    assert min(its) == 0 and max(its) == 59
    assert set(range(60)) <= set(its)


def test_post_densification_cap_trim():
    """The trainer trims the instance cap back to recent demand whenever
    that frees >= 25% of the cap (the growth-only watermark policy ratchets
    on transient demand spikes — measured 1.9x step tax in the garden run)
    and re-grows if demand later exceeds the cap."""
    dataset, _ = make_synthetic_dataset(n_gaussians=150, n_views=6, width=48,
                                        height=32, focal=40.0, seed=12,
                                        instance_cap=1 << 12)
    model, _, trainer = _trainer({
        'NUM_ITERATIONS': 10, 'DENSIFICATION_END_ITERATION': 4,
        'INSTANCE_CAP': 1 << 18, 'LOG_INTERVAL': 2})
    trainer.callbacks.run_pre(dataset)
    for it in range(5):
        trainer.callbacks.run_training(it, dataset)
    trainer._flush_metrics()
    demand = trainer._recent_demand
    assert demand > 0
    # next trim-due iteration after DENSIFICATION_END (stride 1000 from 4)
    trainer.trim_instance_cap(1004, dataset)
    from fastergs_tpu.constants import round_up_capacity
    assert trainer.INSTANCE_CAP == round_up_capacity(int(demand * 1.15))
    assert trainer.INSTANCE_CAP < (1 << 18)
    # upward drift: a recent demand above the cap grows it back
    trainer._recent_demand = trainer.INSTANCE_CAP + 1000
    trainer._pending_metrics.clear()
    trainer.trim_instance_cap(2004, dataset)
    assert trainer.INSTANCE_CAP >= trainer._recent_demand
