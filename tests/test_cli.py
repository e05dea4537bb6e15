"""CLI smoke tests: create_config → train → render → export_ply → benchmark.

Drives the actual `main()` entry points (argv monkeypatched) on a tiny
synthetic dataset, covering the host-script surface the reference delegates
to NeRFICG (reference: README.md:112-121 — train.py, inference.py,
benchmark.py, convert_to_ply.py, create_config.py).
"""

import os
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow
import yaml

from fastergs_tpu.cli import (benchmark as cli_benchmark,
                              create_config as cli_create_config,
                              export_ply as cli_export_ply,
                              render as cli_render,
                              train as cli_train)


def _run(module, argv):
    old = sys.argv
    sys.argv = ['prog'] + argv
    try:
        module.main()
    finally:
        sys.argv = old


def _tiny_config(path, out_dir):
    cfg = {
        'GLOBAL': {'DATASET_TYPE': 'synthetic', 'LOG_LEVEL': 1},
        'DATASET': {'N_GAUSSIANS': 300, 'N_VIEWS': 6,
                    'WIDTH': 64, 'HEIGHT': 48, 'SEED': 0},
        'MODEL': {'SH_DEGREE': 1},
        'TRAINING': {
            'MODEL_NAME': os.path.basename(out_dir),
            'NUM_ITERATIONS': 40,
            'DENSIFICATION_START_ITERATION': 10,
            'DENSIFICATION_END_ITERATION': 30,
            'DENSIFICATION_INTERVAL': 10,
            'OPACITY_RESET_INTERVAL': 1000,
            'MORTON_ORDERING_INTERVAL': 1000,
            'INSTANCE_CAP': 1 << 12,
            'LOG_INTERVAL': 20,
        },
    }
    with open(path, 'w') as f:
        yaml.safe_dump(cfg, f)
    return cfg


def test_cli_pipeline(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    cfg_path = tmp_path / 'tiny.yaml'
    _tiny_config(str(cfg_path), str(tmp_path / 'run'))

    ckpt = tmp_path / 'model.npz'
    ply = tmp_path / 'model.ply'
    _run(cli_train, ['-c', str(cfg_path),
                     '--checkpoint-out', str(ckpt),
                     '--ply-out', str(ply)])
    assert ckpt.exists() and ply.exists()
    assert ply.stat().st_size > 1000

    out_dir = tmp_path / 'renders'
    _run(cli_render, ['-c', str(cfg_path), '--checkpoint', str(ckpt),
                      '--out', str(out_dir), '--split', 'test'])
    rendered = list(out_dir.glob('*.png')) + list(out_dir.glob('*.npy'))
    assert rendered, 'render CLI produced no outputs'

    ply2 = tmp_path / 'exported.ply'
    _run(cli_export_ply, ['--checkpoint', str(ckpt), '--out', str(ply2),
                          '--sh-degree', '1'])
    assert ply2.exists() and ply2.stat().st_size > 1000

    _run(cli_benchmark, ['-c', str(cfg_path), '--checkpoint', str(ckpt),
                         '--frames', '3'])


def test_create_config_roundtrip(tmp_path):
    out = tmp_path / 'default.yaml'
    _run(cli_create_config, ['--out', str(out)])
    with open(out) as f:
        cfg = yaml.safe_load(f)
    # the full training recipe must round-trip (fastergs_garden.yaml analog)
    t = cfg['TRAINING']
    assert t['NUM_ITERATIONS'] == 30000
    assert t['DENSIFICATION_INTERVAL'] == 100
    assert 'SPEEDYSPLAT_PRUNING' in t and 'FILTER_3D' in t
    assert 'OPTIMIZER' in t and 'LOSS' in t
    assert 'RENDERER' in cfg

    out2 = tmp_path / 'mcmc.yaml'
    _run(cli_create_config, ['--out', str(out2), '--mcmc'])
    with open(out2) as f:
        cfg2 = yaml.safe_load(f)
    assert cfg2['TRAINING']['USE_MCMC'] is True
    assert cfg2['TRAINING']['DENSIFICATION_END_ITERATION'] == 24900
