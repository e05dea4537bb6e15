"""fastergs_tpu — a TPU-native 3D Gaussian Splatting framework.

Standalone JAX/XLA/Pallas re-design of nerficg-project/faster-gaussian-
splatting (reference mounted at /root/reference). The reference is a method
plugin for the NeRFICG host exporting exactly MODEL / RENDERER /
TRAINING_INSTANCE (reference: __init__.py:1-7); this package provides the
same plugin surface plus the host-framework services the plugin consumed
(datasets, cameras, config, optimizer utilities, CLI — SURVEY.md §2.3).

Public backend API (mirror of FasterGSCudaBackend/__init__.py:14-18):
diff_rasterize, rasterize, update_pruning_scores, RasterizerSettings,
adam_step (FusedAdam), compute_3d_filter (update_3d_filter),
relocation_adjustment, add_noise.
"""

from fastergs_tpu.models.gaussians import FasterGSModel, Gaussians
from fastergs_tpu.engine.renderer import FasterGSRenderer
from fastergs_tpu.engine.trainer import FasterGSTrainer

from fastergs_tpu.ops.rasterize import (
    RasterizerSettings, diff_rasterize, rasterize)
from fastergs_tpu.ops.pruning import update_pruning_scores
from fastergs_tpu.ops.adam import adam_step, AdamConfig, AdamState
from fastergs_tpu.ops.filter3d import compute_3d_filter
from fastergs_tpu.ops.mcmc import relocation_adjustment, add_noise

MODEL = FasterGSModel
RENDERER = FasterGSRenderer
TRAINING_INSTANCE = FasterGSTrainer

__version__ = '0.1.0'

__all__ = [
    'MODEL', 'RENDERER', 'TRAINING_INSTANCE',
    'FasterGSModel', 'Gaussians', 'FasterGSRenderer', 'FasterGSTrainer',
    'RasterizerSettings', 'diff_rasterize', 'rasterize',
    'update_pruning_scores', 'adam_step', 'AdamConfig', 'AdamState',
    'compute_3d_filter', 'relocation_adjustment', 'add_noise',
]
