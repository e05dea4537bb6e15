"""Shared CLI plumbing: config → dataset/model/renderer/trainer assembly.

The host-framework equivalents these replace: NeRFICG's train.py /
inference.py / benchmark.py / convert_to_ply.py scripts and its YAML config
loading (reference: README.md:112-121, SURVEY.md §2.3 L5).
"""

from __future__ import annotations

import os

from fastergs_tpu.config import ConfigParameterList, load_yaml_config
from fastergs_tpu.data.dataset import BaseDataset
from fastergs_tpu.models.gaussians import FasterGSModel
from fastergs_tpu.engine.renderer import FasterGSRenderer
from fastergs_tpu.engine.trainer import FasterGSTrainer
from fastergs_tpu.utils.logging import set_log_level


def load_dataset_from_config(cfg: ConfigParameterList) -> BaseDataset:
    d = cfg.resolve('DATASET') if hasattr(cfg, 'DATASET') else ConfigParameterList()
    dataset_type = getattr(cfg.GLOBAL, 'DATASET_TYPE', 'MipNeRF360') \
        if hasattr(cfg, 'GLOBAL') else 'MipNeRF360'
    path = getattr(d, 'PATH', None)
    kwargs = dict(
        image_scale_factor=getattr(d, 'IMAGE_SCALE_FACTOR', 1.0) or 1.0,
        background_color=getattr(d, 'BACKGROUND_COLOR', [0.0, 0.0, 0.0]),
        near_plane=getattr(d, 'NEAR_PLANE', 0.2),
        far_plane=getattr(d, 'FAR_PLANE', 10_000.0),
    )
    if dataset_type.lower() in ('blender', 'nerfsynthetic', 'nerf_synthetic'):
        from fastergs_tpu.data.blender import load_blender_dataset
        return load_blender_dataset(path, **kwargs)
    if dataset_type.lower() == 'synthetic':
        from fastergs_tpu.data.synthetic import make_synthetic_dataset
        dataset, _ = make_synthetic_dataset(
            n_gaussians=getattr(d, 'N_GAUSSIANS', 2000),
            n_views=getattr(d, 'N_VIEWS', 24),
            width=getattr(d, 'WIDTH', 128), height=getattr(d, 'HEIGHT', 96),
            seed=getattr(d, 'SEED', 0))
        return dataset
    if dataset_type.lower() in ('video', 'dynerf', 'neural3dvideo'):
        # Neural-3D-Video-style extracted-frames capture (the FasterGS4D
        # branch's training target, reference README.md:39)
        from fastergs_tpu.data.video import load_video_dataset
        return load_video_dataset(
            path,
            image_scale_factor=getattr(d, 'IMAGE_SCALE_FACTOR', 1.0) or 1.0,
            max_frames=getattr(d, 'MAX_FRAMES', None),
            test_camera_index=getattr(d, 'TEST_CAMERA_INDEX', 0),
            background_color=getattr(d, 'BACKGROUND_COLOR', [0.0, 0.0, 0.0]),
            near_plane=getattr(d, 'NEAR_PLANE', 0.05),
            far_plane=getattr(d, 'FAR_PLANE', 100.0))
    from fastergs_tpu.data.colmap import load_colmap_dataset
    return load_colmap_dataset(
        path, test_step=getattr(d, 'TEST_STEP', 8), **kwargs)


def build_from_config(config_path: str):
    """Returns (cfg, dataset, model, renderer, trainer)."""
    from fastergs_tpu.utils.compilation_cache import enable_persistent_cache
    enable_persistent_cache()
    cfg = load_yaml_config(config_path)
    if hasattr(cfg, 'GLOBAL'):
        set_log_level(getattr(cfg.GLOBAL, 'LOG_LEVEL', 2))
        if getattr(cfg.GLOBAL, 'ANOMALY_DETECTION', False):
            # host GLOBAL.ANOMALY_DETECTION (torch autograd anomaly mode)
            import jax
            jax.config.update('jax_debug_nans', True)
    dataset = load_dataset_from_config(cfg)
    sh_degree = 3
    family = 'static'
    if hasattr(cfg, 'MODEL'):
        sh_degree = getattr(cfg.MODEL, 'SH_DEGREE', 3)
        family = str(getattr(cfg.MODEL, 'FAMILY', 'static'))
    if family.lower() in ('4d', 'dynamic', 'fastergs4d'):
        # dynamic family (FasterGS4D branch analog, README.md:39)
        from fastergs_tpu.models.gaussians4d import FasterGS4DModel
        model = FasterGS4DModel(sh_degree=sh_degree).build()
    else:
        model = FasterGSModel(sh_degree=sh_degree).build()
    renderer_overrides = cfg.RENDERER.to_dict() if hasattr(cfg, 'RENDERER') else {}
    renderer = FasterGSRenderer(model, renderer_overrides)
    trainer_overrides = cfg.TRAINING.to_dict() if hasattr(cfg, 'TRAINING') else {}
    # drop host-only keys the TPU trainer has no use for
    for key in ('MODEL_NAME', 'DATA', 'TIMING', 'WANDB', 'GUI',
                'WRITE_VRAM_STATS'):
        trainer_overrides.pop(key, None)
    if trainer_overrides.get('LOAD_CHECKPOINT') in ('null', 'None'):
        trainer_overrides['LOAD_CHECKPOINT'] = None
    trainer = FasterGSTrainer(model, renderer, trainer_overrides)
    out_dir = 'output'
    if hasattr(cfg, 'TRAINING') and hasattr(cfg.TRAINING, 'MODEL_NAME'):
        out_dir = os.path.join('output', cfg.TRAINING.MODEL_NAME)
    os.makedirs(out_dir, exist_ok=True)
    trainer.output_directory = out_dir
    return cfg, dataset, model, renderer, trainer
