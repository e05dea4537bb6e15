"""Training CLI (host train.py equivalent, reference README.md:113).

Usage: python -m fastergs_tpu.cli.train -c config.yaml
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import jax.numpy as jnp


def _dry_run(config_path: str) -> None:
    """Validates config + dataset layout without loading images or
    compiling anything — the pre-flight check of the garden parity runbook
    (README.md: Garden parity procedure)."""
    from fastergs_tpu.config import load_yaml_config
    from fastergs_tpu.utils.logging import log_info

    cfg = load_yaml_config(config_path)
    d = cfg.resolve('DATASET') if hasattr(cfg, 'DATASET') else None
    dataset_type = (getattr(cfg.GLOBAL, 'DATASET_TYPE', 'MipNeRF360')
                    if hasattr(cfg, 'GLOBAL') else 'MipNeRF360')
    log_info(f'config OK: {config_path} (dataset type {dataset_type})')
    if dataset_type.lower() == 'synthetic':
        log_info('synthetic dataset: nothing on disk to validate')
        return
    path = getattr(d, 'PATH', None) if d is not None else None
    if not path:
        raise SystemExit('DATASET.PATH is not set in the config')
    if dataset_type.lower() in ('blender', 'nerfsynthetic', 'nerf_synthetic'):
        import os.path as osp
        ok = osp.exists(osp.join(path, 'transforms_train.json'))
        if not ok:
            raise SystemExit(f'no transforms_train.json under {path}')
        log_info(f'blender layout OK: {path}')
        return
    from fastergs_tpu.data.colmap import validate_colmap_layout
    rep = validate_colmap_layout(
        path, getattr(d, 'IMAGE_SCALE_FACTOR', 1.0) or 1.0)
    log_info('COLMAP layout OK: '
             f"{rep['n_views']} views ({rep['format']}, "
             f"camera {rep['camera_model']}, full res "
             f"{rep['full_res'][0]}x{rep['full_res'][1]}"
             f"{', pre-scaled images' if rep['pre_scaled'] else ''}), "
             f"{rep['n_points']:,} sparse points; images from "
             f"{rep['images_dir']}")


def main() -> None:
    parser = argparse.ArgumentParser(description='Train a FasterGS-TPU model')
    parser.add_argument('-c', '--config', required=True)
    parser.add_argument('--checkpoint-out', default=None,
                        help='write final model checkpoint (.npz)')
    parser.add_argument('--ply-out', default=None,
                        help='write final model as .ply')
    parser.add_argument('--resume', default=None, metavar='CKPT',
                        help='resume training from a checkpoint .npz '
                             '(overrides TRAINING.LOAD_CHECKPOINT)')
    parser.add_argument('--dry-run', action='store_true',
                        help='validate the dataset directory layout (COLMAP '
                             'sparse model + image files) and the config, '
                             'then exit without training')
    args = parser.parse_args()

    if args.dry_run:
        _dry_run(args.config)
        return

    from fastergs_tpu.cli.common import build_from_config
    from fastergs_tpu.models.ply import write_ply
    from fastergs_tpu.models.checkpoint import save_checkpoint
    from fastergs_tpu.ops.ssim import psnr
    from fastergs_tpu.utils.logging import log_info

    cfg, dataset, model, renderer, trainer = build_from_config(args.config)
    if args.resume:
        trainer.LOAD_CHECKPOINT = args.resume
    trainer.run(dataset)

    if dataset.test_views:
        vals = []
        for view in dataset.test_views:
            out = renderer.render_image(view, to_chw=True, benchmark=True)
            vals.append(float(psnr(out['rgb'], jnp.asarray(view.rgb))))
        log_info(f'test PSNR: {np.mean(vals):.3f} dB over {len(vals)} views')

    ckpt = args.checkpoint_out or os.path.join(
        str(trainer.output_directory), 'checkpoint.npz')
    save_checkpoint(ckpt, model, trainer)
    log_info(f'checkpoint written to {ckpt}')
    ply = args.ply_out or os.path.join(
        str(trainer.output_directory), 'model.ply')
    write_ply(ply, model.get_ply_dict(renderer.PROPER_ANTIALIASING))
    log_info(f'PLY written to {ply}')


if __name__ == '__main__':
    main()
