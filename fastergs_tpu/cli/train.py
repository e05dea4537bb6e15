"""Training CLI (host train.py equivalent, reference README.md:113).

Usage: python -m fastergs_tpu.cli.train -c config.yaml
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import jax.numpy as jnp


def main() -> None:
    parser = argparse.ArgumentParser(description='Train a FasterGS-TPU model')
    parser.add_argument('-c', '--config', required=True)
    parser.add_argument('--checkpoint-out', default=None,
                        help='write final model checkpoint (.npz)')
    parser.add_argument('--ply-out', default=None,
                        help='write final model as .ply')
    args = parser.parse_args()

    from fastergs_tpu.cli.common import build_from_config
    from fastergs_tpu.models.ply import write_ply
    from fastergs_tpu.models.checkpoint import save_checkpoint
    from fastergs_tpu.ops.ssim import psnr
    from fastergs_tpu.utils.logging import log_info

    cfg, dataset, model, renderer, trainer = build_from_config(args.config)
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
