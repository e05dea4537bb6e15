"""Inference rendering CLI (host inference.py equivalent, README.md:114).

Usage: python -m fastergs_tpu.cli.render -c config.yaml --checkpoint ckpt.npz
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main() -> None:
    parser = argparse.ArgumentParser(description='Render test views')
    parser.add_argument('-c', '--config', required=True)
    parser.add_argument('--checkpoint', required=True)
    parser.add_argument('--out', default='renders')
    parser.add_argument('--split', choices=['test', 'train'], default='test')
    parser.add_argument('--benchmark', action='store_true',
                        help='use the optimized inference path')
    args = parser.parse_args()

    from fastergs_tpu.cli.common import build_from_config
    from fastergs_tpu.models.checkpoint import load_checkpoint
    from fastergs_tpu.utils.logging import log_info

    cfg, dataset, model, renderer, _ = build_from_config(args.config)
    load_checkpoint(args.checkpoint, model)

    views = dataset.test_views if args.split == 'test' else dataset.train_views
    os.makedirs(args.out, exist_ok=True)
    try:
        from PIL import Image
    except ImportError:
        Image = None
    for i, view in enumerate(views):
        out = renderer.render_image(view, to_chw=False,
                                    benchmark=args.benchmark)
        img = np.asarray(out['rgb'])
        if img.shape[0] == 3:
            img = img.transpose(1, 2, 0)
        if Image is not None:
            name = os.path.splitext(os.path.basename(view.name or f'{i:05d}'))[0]
            Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8)).save(
                os.path.join(args.out, f'{name}.png'))
    log_info(f'wrote {len(views)} renders to {args.out}')


if __name__ == '__main__':
    main()
