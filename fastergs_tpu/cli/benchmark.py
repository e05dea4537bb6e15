"""Benchmark CLI (host benchmark.py equivalent, README.md:117): measures
render FPS and reports PSNR against ground truth where available.

Usage: python -m fastergs_tpu.cli.benchmark -c config.yaml --checkpoint ckpt.npz
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np
import jax
import jax.numpy as jnp


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument('-c', '--config', required=True)
    parser.add_argument('--checkpoint', required=True)
    parser.add_argument('--frames', type=int, default=50)
    args = parser.parse_args()

    from fastergs_tpu.cli.common import build_from_config
    from fastergs_tpu.models.checkpoint import load_checkpoint
    from fastergs_tpu.ops.ssim import psnr, ssim

    cfg, dataset, model, renderer, _ = build_from_config(args.config)
    load_checkpoint(args.checkpoint, model)

    views = dataset.test_views or dataset.train_views
    # quality
    psnrs, ssims = [], []
    for view in views:
        out = renderer.render_image(view, to_chw=True, benchmark=True)
        if view.rgb is not None:
            gt = jnp.asarray(view.rgb)
            psnrs.append(float(psnr(out['rgb'], gt)))
            ssims.append(float(ssim(out['rgb'], gt)))
    # speed: repeated renders of the first view (optimized path)
    view = views[0]
    out = renderer.render_image(view, to_chw=True, benchmark=True)
    jax.block_until_ready(out['rgb'])
    t0 = time.perf_counter()
    for _ in range(args.frames):
        out = renderer.render_image(view, to_chw=True, benchmark=True)
    jax.block_until_ready(out['rgb'])
    fps = args.frames / (time.perf_counter() - t0)

    print(json.dumps({
        'psnr': float(np.mean(psnrs)) if psnrs else None,
        'ssim': float(np.mean(ssims)) if ssims else None,
        'fps': round(fps, 2),
        'n_views': len(views),
        'n_gaussians': model.gaussians.n_active,
        'resolution': f'{view.camera.width}x{view.camera.height}',
    }))


if __name__ == '__main__':
    main()
