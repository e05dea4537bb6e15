"""Garden-recipe parity evidence run (VERDICT r3 ask #7).

Materializes the structured photoreal-ish synthetic scene as a REAL
on-disk capture (PNG images + binary COLMAP sparse model) at the
reference's garden resolution, then trains the FULL 30k-iteration garden
recipe (MCMC + proper antialiasing + Speedy-Splat pruning,
configs/garden_parity_synthetic.yaml) on it through the production CLI
(`python -m fastergs_tpu.cli.train`), and finally writes the PSNR curve +
result table to results/garden_parity.md. The strongest parity evidence
available without MipNeRF360 itself (reference recipe:
fastergs_garden.yaml:106-118).

Usage:
  python tools/garden_parity.py capture     # write the capture to disk
  python tools/garden_parity.py train       # run the CLI training
  python tools/garden_parity.py report      # build results/garden_parity.md
  python tools/garden_parity.py all
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPO = Path(__file__).resolve().parent.parent
OUT = REPO / 'results' / 'garden_parity'
CAPTURE = OUT / 'capture'
CONFIG = REPO / 'configs' / 'garden_parity_synthetic.yaml'
RUN_DIR = OUT / 'run'

WIDTH, HEIGHT = 1297, 840     # garden @ 1/4 resolution
N_GT = 200_000                # ground-truth scene richness
N_VIEWS = 48                  # two orbit rings (the garden capture has 185)
SEED = 0


def make_capture() -> None:
    import jax.numpy as jnp
    from fastergs_tpu.constants import round_up_capacity
    from fastergs_tpu.data.capture_io import write_colmap_capture
    from fastergs_tpu.data.synthetic import (ring_cameras,
                                             structured_gaussian_scene)
    from fastergs_tpu.ops.projection import CameraParams
    from fastergs_tpu.ops.rasterize import RasterizerSettings, rasterize
    from fastergs_tpu.utils.compilation_cache import enable_persistent_cache

    enable_persistent_cache()
    scene = structured_gaussian_scene(N_GT, seed=SEED)
    # two rings above the ground plane (up = -y): near-orbit + far-orbit
    views = (
        ring_cameras(N_VIEWS // 2, radius=4.6, width=WIDTH, height=HEIGHT,
                     focal=0.55 * WIDTH, elevation=-0.45) +
        ring_cameras(N_VIEWS - N_VIEWS // 2, radius=6.0, width=WIDTH,
                     height=HEIGHT, focal=0.55 * WIDTH, elevation=-0.25))
    for i, v in enumerate(views):
        v.name = f'view_{i:03d}'
    gt_args = tuple(jnp.asarray(scene[k]) for k in
                    ('means', 'scales', 'rotations', 'opacities',
                     'sh_coefficients_0', 'sh_coefficients_rest'))
    cap = round_up_capacity(3_000_000)  # generous: GT render only
    images = []
    t0 = time.time()
    for i, v in enumerate(views):
        settings = RasterizerSettings(
            camera=CameraParams.from_view(v), bg_color=jnp.zeros(3),
            active_sh_bases=16)
        images.append(np.asarray(
            rasterize(*gt_args, settings, to_chw=True, instance_cap=cap)))
        if i % 8 == 0:
            print(f'  rendered {i + 1}/{len(views)} '
                  f'({time.time() - t0:.0f}s)', flush=True)

    # SfM-like sparse cloud: noisy subset of solid-surface Gaussians
    rng = np.random.default_rng(SEED + 1)
    keep = rng.random(N_GT) < 0.05
    pts = scene['means'][keep] + rng.normal(
        0, 0.02, (int(keep.sum()), 3)).astype(np.float32)
    C0 = 0.28209479177387814
    cols = np.clip(0.5 + C0 * scene['sh_coefficients_0'][keep, 0], 0, 1)
    write_colmap_capture(CAPTURE, views, images, pts, cols)
    print(f'capture written: {CAPTURE} ({len(views)} views, '
          f'{len(pts):,} sparse points)', flush=True)


def train() -> None:
    RUN_DIR.mkdir(parents=True, exist_ok=True)
    env = dict(os.environ)
    cmd = [sys.executable, '-m', 'fastergs_tpu.cli.train', '-c', str(CONFIG),
           '--checkpoint-out', str(RUN_DIR / 'checkpoint.npz'),
           '--ply-out', str(RUN_DIR / 'model.ply')]
    # auto-resume: the trainer drops periodic checkpoints
    # (TRAINING.BACKUP.INTERVAL) into its output directory; a relaunch
    # after a crash/kill continues from the newest one
    ckpts = sorted((REPO / 'output' / 'garden_parity_synthetic').glob(
        'checkpoint_*.npz'))
    if ckpts:
        cmd += ['--resume', str(ckpts[-1])]
        print(f'resuming from {ckpts[-1]}', flush=True)
    print('running:', ' '.join(cmd), flush=True)
    t0 = time.time()
    mode = 'a' if ckpts else 'w'
    with open(OUT / 'train_log.txt', mode) as log:
        proc = subprocess.run(cmd, cwd=str(REPO), env=env, stdout=log,
                              stderr=subprocess.STDOUT)
    print(f'training exited {proc.returncode} after '
          f'{(time.time() - t0) / 60:.1f} min', flush=True)
    if proc.returncode != 0:
        print(Path(OUT / 'train_log.txt').read_text()[-3000:])
        raise SystemExit(proc.returncode)


def report() -> None:
    """Builds results/garden_parity.md from the run's metrics.jsonl."""
    # the trainer writes metrics.jsonl + n_gaussians.txt to its
    # output_directory (engine/trainer.py:finalize); find the newest run
    candidates = sorted(REPO.glob('output/**/metrics.jsonl'),
                        key=lambda p: p.stat().st_mtime)
    candidates += sorted(RUN_DIR.glob('**/metrics.jsonl'),
                         key=lambda p: p.stat().st_mtime)
    if not candidates:
        raise SystemExit('no metrics.jsonl found — did training run?')
    mpath = candidates[-1]
    # keep the LAST row per iteration (a resumed run may append a short
    # overlap around the checkpoint it restarted from)
    by_it_train, by_it_val = {}, {}
    for line in mpath.read_text().splitlines():
        r = json.loads(line)
        if 'PSNR' in r:
            by_it_train[r['iteration']] = r
        if 'val_psnr' in r:
            by_it_val[r['iteration']] = r
    train_rows = [by_it_train[k] for k in sorted(by_it_train)]
    val_rows = [by_it_val[k] for k in sorted(by_it_val)]

    def sample_curve(rs, key, n=30):
        idx = np.linspace(0, len(rs) - 1, min(n, len(rs))).astype(int)
        return [(rs[i]['iteration'], rs[i][key]) for i in idx]

    lines = [
        '# Garden-recipe parity run (structured synthetic capture)',
        '',
        f'- capture: {N_VIEWS} views @ {WIDTH}x{HEIGHT}, structured scene '
        f'({N_GT:,} GT Gaussians), PNG + binary COLMAP on disk',
        f'- recipe: configs/garden_parity_synthetic.yaml — full 30k '
        f'iterations, MCMC + proper AA + Speedy-Splat pruning, trained '
        f'through `python -m fastergs_tpu.cli.train`',
        f'- metrics source: {mpath.relative_to(REPO)}',
        '',
        '## Training PSNR curve (train views)',
        '',
        '| iteration | train PSNR (dB) |',
        '|---|---|',
    ]
    for it, v in sample_curve(train_rows, 'PSNR'):
        lines.append(f'| {it:,} | {v:.2f} |')
    if val_rows:
        lines += ['', '## Held-out validation PSNR', '',
                  '| iteration | test PSNR (dB) |', '|---|---|']
        for it, v in sample_curve(val_rows, 'val_psnr', n=20):
            lines.append(f'| {it:,} | {v:.2f} |')
    log = OUT / 'train_log.txt'
    if log.exists():
        tail = [ln for ln in log.read_text().splitlines()
                if 'test PSNR' in ln or 'final number' in ln]
        if tail:
            lines += ['', '## Final', '', '```'] + tail + ['```']
    OUT.mkdir(parents=True, exist_ok=True)
    (OUT / '..' / 'garden_parity.md').resolve().write_text(
        '\n'.join(lines) + '\n')
    print(f'report written: {(OUT / ".." / "garden_parity.md").resolve()}')


def main() -> None:
    what = sys.argv[1] if len(sys.argv) > 1 else 'all'
    OUT.mkdir(parents=True, exist_ok=True)
    if what == 'capture' or (what == 'all' and not (
            CAPTURE / 'sparse' / '0' / 'images.bin').exists()):
        make_capture()
    elif what == 'all':
        print(f'capture exists: {CAPTURE} (skipping)', flush=True)
    if what in ('train', 'all'):
        train()
    if what in ('report', 'all'):
        report()


if __name__ == '__main__':
    main()
