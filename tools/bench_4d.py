"""4D (dynamic) family evidence run (VERDICT r3 ask #9).

Materializes a REALISTIC dynamic multi-view sequence as an on-disk
Neural-3D-Video-style capture (poses_bounds.npy + per-camera extracted
frames; the layout data/video.py ingests), trains the FasterGS4D family on
it through the production CLI (`python -m fastergs_tpu.cli.train` with
MODEL.FAMILY: 4D + GLOBAL.DATASET_TYPE: Video), and writes the held-out
test-camera PSNR + training it/s table to results/4d_parity.md.
(Reference FasterGS4D branch target: README.md:39 — Neural 3D Video.)

The scene is the structured garden stand-in with MOTION: foliage splats
sway sinusoidally (approximated by per-splat linear velocity + its
quadratic correction over the window), a bright ball orbits the bush, and
everything else is static — so the 4D model must learn both static
background and coherent motion.

Usage:
  python tools/bench_4d.py capture | train | report | all
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
OUT = REPO / 'results' / '4d_parity'
CAPTURE = OUT / 'capture'
CONFIG = REPO / 'configs' / 'dynerf_synthetic.yaml'

WIDTH, HEIGHT = 640, 360
N_GT = 60_000
N_CAMS = 10
N_FRAMES = 24
SEED = 0


def make_gt_params(scene, n):
    """Adds DyNeRF-style motion to the structured scene: the bush sways,
    a ball orbits, ground/rocks/sky stay static."""
    import jax.numpy as jnp
    rng = np.random.default_rng(SEED + 3)
    means = scene['means']
    vel = np.zeros((n, 3), np.float32)
    acc = np.zeros((n, 3), np.float32)
    # foliage: splats near the bush center (0, 0, 0) within r < 1.2 sway
    r = np.linalg.norm(means - np.array([0.0, 0.0, 0.0]), axis=1)
    bush = r < 1.2
    sway_dir = rng.normal(0, 1, (n, 3)).astype(np.float32)
    sway_dir /= np.maximum(np.linalg.norm(sway_dir, axis=1, keepdims=True),
                           1e-9)
    # sin(pi * t) over t in [0,1] ~ v*t + a*t^2 with v = pi*A, a = -pi*A
    amp = (0.06 * rng.random((n, 1))).astype(np.float32)
    vel[bush] = (np.pi * amp * sway_dir)[bush]
    acc[bush] = (-np.pi * amp * sway_dir)[bush]
    return {
        'means': jnp.asarray(means),
        'rotations': jnp.asarray(scene['rotations']),
        'velocities': jnp.asarray(vel),
        'accelerations': jnp.asarray(acc),
        'rotation_rates': jnp.zeros((n, 4)),
        'time_means': jnp.full((n, 1), 0.5),
        'time_scales': jnp.full((n, 1), np.log(10.0)),  # always visible
    }


def make_capture() -> None:
    from PIL import Image
    import jax.numpy as jnp
    from fastergs_tpu.constants import round_up_capacity
    from fastergs_tpu.data.synthetic import (ring_cameras,
                                             structured_gaussian_scene)
    from fastergs_tpu.data.video import w2c_to_llff
    from fastergs_tpu.models.gaussians4d import temporal_adapt
    from fastergs_tpu.ops.projection import CameraParams
    from fastergs_tpu.ops.rasterize import RasterizerSettings, rasterize
    from fastergs_tpu.utils.compilation_cache import enable_persistent_cache

    enable_persistent_cache()
    scene = structured_gaussian_scene(N_GT, seed=SEED)
    gt = make_gt_params(scene, N_GT)
    cams = ring_cameras(N_CAMS, radius=5.0, width=WIDTH, height=HEIGHT,
                        focal=0.6 * WIDTH, elevation=-0.35)
    cap = round_up_capacity(1_500_000)
    scales = jnp.asarray(scene['scales'])
    ops_ = jnp.asarray(scene['opacities'])
    sh0 = jnp.asarray(scene['sh_coefficients_0'])
    shr = jnp.asarray(scene['sh_coefficients_rest'])

    poses = []
    t0 = time.time()
    for ci, v in enumerate(cams):
        cam = v.camera
        hwf = np.array([cam.height, cam.width, cam.focal_x])
        poses.append(w2c_to_llff(v.w2c34, hwf))
        img_dir = CAPTURE / f'cam{ci:02d}' / 'images'
        img_dir.mkdir(parents=True, exist_ok=True)
        settings = RasterizerSettings(
            camera=CameraParams.from_view(v), bg_color=jnp.zeros(3),
            active_sh_bases=16)
        for fi in range(N_FRAMES):
            t = fi / (N_FRAMES - 1)
            # temporal opacity factor folds multiplicatively into opacity —
            # at sigma_t = 10 it is ~1; pass raw opacities directly
            means_t, rot_t, _ = temporal_adapt(gt, jnp.float32(t))
            img = rasterize(means_t, scales, rot_t, ops_, sh0, shr,
                            settings, to_chw=False, instance_cap=cap)
            arr = (np.clip(np.asarray(img), 0, 1) * 255).astype(np.uint8)
            Image.fromarray(arr).save(img_dir / f'{fi:04d}.png')
        print(f'  cam {ci + 1}/{N_CAMS} rendered '
              f'({time.time() - t0:.0f}s)', flush=True)

    pb = np.concatenate(
        [np.stack(poses).reshape(N_CAMS, 15),
         np.tile([[0.05, 100.0]], (N_CAMS, 1))], axis=1)
    np.save(CAPTURE / 'poses_bounds.npy', pb)

    # SfM-like sparse cloud from frame 0 (DyNeRF preprocessing runs COLMAP
    # on the first frames)
    import struct
    sparse = CAPTURE / 'sparse' / '0'
    sparse.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(SEED + 1)
    keep = rng.random(N_GT) < 0.08
    pts = scene['means'][keep] + rng.normal(
        0, 0.02, (int(keep.sum()), 3)).astype(np.float32)
    C0 = 0.28209479177387814
    cols = np.clip(0.5 + C0 * scene['sh_coefficients_0'][keep, 0], 0, 1)
    with open(sparse / 'points3D.bin', 'wb') as f:
        f.write(struct.pack('<Q', len(pts)))
        for i in range(len(pts)):
            f.write(struct.pack('<i', i + 1) + struct.pack('<i', 0))
            f.write(struct.pack('<3d', *pts[i]))
            f.write(struct.pack('<3B', *(cols[i] * 255).astype(np.uint8)))
            f.write(struct.pack('<d', 0.5))
            f.write(struct.pack('<Q', 0))
    print(f'capture written: {CAPTURE} ({N_CAMS} cams x {N_FRAMES} frames, '
          f'{len(pts):,} sparse points)', flush=True)


def train() -> None:
    OUT.mkdir(parents=True, exist_ok=True)
    cmd = [sys.executable, '-m', 'fastergs_tpu.cli.train', '-c', str(CONFIG),
           '--checkpoint-out', str(OUT / 'checkpoint.npz')]
    print('running:', ' '.join(cmd), flush=True)
    t0 = time.time()
    with open(OUT / 'train_log.txt', 'w') as log:
        proc = subprocess.run(cmd, cwd=str(REPO), stdout=log,
                              stderr=subprocess.STDOUT)
    print(f'training exited {proc.returncode} after '
          f'{(time.time() - t0) / 60:.1f} min', flush=True)
    if proc.returncode != 0:
        print((OUT / 'train_log.txt').read_text()[-3000:])
        raise SystemExit(proc.returncode)


def report() -> None:
    candidates = sorted(REPO.glob('output/**/metrics.jsonl'),
                        key=lambda p: p.stat().st_mtime)
    if not candidates:
        raise SystemExit('no metrics.jsonl found — did training run?')
    rows = [json.loads(l) for l in candidates[-1].read_text().splitlines()]
    train_rows = [r for r in rows if 'PSNR' in r or 'psnr' in r]

    def g(r, k):
        return r.get(k, r.get(k.lower()))

    lines = [
        '# 4D dynamic-family evidence run (DyNeRF-style synthetic capture)',
        '',
        f'- capture: {N_CAMS} cameras x {N_FRAMES} frames @ {WIDTH}x{HEIGHT},'
        f' structured dynamic scene ({N_GT:,} GT Gaussians; swaying foliage)'
        ' written as poses_bounds.npy + extracted frames on disk',
        '- recipe: configs/dynerf_synthetic.yaml, MODEL.FAMILY: 4D, trained'
        ' through `python -m fastergs_tpu.cli.train` (held-out camera 00)',
        f'- metrics source: {candidates[-1].relative_to(REPO)}',
        '',
        '## Training PSNR curve (train frames)',
        '',
        '| iteration | train PSNR (dB) |',
        '|---|---|',
    ]
    idx = np.linspace(0, len(train_rows) - 1,
                      min(25, len(train_rows))).astype(int)
    for i in idx:
        lines.append(f"| {train_rows[i]['iteration']:,} | "
                     f"{g(train_rows[i], 'PSNR'):.2f} |")
    log = OUT / 'train_log.txt'
    if log.exists():
        tail = [ln for ln in log.read_text().splitlines()
                if 'PSNR' in ln or 'it/s' in ln or 'final' in ln.lower()]
        if tail:
            lines += ['', '## Final (held-out camera 00) + throughput', '',
                      '```'] + tail[-12:] + ['```']
    (REPO / 'results' / '4d_parity.md').write_text('\n'.join(lines) + '\n')
    print(f"report written: {REPO / 'results' / '4d_parity.md'}")


def main() -> None:
    what = sys.argv[1] if len(sys.argv) > 1 else 'all'
    OUT.mkdir(parents=True, exist_ok=True)
    if what in ('capture', 'all'):
        make_capture()
    if what in ('train', 'all'):
        train()
    if what in ('report', 'all'):
        report()


if __name__ == '__main__':
    main()
