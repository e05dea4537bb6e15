"""Neural-3D-Video-style loader: on-disk fixture -> loader -> 4D trainer.

Builds a DyNeRF-layout capture (poses_bounds.npy + per-camera extracted
frames of a MOVING synthetic scene) and checks pose round-trips,
timestamps, the held-out test camera, and that the 4D model trains on the
loaded dataset (reference FasterGS4D branch target, README.md:39).
"""

import os

import numpy as np
import pytest
import jax.numpy as jnp

pytestmark = pytest.mark.slow

from fastergs_tpu.data.synthetic import make_synthetic_video_dataset  # noqa: E402
from fastergs_tpu.data.video import (  # noqa: E402
    _llff_to_w2c, load_video_dataset, w2c_to_llff)


@pytest.fixture(scope='module')
def video_capture(tmp_path_factory):
    from PIL import Image
    root = tmp_path_factory.mktemp('dynerf')
    ds, scene = make_synthetic_video_dataset(
        n_gaussians=300, n_cameras=4, n_times=5, width=64, height=48,
        focal=55.0, seed=2, instance_cap=1 << 14)
    all_views = sorted(ds.train_views + ds.test_views, key=lambda v: v.name)
    # group (camera, time) views back into per-camera frame sequences
    cams = {}
    for v in all_views:
        cams.setdefault(v.name.split('_t')[0], []).append(v)
    poses = []
    for ci, (cam_name, views) in enumerate(sorted(cams.items())):
        views.sort(key=lambda v: v.timestamp)
        cam = views[0].camera
        hwf = np.array([cam.height, cam.width, cam.focal_x])
        poses.append(w2c_to_llff(views[0].w2c34, hwf))
        img_dir = root / f'cam{ci:02d}' / 'images'
        img_dir.mkdir(parents=True)
        for fi, v in enumerate(views):
            arr = (np.clip(v.rgb, 0, 1) * 255).astype(np.uint8)
            Image.fromarray(arr.transpose(1, 2, 0)).save(
                img_dir / f'{fi:04d}.png')
    pb = np.concatenate(
        [np.stack(poses).reshape(len(poses), 15),
         np.tile([[0.05, 100.0]], (len(poses), 1))], axis=1)
    np.save(root / 'poses_bounds.npy', pb)
    # SfM-style points from frame 0 (DyNeRF preprocessing runs COLMAP once)
    import struct
    sparse = root / 'sparse' / '0'
    sparse.mkdir(parents=True)
    pts, cols = ds.point_cloud
    with open(sparse / 'points3D.bin', 'wb') as f:
        f.write(struct.pack('<Q', len(pts)))
        for i in range(len(pts)):
            f.write(struct.pack('<i', i + 1) + struct.pack('<i', 0))
            f.write(struct.pack('<3d', *pts[i]))
            f.write(struct.pack('<3B', *(np.clip(cols[i], 0, 1) * 255
                                         ).astype(np.uint8)))
            f.write(struct.pack('<d', 0.5))
            f.write(struct.pack('<Q', 0))
    return str(root), all_views


def test_llff_pose_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(5):
        q = rng.normal(0, 1, 4)
        q /= np.linalg.norm(q)
        w, x, y, z = q
        R = np.array([
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)]])
        t = rng.normal(0, 2, 3)
        w2c = np.concatenate([R, t[:, None]], axis=1).astype(np.float32)
        llff = w2c_to_llff(w2c, np.array([48.0, 64.0, 55.0]))
        back = _llff_to_w2c(llff)
        np.testing.assert_allclose(back, w2c, atol=1e-5)


def test_load_video_dataset(video_capture):
    root, src_views = video_capture
    ds = load_video_dataset(root)
    # cam00 held out; 3 cameras x 5 frames train, 5 frames test
    assert len(ds.test_views) == 5 and len(ds.train_views) == 15
    ts = sorted(v.timestamp for v in ds.test_views)
    np.testing.assert_allclose(ts, [0.0, 0.25, 0.5, 0.75, 1.0])
    # poses and pixels round-trip through the LLFF file + PNGs
    by_name = {v.name: v for v in src_views}
    for v in ds.train_views[:3]:
        cam_dir, fname = v.name.split('/')
        ci, fi = int(cam_dir[3:]), int(fname.split('.')[0])
        src = by_name[f'view_{ci:03d}_t{fi}']
        np.testing.assert_allclose(v.w2c34, src.w2c34, atol=1e-5)
        np.testing.assert_allclose(v.rgb, src.rgb, atol=2e-2)
    # frame cap
    ds2 = load_video_dataset(root, max_frames=2)
    assert len(ds2.train_views) == 6 and len(ds2.test_views) == 2


def test_train_4d_from_disk(video_capture):
    root, _ = video_capture
    from fastergs_tpu.engine.renderer import FasterGSRenderer
    from fastergs_tpu.engine.trainer import FasterGSTrainer
    from fastergs_tpu.models.gaussians4d import FasterGS4DModel
    from fastergs_tpu.ops.ssim import psnr

    ds = load_video_dataset(root)
    assert ds.point_cloud is not None  # picked up sparse/0/points3D.bin
    model = FasterGS4DModel(sh_degree=1).build()
    renderer = FasterGSRenderer(model, {'INSTANCE_CAP': 1 << 14})
    trainer = FasterGSTrainer(model, renderer, {
        'NUM_ITERATIONS': 120,
        'DENSIFICATION_START_ITERATION': 10_000,
        'OPACITY_RESET_INTERVAL': 10_000,
        'MORTON_ORDERING_INTERVAL': 10_000,
        'INSTANCE_CAP': 1 << 14,
        'LOG_INTERVAL': 40,
            })
    trainer.callbacks.run_pre(ds)

    def test_psnr():
        vals = [float(psnr(renderer.render_image(
            v, to_chw=True, benchmark=True)['rgb'], jnp.asarray(v.rgb)))
            for v in ds.test_views]
        return float(np.mean(vals))

    before = test_psnr()
    for it in range(trainer.NUM_ITERATIONS):
        trainer.callbacks.run_training(it, ds)
    after = test_psnr()
    assert after > before + 1.0, (before, after)


def test_cli_config_selects_video_dataset_and_4d_family(video_capture,
                                                        tmp_path):
    """The production config surface selects the DyNeRF loader and the 4D
    model family (GLOBAL.DATASET_TYPE: Video + MODEL.FAMILY: 4D) — the
    wiring tools/bench_4d.py trains through."""
    import yaml
    from fastergs_tpu.cli.common import build_from_config
    from fastergs_tpu.models.gaussians4d import FasterGS4DModel

    root, _ = video_capture
    cfg = {
        'GLOBAL': {'DATASET_TYPE': 'Video', 'LOG_LEVEL': 1},
        'MODEL': {'SH_DEGREE': 1, 'FAMILY': '4D'},
        'TRAINING': {'NUM_ITERATIONS': 10, 'INSTANCE_CAP': 1 << 14,
                     'MODEL_NAME': 'video4d_smoke'},
        'DATASET': {'PATH': root, 'MAX_FRAMES': 2, 'TEST_CAMERA_INDEX': 0},
    }
    path = tmp_path / 'cfg.yaml'
    path.write_text(yaml.safe_dump(cfg))
    cwd = os.getcwd()
    os.chdir(tmp_path)  # keep output/ out of the repo
    try:
        _, ds, model, renderer, trainer = build_from_config(str(path))
    finally:
        os.chdir(cwd)
    assert isinstance(model, FasterGS4DModel)
    assert model.gaussians.is_temporal
    assert len(ds.train_views) == 6 and len(ds.test_views) == 2
    assert trainer.NUM_ITERATIONS == 10
