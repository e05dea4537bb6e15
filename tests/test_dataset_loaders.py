"""End-to-end dataset loader tests on synthetic COLMAP/Blender fixtures."""

import json
import os
import struct

import numpy as np
import pytest

pytest.importorskip('PIL')
from PIL import Image

from fastergs_tpu.data.colmap import load_colmap_dataset
from fastergs_tpu.data.blender import load_blender_dataset


def _make_colmap_scene(root):
    sparse = root / 'sparse' / '0'
    sparse.mkdir(parents=True)
    imgdir = root / 'images'
    imgdir.mkdir()
    w, h, fx = 64, 48, 70.0
    # cameras.bin: one PINHOLE camera
    with open(sparse / 'cameras.bin', 'wb') as f:
        f.write(struct.pack('<Q', 1))
        f.write(struct.pack('<iiQQ', 1, 1, w, h))  # id, PINHOLE, w, h
        f.write(struct.pack('<4d', fx, fx, w / 2, h / 2))
    # images.bin: 4 posed images
    rng = np.random.default_rng(0)
    with open(sparse / 'images.bin', 'wb') as f:
        f.write(struct.pack('<Q', 4))
        for i in range(4):
            f.write(struct.pack('<i', i + 1))
            q = rng.normal(0, 1, 4)
            q /= np.linalg.norm(q)
            f.write(struct.pack('<4d', *q))
            f.write(struct.pack('<3d', *rng.normal(0, 1, 3)))
            f.write(struct.pack('<i', 1))
            f.write(f'view_{i}.png'.encode() + b'\x00')
            f.write(struct.pack('<Q', 0))
    # points3D.bin: 20 points
    with open(sparse / 'points3D.bin', 'wb') as f:
        f.write(struct.pack('<Q', 20))
        for i in range(20):
            f.write(struct.pack('<Q', i))
            f.write(struct.pack('<3d', *rng.normal(0, 1, 3)))
            f.write(struct.pack('<3B', 10, 20, 30))
            f.write(struct.pack('<d', 0.1))
            f.write(struct.pack('<Q', 0))
    for i in range(4):
        arr = (rng.random((h, w, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(imgdir / f'view_{i}.png')
    return w, h, fx


def test_load_colmap_dataset(tmp_path):
    w, h, fx = _make_colmap_scene(tmp_path)
    ds = load_colmap_dataset(str(tmp_path), test_step=4)
    assert len(ds.train_views) == 3 and len(ds.test_views) == 1
    v = ds.train_views[0]
    assert v.rgb.shape == (3, h, w)
    assert abs(v.camera.focal_x - fx) < 1e-6
    assert ds.point_cloud[0].shape == (20, 3)
    dd = ds.to_device_dataset()
    assert dd.rgb.shape == (3, 3, h, w)
    # half-res loading rescales intrinsics
    ds2 = load_colmap_dataset(str(tmp_path), image_scale_factor=0.5,
                              test_step=4)
    v2 = ds2.train_views[0]
    assert v2.rgb.shape == (3, h // 2, w // 2)
    assert abs(v2.camera.focal_x - fx / 2) < 1e-5


def test_load_blender_dataset(tmp_path):
    rng = np.random.default_rng(1)
    frames = []
    for i in range(3):
        c2w = np.eye(4)
        c2w[:3, 3] = rng.normal(0, 2, 3)
        frames.append({'file_path': f'./r_{i}',
                       'transform_matrix': c2w.tolist()})
        arr = (rng.random((32, 40, 4)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(tmp_path / f'r_{i}.png')
    meta = {'camera_angle_x': 0.8, 'frames': frames}
    (tmp_path / 'transforms_train.json').write_text(json.dumps(meta))
    ds = load_blender_dataset(str(tmp_path))
    assert len(ds.train_views) == 3
    v = ds.train_views[0]
    assert v.rgb.shape == (3, 32, 40)
    assert v.alpha.shape == (1, 32, 40)
    expected_focal = 0.5 * 40 / np.tan(0.4)
    assert abs(v.camera.focal_x - expected_focal) < 1e-4


def test_structured_gaussian_scene():
    """The garden-parity stand-in scene (data/synthetic.py): surface-
    aligned, unit quaternions, sane scales/opacities, textured colors."""
    from fastergs_tpu.data.synthetic import structured_gaussian_scene
    s = structured_gaussian_scene(5000, seed=3)
    n = len(s['means'])
    assert n == 5000
    for k, v in s.items():
        assert np.isfinite(v).all(), k
    assert np.allclose(np.linalg.norm(s['rotations'], axis=1), 1.0,
                       atol=1e-5)
    scales = np.exp(s['scales'])
    assert scales.min() > 1e-5 and scales.max() < 20.0
    # colors carry real spatial texture: SH0 varies across the scene
    assert s['sh_coefficients_0'].std() > 0.2
    # surface anisotropy: the normal-axis scale is much smaller than the
    # tangent scales for most ground/object splats
    ratio = scales[:, 2] / np.maximum(scales[:, :2].mean(axis=1), 1e-9)
    assert np.median(ratio) < 0.5
