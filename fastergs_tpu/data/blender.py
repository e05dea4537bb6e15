"""Blender/NeRF-synthetic dataset loader (transforms_{train,test}.json).

Companion to the COLMAP loader; covers the NeRF-synthetic family the NeRFICG
host supports. Converts the OpenGL-style camera-to-world matrices (x right,
y up, z back) to this framework's w2c convention (y down, z forward — see
data/cameras.py).
"""

from __future__ import annotations

import json
import os

import numpy as np

from fastergs_tpu.data.cameras import PerspectiveCamera, View
from fastergs_tpu.data.dataset import BaseDataset
from fastergs_tpu.utils.logging import log_info


def _load_split(path: str, split: str, scale: float, bg, near, far):
    meta = json.load(open(os.path.join(path, f'transforms_{split}.json')))
    views = []
    from PIL import Image
    for frame in meta['frames']:
        img_path = os.path.join(path, frame['file_path'])
        if not os.path.splitext(img_path)[1]:
            img_path += '.png'
        img = Image.open(img_path)
        if scale != 1.0:
            img = img.resize((int(img.width * scale), int(img.height * scale)),
                             Image.LANCZOS)
        arr = np.asarray(img, np.float32) / 255.0
        rgb = arr[..., :3].transpose(2, 0, 1)
        alpha = (arr[..., 3:4].transpose(2, 0, 1)
                 if arr.shape[-1] == 4 else None)
        h, w = rgb.shape[1:]
        focal = 0.5 * w / np.tan(0.5 * float(meta['camera_angle_x']))
        c2w = np.asarray(frame['transform_matrix'], np.float32)
        # OpenGL → our convention: flip y and z camera axes
        c2w[:3, 1:3] *= -1.0
        w2c = np.linalg.inv(c2w)[:3].astype(np.float32)
        cam = PerspectiveCamera(
            width=w, height=h, focal_x=focal, focal_y=focal,
            center_x=w / 2, center_y=h / 2, near_plane=near, far_plane=far,
            background_color=np.asarray(bg, np.float32))
        views.append(View(camera=cam, w2c=w2c, rgb=rgb, alpha=alpha,
                          name=frame['file_path']))
    return views


def load_blender_dataset(
    path: str,
    image_scale_factor: float = 1.0,
    background_color=(0.0, 0.0, 0.0),
    near_plane: float = 0.05,
    far_plane: float = 100.0,
) -> BaseDataset:
    train_views = _load_split(path, 'train', image_scale_factor,
                              background_color, near_plane, far_plane)
    try:
        test_views = _load_split(path, 'test', image_scale_factor,
                                 background_color, near_plane, far_plane)
    except FileNotFoundError:
        test_views = []
    log_info(f'Blender dataset: {len(train_views)} train / '
             f'{len(test_views)} test views')
    # no SfM points: trainer falls back to random init + carving
    return BaseDataset(train_views, test_views, point_cloud=None,
                       background_color=np.asarray(background_color, np.float32))
