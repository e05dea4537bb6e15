"""COLMAP dataset loader (MipNeRF360-style scenes).

Standalone replacement for the NeRFICG host's MipNeRF360/COLMAP dataset
(reference config: fastergs_garden.yaml:105-118 — DATASET_TYPE: MipNeRF360,
IMAGE_SCALE_FACTOR, TEST_STEP, background color, near/far planes). Parses
COLMAP binary/text model files (cameras/images/points3D) with pure
NumPy — no COLMAP dependency.

Supported camera models: SIMPLE_PINHOLE, PINHOLE, SIMPLE_RADIAL, RADIAL,
OPENCV (distortion parameters are carried on the camera; the rasterizer
warns and ignores them, like the reference, Renderer.py:26-27).
"""

from __future__ import annotations

import os
import struct
from typing import Optional

import numpy as np

from fastergs_tpu.data.cameras import PerspectiveCamera, View
from fastergs_tpu.data.dataset import BaseDataset
from fastergs_tpu.utils.logging import log_info

_CAMERA_MODELS = {
    0: ('SIMPLE_PINHOLE', 3), 1: ('PINHOLE', 4), 2: ('SIMPLE_RADIAL', 4),
    3: ('RADIAL', 5), 4: ('OPENCV', 8), 5: ('OPENCV_FISHEYE', 8),
    6: ('FULL_OPENCV', 12), 7: ('FOV', 5), 8: ('SIMPLE_RADIAL_FISHEYE', 4),
    9: ('RADIAL_FISHEYE', 5), 10: ('THIN_PRISM_FISHEYE', 12),
}


def _read(f, fmt):
    return struct.unpack(fmt, f.read(struct.calcsize(fmt)))


def read_cameras_bin(path: str) -> dict:
    cameras = {}
    with open(path, 'rb') as f:
        (n,) = _read(f, '<Q')
        for _ in range(n):
            cam_id, model_id, width, height = _read(f, '<iiQQ')
            name, n_params = _CAMERA_MODELS[model_id]
            params = np.array(_read(f, f'<{n_params}d'))
            cameras[cam_id] = dict(model=name, width=int(width),
                                   height=int(height), params=params)
    return cameras


def read_images_bin(path: str) -> dict:
    images = {}
    with open(path, 'rb') as f:
        (n,) = _read(f, '<Q')
        for _ in range(n):
            image_id = _read(f, '<i')[0]
            qvec = np.array(_read(f, '<4d'))
            tvec = np.array(_read(f, '<3d'))
            cam_id = _read(f, '<i')[0]
            name = b''
            while (c := f.read(1)) != b'\x00':
                name += c
            (n_pts,) = _read(f, '<Q')
            f.seek(24 * n_pts, os.SEEK_CUR)  # skip 2D points
            images[image_id] = dict(qvec=qvec, tvec=tvec, camera_id=cam_id,
                                    name=name.decode('utf-8'))
    return images


def read_points3d_bin(path: str):
    with open(path, 'rb') as f:
        (n,) = _read(f, '<Q')
        xyz = np.empty((n, 3), np.float32)
        rgb = np.empty((n, 3), np.float32)
        for i in range(n):
            _read(f, '<Q')  # point id
            xyz[i] = _read(f, '<3d')
            rgb[i] = _read(f, '<3B')
            _read(f, '<d')  # error
            (track_len,) = _read(f, '<Q')
            f.seek(8 * track_len, os.SEEK_CUR)
    return xyz, rgb / 255.0


def read_cameras_txt(path: str) -> dict:
    cameras = {}
    for line in open(path):
        if line.startswith('#') or not line.strip():
            continue
        parts = line.split()
        cameras[int(parts[0])] = dict(
            model=parts[1], width=int(parts[2]), height=int(parts[3]),
            params=np.array([float(p) for p in parts[4:]]))
    return cameras


def read_images_txt(path: str) -> dict:
    images = {}
    lines = [ln for ln in open(path)
             if not ln.startswith('#') and ln.strip()]
    for meta in lines[::2]:
        parts = meta.split()
        images[int(parts[0])] = dict(
            qvec=np.array([float(p) for p in parts[1:5]]),
            tvec=np.array([float(p) for p in parts[5:8]]),
            camera_id=int(parts[8]), name=parts[9])
    return images


def read_points3d_txt(path: str):
    xyz, rgb = [], []
    for line in open(path):
        if line.startswith('#') or not line.strip():
            continue
        parts = line.split()
        xyz.append([float(p) for p in parts[1:4]])
        rgb.append([float(p) for p in parts[4:7]])
    return (np.asarray(xyz, np.float32),
            np.asarray(rgb, np.float32) / 255.0)


def _qvec_to_rotmat(q):
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)]])


def _intrinsics(cam: dict):
    model, params = cam['model'], cam['params']
    distortion: Optional[np.ndarray] = None
    if model == 'SIMPLE_PINHOLE':
        fx = fy = params[0]; cx, cy = params[1:3]
    elif model == 'PINHOLE':
        fx, fy, cx, cy = params[:4]
    elif model in ('SIMPLE_RADIAL', 'SIMPLE_RADIAL_FISHEYE'):
        fx = fy = params[0]; cx, cy = params[1:3]
        distortion = params[3:]
    elif model in ('RADIAL', 'RADIAL_FISHEYE'):
        fx = fy = params[0]; cx, cy = params[1:3]
        distortion = params[3:]
    elif model in ('OPENCV', 'OPENCV_FISHEYE', 'FULL_OPENCV'):
        fx, fy, cx, cy = params[:4]
        distortion = params[4:]
    else:
        raise ValueError(f'unsupported camera model {model}')
    return float(fx), float(fy), float(cx), float(cy), distortion


def _load_image(path: str, scale_factor: float):
    from PIL import Image
    img = Image.open(path)
    if scale_factor != 1.0:
        img = img.resize((int(round(img.width * scale_factor)),
                          int(round(img.height * scale_factor))),
                         Image.LANCZOS)
    arr = np.asarray(img, np.float32) / 255.0
    if arr.ndim == 2:
        arr = np.repeat(arr[..., None], 3, axis=-1)
    rgb = arr[..., :3].transpose(2, 0, 1)
    alpha = arr[..., 3:4].transpose(2, 0, 1) if arr.shape[-1] == 4 else None
    return rgb, alpha


def resolve_images_dir(path: str, image_scale_factor: float):
    """Shared images_N/pre-scaled resolution (MipNeRF360 convention:
    images_2 / images_4 / images_8 hold pre-downsampled copies).

    Returns (images_dir, pre_scaled): the directory the loader will read
    and whether its images are already at the target scale. ONE definition
    used by both load_colmap_dataset and validate_colmap_layout so the
    dry-run validator can never drift from the loader's convention.
    """
    factor = round(1.0 / image_scale_factor) if image_scale_factor else 1
    candidate = os.path.join(path, f'images_{factor}')
    pre_scaled = factor > 1 and os.path.isdir(candidate)
    images_dir = candidate if pre_scaled else os.path.join(path, 'images')
    return images_dir, pre_scaled


def validate_colmap_layout(path: str, image_scale_factor: float = 1.0):
    """Dry-run validation of a COLMAP capture directory (no image decode).

    Checks the standard MipNeRF360 layout (<path>/sparse[/0]/{cameras,
    images, points3D}.{bin,txt} + <path>/images[_N]/), parses the sparse
    model headers, and cross-checks that every registered image file exists.
    Returns a report dict; raises DatasetError with an actionable message on
    the first structural problem. Used by `cli.train --dry-run` so a garden
    parity run can be validated before committing to a full training job.
    """
    from fastergs_tpu.utils.errors import DatasetError

    if not os.path.isdir(path):
        raise DatasetError(f'dataset path does not exist: {path}')
    sparse = os.path.join(path, 'sparse', '0')
    if not os.path.isdir(sparse):
        sparse = os.path.join(path, 'sparse')
    if not os.path.isdir(sparse):
        raise DatasetError(
            f'no sparse/0/ or sparse/ model under {path} — expected the '
            'standard COLMAP export (cameras/images/points3D as .bin or .txt)')
    is_bin = os.path.exists(os.path.join(sparse, 'cameras.bin'))
    ext = '.bin' if is_bin else '.txt'
    for stem in ('cameras', 'images', 'points3D'):
        f = os.path.join(sparse, stem + ext)
        if not os.path.exists(f):
            raise DatasetError(f'missing {f}')
    if is_bin:
        cameras = read_cameras_bin(os.path.join(sparse, 'cameras.bin'))
        images = read_images_bin(os.path.join(sparse, 'images.bin'))
        xyz, _ = read_points3d_bin(os.path.join(sparse, 'points3D.bin'))
    else:
        cameras = read_cameras_txt(os.path.join(sparse, 'cameras.txt'))
        images = read_images_txt(os.path.join(sparse, 'images.txt'))
        xyz, _ = read_points3d_txt(os.path.join(sparse, 'points3D.txt'))
    if not images:
        raise DatasetError(f'sparse model at {sparse} registers no images')
    if xyz.shape[0] == 0:
        raise DatasetError(f'sparse model at {sparse} has no 3D points')
    for info in images.values():
        if info['camera_id'] not in cameras:
            raise DatasetError(
                f"image '{info['name']}' references unknown camera id "
                f"{info['camera_id']}")

    factor = round(1.0 / image_scale_factor) if image_scale_factor else 1
    candidate = os.path.join(path, f'images_{factor}')
    images_dir, pre_scaled = resolve_images_dir(path, image_scale_factor)
    if not os.path.isdir(images_dir):
        raise DatasetError(
            f'no images directory: expected {images_dir}'
            + (f' or {candidate}' if factor > 1 and not pre_scaled else ''))
    missing = [info['name'] for info in images.values()
               if not os.path.exists(os.path.join(images_dir, info['name']))]
    if missing:
        raise DatasetError(
            f'{len(missing)} registered image(s) missing from {images_dir}, '
            f'first: {missing[0]}')
    cam0 = cameras[next(iter(cameras))]
    return {
        'sparse_dir': sparse, 'format': ext[1:], 'images_dir': images_dir,
        'pre_scaled': pre_scaled, 'n_views': len(images),
        'n_points': int(xyz.shape[0]), 'n_cameras': len(cameras),
        'camera_model': cam0.get('model', '?'),
        'full_res': (cam0['width'], cam0['height']),
    }


def load_colmap_dataset(
    path: str,
    image_scale_factor: float = 1.0,
    test_step: int = 8,
    background_color=(0.0, 0.0, 0.0),
    near_plane: float = 0.2,
    far_plane: float = 10_000.0,
    images_dir: Optional[str] = None,
    load_images: bool = True,
) -> BaseDataset:
    """Loads <path>/sparse/0 (bin or txt) + <path>/images[_N]."""
    sparse = os.path.join(path, 'sparse', '0')
    if not os.path.isdir(sparse):
        sparse = os.path.join(path, 'sparse')
    if os.path.exists(os.path.join(sparse, 'cameras.bin')):
        from fastergs_tpu import native
        cameras = read_cameras_bin(os.path.join(sparse, 'cameras.bin'))
        images = native.read_images_bin(os.path.join(sparse, 'images.bin'))
        if images is None:
            images = read_images_bin(os.path.join(sparse, 'images.bin'))
        pts = native.read_points3d_bin(os.path.join(sparse, 'points3D.bin'))
        if pts is None:
            pts = read_points3d_bin(os.path.join(sparse, 'points3D.bin'))
        xyz, rgb = pts
    else:
        cameras = read_cameras_txt(os.path.join(sparse, 'cameras.txt'))
        images = read_images_txt(os.path.join(sparse, 'images.txt'))
        xyz, rgb = read_points3d_txt(os.path.join(sparse, 'points3D.txt'))

    if images_dir is None:
        images_dir, pre_scaled = resolve_images_dir(path, image_scale_factor)
    else:
        pre_scaled = False

    ordered = [images[i] for i in sorted(images, key=lambda i: images[i]['name'])]

    # decode images in a thread pool (PIL releases the GIL during decode)
    loaded = [None] * len(ordered)
    if load_images:
        from concurrent.futures import ThreadPoolExecutor

        def _load_one(idx_info):
            idx, info = idx_info
            scale = 1.0 if pre_scaled else image_scale_factor
            loaded[idx] = _load_image(
                os.path.join(images_dir, info['name']), scale)

        with ThreadPoolExecutor(max_workers=16) as pool:
            list(pool.map(_load_one, enumerate(ordered)))

    views = []
    for idx, info in enumerate(ordered):
        cam = cameras[info['camera_id']]
        fx, fy, cx, cy, distortion = _intrinsics(cam)
        w, h = cam['width'], cam['height']
        R = _qvec_to_rotmat(info['qvec'])
        w2c = np.concatenate([R, info['tvec'][:, None]], axis=1).astype(np.float32)
        camera = PerspectiveCamera(
            width=w, height=h, focal_x=fx, focal_y=fy, center_x=cx,
            center_y=cy, near_plane=near_plane, far_plane=far_plane,
            background_color=np.asarray(background_color, np.float32),
            distortion=distortion)
        rgb_img = alpha_img = None
        if load_images:
            rgb_img, alpha_img = loaded[idx]
            camera = PerspectiveCamera(
                width=rgb_img.shape[2], height=rgb_img.shape[1],
                focal_x=fx * rgb_img.shape[2] / w,
                focal_y=fy * rgb_img.shape[1] / h,
                center_x=cx * rgb_img.shape[2] / w,
                center_y=cy * rgb_img.shape[1] / h,
                near_plane=near_plane, far_plane=far_plane,
                background_color=np.asarray(background_color, np.float32),
                distortion=distortion)
        elif image_scale_factor != 1.0:
            camera = camera.scaled(image_scale_factor)
        views.append(View(camera=camera, w2c=w2c, rgb=rgb_img,
                          alpha=alpha_img, name=info['name']))

    train_views = [v for i, v in enumerate(views) if i % test_step != 0]
    test_views = [v for i, v in enumerate(views) if i % test_step == 0]
    log_info(f'COLMAP dataset: {len(train_views)} train / {len(test_views)} '
             f'test views, {xyz.shape[0]:,} SfM points')
    return BaseDataset(train_views, test_views, point_cloud=(xyz, rgb),
                       background_color=np.asarray(background_color, np.float32))
