"""Write a capture directory (PNG images + binary COLMAP sparse model).

The inverse of `data/colmap.py`: produces exactly the on-disk layout the
reference trains from (<root>/images/*.png + <root>/sparse/0/{cameras,
images,points3D}.bin — COLMAP's binary format, scene_manager-compatible).
Used by the capture e2e test and the garden parity tool to materialize
synthetic ground truth as a real capture the production loader ingests.
"""

from __future__ import annotations

import struct
from pathlib import Path

import numpy as np


def rotmat_to_qvec(R: np.ndarray) -> np.ndarray:
    """Rotation matrix -> COLMAP (w, x, y, z) quaternion."""
    t = np.trace(R)
    if t > 0:
        s = np.sqrt(t + 1.0) * 2
        return np.array([0.25 * s, (R[2, 1] - R[1, 2]) / s,
                         (R[0, 2] - R[2, 0]) / s, (R[1, 0] - R[0, 1]) / s])
    i = int(np.argmax(np.diag(R)))
    j, k = (i + 1) % 3, (i + 2) % 3
    s = np.sqrt(R[i, i] - R[j, j] - R[k, k] + 1.0) * 2
    q = np.empty(4)
    q[0] = (R[k, j] - R[j, k]) / s
    q[1 + i] = 0.25 * s
    q[1 + j] = (R[j, i] + R[i, j]) / s
    q[1 + k] = (R[k, i] + R[i, k]) / s
    return q


def write_colmap_capture(root, views, images, points: np.ndarray,
                         colors: np.ndarray) -> None:
    """Writes <root>/images/*.png and <root>/sparse/0/*.bin.

    views: View objects (poses + camera intrinsics; one shared camera).
    images: per-view (3, H, W) float arrays in [0, 1].
    points/colors: SfM-like sparse point cloud, colors in [0, 1].
    """
    from PIL import Image
    root = Path(root)
    img_dir = root / 'images'
    sparse = root / 'sparse' / '0'
    img_dir.mkdir(parents=True, exist_ok=True)
    sparse.mkdir(parents=True, exist_ok=True)

    for v, img in zip(views, images):
        arr = (np.clip(np.asarray(img), 0, 1) * 255).astype(np.uint8)
        Image.fromarray(arr.transpose(1, 2, 0)).save(
            img_dir / f'{v.name}.png')

    cam = views[0].camera
    with open(sparse / 'cameras.bin', 'wb') as f:
        f.write(struct.pack('<Q', 1))
        f.write(struct.pack('<iiQQ', 1, 1, cam.width, cam.height))  # PINHOLE
        f.write(struct.pack('<4d', cam.focal_x, cam.focal_y,
                            cam.center_x, cam.center_y))

    with open(sparse / 'images.bin', 'wb') as f:
        f.write(struct.pack('<Q', len(views)))
        for i, v in enumerate(views):
            R, t = v.w2c34[:, :3], v.w2c34[:, 3]
            f.write(struct.pack('<i', i + 1))
            f.write(struct.pack('<4d', *rotmat_to_qvec(R)))
            f.write(struct.pack('<3d', *t))
            f.write(struct.pack('<i', 1))
            f.write(f'{v.name}.png'.encode() + b'\x00')
            f.write(struct.pack('<Q', 0))

    with open(sparse / 'points3D.bin', 'wb') as f:
        f.write(struct.pack('<Q', len(points)))
        for i in range(len(points)):
            f.write(struct.pack('<i', i + 1) + struct.pack('<i', 0))
            f.write(struct.pack('<3d', *points[i]))
            f.write(struct.pack('<3B', *(np.clip(colors[i], 0, 1)
                                         * 255).astype(np.uint8)))
            f.write(struct.pack('<d', 0.5))
            f.write(struct.pack('<Q', 0))
