"""Neural-3D-Video (DyNeRF) style dataset loader for the 4D family.

TPU-framework analog of the data pipeline the reference's FasterGS4D
branch trains on (reference README.md:39: "dynamic 4D Gaussians ...
trains significantly faster ... than Yang et al. 4DGS" — evaluated on the
Neural 3D Video dataset). Expected layout (the standard preprocessing of
the DyNeRF captures — videos extracted to frames beforehand, e.g. with
ffmpeg; this environment has no video codecs):

    <scene>/poses_bounds.npy          # (N_cams, 17) LLFF poses + bounds
    <scene>/cam00/images/0000.png ... # per-camera extracted frames
    <scene>/cam01/images/0000.png ...

Frame timestamps are frame_index / (n_frames - 1), normalized to [0, 1]
(matching the synthetic video generator, data/synthetic.py). The first
camera is held out for testing by convention (DyNeRF evaluates on cam00).
"""

from __future__ import annotations

import os

import numpy as np

from fastergs_tpu.data.cameras import PerspectiveCamera, View
from fastergs_tpu.data.dataset import BaseDataset
from fastergs_tpu.utils.logging import log_info


def _llff_to_w2c(pose_3x5):
    """LLFF [down, right, back] c2w column convention -> OpenCV w2c."""
    m = pose_3x5[:, :4]
    # LLFF -> OpenGL [right, up, back]: gl = [llff_col1, -llff_col0, llff_col2]
    r_gl = np.stack([m[:, 1], -m[:, 0], m[:, 2]], axis=1)
    pos = m[:, 3]
    # OpenGL -> OpenCV camera axes: x right, y down, z forward
    r_cv = r_gl @ np.diag([1.0, -1.0, -1.0])
    r_w2c = r_cv.T
    t_w2c = -r_w2c @ pos
    return np.concatenate([r_w2c, t_w2c[:, None]], axis=1).astype(np.float32)


def w2c_to_llff(w2c, hwf):
    """Inverse of _llff_to_w2c (used by tests/fixture writers)."""
    r_w2c, t = w2c[:, :3], w2c[:, 3]
    r_cv = r_w2c.T
    pos = -r_cv @ t
    r_gl = r_cv @ np.diag([1.0, -1.0, -1.0])
    llff = np.stack([-r_gl[:, 1], r_gl[:, 0], r_gl[:, 2]], axis=1)
    return np.concatenate([llff, pos[:, None], hwf[:, None]],
                          axis=1).astype(np.float64)


def load_video_dataset(
    path: str,
    image_scale_factor: float = 1.0,
    max_frames: int | None = None,
    test_camera_index: int = 0,
    background_color=(0.0, 0.0, 0.0),
    near_plane: float = 0.05,
    far_plane: float = 100.0,
) -> BaseDataset:
    """Loads an extracted-frames DyNeRF-style capture."""
    from fastergs_tpu.data.colmap import _load_image

    poses_bounds = np.load(os.path.join(path, 'poses_bounds.npy'))
    poses = poses_bounds[:, :15].reshape(-1, 3, 5)
    n_cams = len(poses)
    cam_dirs = sorted(d for d in os.listdir(path)
                      if d.startswith('cam')
                      and os.path.isdir(os.path.join(path, d)))
    if len(cam_dirs) != n_cams:
        raise ValueError(f'{n_cams} poses but {len(cam_dirs)} cam dirs')

    train_views, test_views = [], []
    for ci, cam_dir in enumerate(cam_dirs):
        h, w, focal = poses[ci, :, 4]
        w2c = _llff_to_w2c(poses[ci])
        s = image_scale_factor
        camera = PerspectiveCamera(
            width=int(round(w * s)), height=int(round(h * s)),
            focal_x=float(focal) * s, focal_y=float(focal) * s,
            center_x=w * s / 2, center_y=h * s / 2,
            near_plane=near_plane, far_plane=far_plane,
            background_color=np.asarray(background_color, np.float32))
        img_dir = os.path.join(path, cam_dir, 'images')
        if not os.path.isdir(img_dir):
            img_dir = os.path.join(path, cam_dir)
        frames = sorted(f for f in os.listdir(img_dir)
                        if f.lower().endswith(('.png', '.jpg', '.jpeg')))
        if max_frames is not None:
            frames = frames[:max_frames]
        denom = max(len(frames) - 1, 1)
        for fi, fname in enumerate(frames):
            rgb, alpha = _load_image(os.path.join(img_dir, fname), s)
            view = View(camera=camera, w2c=w2c, rgb=rgb, alpha=alpha,
                        name=f'{cam_dir}/{fname}', timestamp=fi / denom)
            (test_views if ci == test_camera_index else train_views).append(
                view)

    log_info(f'video dataset: {n_cams} cameras, '
             f'{len(train_views)} train / {len(test_views)} test frames')
    # SfM points are typically taken from a COLMAP run on frame 0; fall
    # back to None (random init + carving handles it, utils/carving.py)
    pc = None
    sparse = os.path.join(path, 'sparse', '0')
    if os.path.isdir(sparse):
        from fastergs_tpu.data.colmap import read_points3d_bin
        pts = os.path.join(sparse, 'points3D.bin')
        if os.path.exists(pts):
            pc = read_points3d_bin(pts)
    return BaseDataset(train_views=train_views, test_views=test_views,
                       point_cloud=pc,
                       background_color=np.asarray(background_color,
                                                   np.float32))
