"""Synthetic datasets for testing and benchmarking.

Generates a ground-truth Gaussian scene, renders it from a ring of cameras
with the framework's own inference rasterizer, and packages the result as a
BaseDataset. Self-consistent end-to-end target: a fresh model trained on
these renders must converge to high PSNR — the framework's substitute for
the MipNeRF360 data the reference benchmarks on (no dataset shipping here).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from fastergs_tpu.data.cameras import PerspectiveCamera, View
from fastergs_tpu.data.dataset import BaseDataset
from fastergs_tpu.ops.projection import CameraParams
from fastergs_tpu.ops.rasterize import RasterizerSettings, rasterize


def ring_cameras(n_views: int, radius: float, width: int, height: int,
                 focal: float, target=(0.0, 0.0, 0.0), elevation: float = 0.35,
                 near: float = 0.05, far: float = 100.0,
                 bg=(0.0, 0.0, 0.0)) -> list:
    """Cameras on a ring looking at the origin (look-at, y-down image)."""
    target = np.asarray(target, np.float32)
    views = []
    for i in range(n_views):
        angle = 2 * np.pi * i / n_views
        pos = target + radius * np.array(
            [np.cos(angle), elevation, np.sin(angle)], np.float32)
        fwd = target - pos
        fwd = fwd / np.linalg.norm(fwd)
        up = np.array([0.0, -1.0, 0.0], np.float32)  # y-down convention
        right = np.cross(up, fwd)
        right /= np.linalg.norm(right)
        down = np.cross(fwd, right)
        R = np.stack([right, down, fwd])  # world→cam rows
        t = -R @ pos
        w2c = np.concatenate([R, t[:, None]], axis=1).astype(np.float32)
        cam = PerspectiveCamera(
            width=width, height=height, focal_x=focal, focal_y=focal,
            center_x=width / 2, center_y=height / 2, near_plane=near,
            far_plane=far,
            background_color=np.asarray(bg, np.float32))
        views.append(View(camera=cam, w2c=w2c, name=f'view_{i:03d}'))
    return views


def random_gaussian_scene(n: int, seed: int = 0, extent: float = 1.0,
                          sh_degree: int = 3):
    rng = np.random.default_rng(seed)
    means = rng.uniform(-extent, extent, (n, 3)).astype(np.float32)
    # splat size tied to expected point spacing (mirrors the kNN-distance
    # initialization, Model.py:211-213) so screen-space footprints stay
    # realistic at any n — a few tiles per splat, like real SfM scenes
    spacing = 2.0 * extent / max(n, 8) ** (1.0 / 3.0)
    raw_scales = rng.uniform(np.log(0.25 * spacing), np.log(1.0 * spacing),
                             (n, 3)).astype(np.float32)
    raw_rotations = rng.normal(0, 1, (n, 4)).astype(np.float32)
    raw_opacities = rng.uniform(0.0, 3.0, (n, 1)).astype(np.float32)
    sh0 = rng.normal(0, 0.7, (n, 1, 3)).astype(np.float32)
    n_rest = (sh_degree + 1) ** 2 - 1
    sh_rest = (rng.normal(0, 0.05, (n, n_rest, 3)).astype(np.float32))
    return dict(means=means, scales=raw_scales, rotations=raw_rotations,
                opacities=raw_opacities, sh_coefficients_0=sh0,
                sh_coefficients_rest=sh_rest)


def make_synthetic_dataset(
    n_gaussians: int = 2000, n_views: int = 24, width: int = 128,
    height: int = 96, focal: float = 110.0, seed: int = 0,
    bg=(0.0, 0.0, 0.0), test_step: int = 8, instance_cap: int = 1 << 18,
) -> tuple:
    """Returns (BaseDataset, ground-truth scene dict)."""
    scene = random_gaussian_scene(n_gaussians, seed=seed)
    views = ring_cameras(n_views, radius=3.2, width=width, height=height,
                        focal=focal, bg=bg)
    gt_args = (jnp.asarray(scene['means']), jnp.asarray(scene['scales']),
               jnp.asarray(scene['rotations']),
               jnp.asarray(scene['opacities']),
               jnp.asarray(scene['sh_coefficients_0']),
               jnp.asarray(scene['sh_coefficients_rest']))
    for v in views:
        settings = RasterizerSettings(
            camera=CameraParams.from_view(v),
            bg_color=jnp.asarray(np.asarray(bg, np.float32)),
            active_sh_bases=(3 + 1) ** 2)
        v.rgb = np.asarray(rasterize(*gt_args, settings, to_chw=True,
                                     instance_cap=instance_cap))

    train_views = [v for i, v in enumerate(views) if i % test_step != 0]
    test_views = [v for i, v in enumerate(views) if i % test_step == 0]
    # SfM-like noisy point cloud from the ground-truth means
    rng = np.random.default_rng(seed + 1)
    keep = rng.random(n_gaussians) < 0.5
    positions = scene['means'][keep] + rng.normal(
        0, 0.02, (int(keep.sum()), 3)).astype(np.float32)
    colors = np.clip(
        0.5 + 0.28209479177387814 * scene['sh_coefficients_0'][keep, 0], 0, 1)
    dataset = BaseDataset(train_views, test_views,
                          point_cloud=(positions, colors),
                          background_color=np.asarray(bg, np.float32))
    return dataset, scene


def make_synthetic_video_dataset(
    n_gaussians: int = 1000, n_cameras: int = 8, n_times: int = 6,
    width: int = 96, height: int = 64, focal: float = 80.0, seed: int = 0,
    bg=(0.0, 0.0, 0.0), motion_scale: float = 0.25,
    instance_cap: int = 1 << 16,
) -> tuple:
    """Dynamic scene: Gaussians move linearly over t in [0, 1]; each view is
    a (camera, time) pair — the Neural-3D-Video-style target for the 4D
    model family (reference FasterGS4D branch, README.md:39)."""
    import jax
    from fastergs_tpu.models.gaussians4d import temporal_adapt
    scene = random_gaussian_scene(n_gaussians, seed=seed)
    rng = np.random.default_rng(seed + 7)
    velocities = rng.normal(0, motion_scale, (n_gaussians, 3)).astype(np.float32)
    gt_params = {
        'means': jnp.asarray(scene['means']),
        'rotations': jnp.asarray(scene['rotations']),
        'velocities': jnp.asarray(velocities),
        'accelerations': jnp.zeros((n_gaussians, 3)),
        'rotation_rates': jnp.zeros((n_gaussians, 4)),
        'time_means': jnp.full((n_gaussians, 1), 0.5),
        'time_scales': jnp.full((n_gaussians, 1), np.log(10.0)),  # always on
    }
    cameras = ring_cameras(n_cameras, radius=3.2, width=width, height=height,
                           focal=focal, bg=bg)
    views = []
    for ti in range(n_times):
        t = ti / max(n_times - 1, 1)
        means_t, rot_t, op_factor = temporal_adapt(gt_params, jnp.float32(t))
        for cam_view in cameras:
            settings = RasterizerSettings(
                camera=CameraParams.from_view(cam_view),
                bg_color=jnp.asarray(np.asarray(bg, np.float32)),
                active_sh_bases=16)
            rgb = rasterize(
                means_t, jnp.asarray(scene['scales']), rot_t,
                jnp.asarray(scene['opacities']),
                jnp.asarray(scene['sh_coefficients_0']),
                jnp.asarray(scene['sh_coefficients_rest']),
                settings, to_chw=True, instance_cap=instance_cap)
            from fastergs_tpu.data.cameras import View
            views.append(View(camera=cam_view.camera, w2c=cam_view.w2c,
                              rgb=np.asarray(rgb), timestamp=t,
                              name=f'{cam_view.name}_t{ti}'))
    train_views = [v for i, v in enumerate(views) if i % 8 != 0]
    test_views = [v for i, v in enumerate(views) if i % 8 == 0]
    keep = rng.random(n_gaussians) < 0.6
    positions = scene['means'][keep]
    colors = np.clip(
        0.5 + 0.28209479177387814 * scene['sh_coefficients_0'][keep, 0], 0, 1)
    dataset = BaseDataset(train_views, test_views,
                          point_cloud=(positions, colors),
                          background_color=np.asarray(bg, np.float32))
    return dataset, scene
