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


def _surface_rotations(normals: np.ndarray, rng) -> np.ndarray:
    """Raw quaternions (w, x, y, z) rotating local +z onto each normal,
    composed with a random spin about the normal (disc-like splats stay
    tangent to the surface whatever the in-plane orientation)."""
    n = normals / np.maximum(np.linalg.norm(normals, axis=1, keepdims=True),
                             1e-9)
    z = np.array([0.0, 0.0, 1.0], np.float32)
    # quaternion from z to n: axis = z x n, w = 1 + z.n (normalized)
    axis = np.cross(np.broadcast_to(z, n.shape), n)
    w = 1.0 + n[:, 2:3]
    q = np.concatenate([w, axis], axis=1)
    # degenerate case n == -z: 180 deg about x
    flip = w[:, 0] < 1e-6
    q[flip] = np.array([0.0, 1.0, 0.0, 0.0], np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    # spin about local z BEFORE alignment: q_total = q * spin
    half = rng.uniform(0.0, np.pi, (len(n), 1)).astype(np.float32)
    spin = np.concatenate(
        [np.cos(half), np.zeros_like(half), np.zeros_like(half),
         np.sin(half)], axis=1)
    w1, x1, y1, z1 = q.T
    w2, x2, y2, z2 = spin.T
    return np.stack([
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2], axis=1).astype(np.float32)


def _texture(p: np.ndarray, base, accent, freq: float, seed_phase: float):
    """Smooth multi-octave trig texture in [0, 1]^3: sharp-ish color
    variation over position without any image assets."""
    x, y, z = p[:, 0], p[:, 1], p[:, 2]
    t = (np.sin(freq * x + seed_phase) * np.cos(0.7 * freq * z)
         + 0.5 * np.sin(2.3 * freq * (x + z) + 1.7)
         + 0.25 * np.sin(5.1 * freq * x - 3.3 * freq * z + 0.4)
         + 0.12 * np.sin(11.0 * freq * (x - z)))
    t = (t / 1.87 + 1.0) * 0.5  # -> [0, 1]
    t = t[:, None].astype(np.float32)
    base = np.asarray(base, np.float32)
    accent = np.asarray(accent, np.float32)
    return base + t * (accent - base)


def structured_gaussian_scene(n: int, seed: int = 0, sh_degree: int = 3):
    """Photoreal-ish procedural garden stand-in: surface-aligned Gaussians
    on a textured ground disc, a central bush over a trunk, scattered
    rocks, and a distant sky dome. Unlike `random_gaussian_scene` (a
    uniform transparent cloud) this has occluding surfaces, sharp texture
    gradients, and mild view-dependent sheen — the closest available
    target to the reference's MipNeRF360 garden capture
    (fastergs_garden.yaml:106-118), which cannot ship here.

    World convention matches ring_cameras (y-down images, up = -y): the
    ground plane sits at y = +1.0; cameras should orbit at negative
    elevation (above the ground) looking at the origin.
    """
    rng = np.random.default_rng(seed)
    parts = []  # (positions, normals, tangent_scale, normal_scale, rgb, op)

    def add(pos, nrm, tan_s, nrm_s, rgb, op):
        parts.append((pos.astype(np.float32), nrm.astype(np.float32),
                      tan_s.astype(np.float32), nrm_s.astype(np.float32),
                      rgb.astype(np.float32), op.astype(np.float32)))

    # --- ground disc (textured grass + dirt path), y = +1.0 ---
    ng = int(0.45 * n)
    r = 4.2 * np.sqrt(rng.random(ng))
    th = rng.uniform(0, 2 * np.pi, ng)
    pos = np.stack([r * np.cos(th), np.full(ng, 1.0), r * np.sin(th)], 1)
    pos[:, 1] += rng.normal(0, 0.01, ng)  # slight relief
    grass = _texture(pos, (0.18, 0.34, 0.10), (0.45, 0.62, 0.22), 3.1, 0.0)
    # a dirt path crossing the disc: banded along a diagonal
    band = np.abs(pos[:, 0] * 0.8 + pos[:, 2] * 0.6 + 0.4)
    on_path = (band < 0.55)[:, None]
    dirt = _texture(pos, (0.38, 0.30, 0.20), (0.55, 0.46, 0.33), 7.0, 2.1)
    rgb = np.where(on_path, dirt, grass)
    spacing = 4.2 / np.sqrt(max(ng, 4))
    tan_s = rng.uniform(1.6, 3.2, (ng, 1)) * spacing * (1.0 + 0.25 * r[:, None])
    add(pos, np.tile([0.0, -1.0, 0.0], (ng, 1)), tan_s,
        0.08 * tan_s, rgb, rng.uniform(2.5, 4.0, (ng, 1)))

    # --- central bush: sphere shell at (0, 0.0, 0), radius 0.85 ---
    nb = int(0.20 * n)
    d = rng.normal(0, 1, (nb, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    rad = 0.85 + rng.normal(0, 0.05, (nb, 1))
    pos = np.array([0.0, 0.0, 0.0]) + d * rad
    rgb = _texture(pos, (0.10, 0.25, 0.06), (0.35, 0.55, 0.15), 9.0, 4.2)
    s = np.full((nb, 1), 2.4) * (0.85 * 2 / np.sqrt(max(nb, 4)))
    add(pos, d, s * rng.uniform(0.8, 1.3, (nb, 1)), 0.2 * s, rgb,
        rng.uniform(2.0, 3.5, (nb, 1)))

    # --- trunk: cylinder r=0.22 from the bush down to the ground ---
    nt = int(0.08 * n)
    th = rng.uniform(0, 2 * np.pi, nt)
    y = rng.uniform(0.55, 1.0, nt)
    pos = np.stack([0.22 * np.cos(th), y, 0.22 * np.sin(th)], 1)
    nrm = np.stack([np.cos(th), np.zeros(nt), np.sin(th)], 1)
    rgb = _texture(pos, (0.30, 0.20, 0.12), (0.45, 0.33, 0.22), 16.0, 1.3)
    s = np.full((nt, 1), 2.0) * (0.9 / np.sqrt(max(nt, 4)))
    add(pos, nrm, s, 0.15 * s, rgb, rng.uniform(3.0, 4.5, (nt, 1)))

    # --- rocks: small spheres scattered on the ground ---
    nr = int(0.12 * n)
    n_rocks = 6
    centers = np.stack([rng.uniform(-3.0, 3.0, n_rocks),
                        np.full(n_rocks, 0.85),
                        rng.uniform(-3.0, 3.0, n_rocks)], 1)
    radii = rng.uniform(0.15, 0.4, n_rocks)
    which = rng.integers(0, n_rocks, nr)
    d = rng.normal(0, 1, (nr, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    pos = centers[which] + d * radii[which][:, None]
    gray = rng.uniform(0.25, 0.55, (n_rocks, 1))[which]
    rgb = np.repeat(gray, 3, axis=1) * _texture(
        pos, (0.8, 0.78, 0.75), (1.15, 1.1, 1.05), 21.0, 6.6)
    s = 2.2 * radii[which][:, None] / np.sqrt(max(nr / n_rocks, 4))
    add(pos, d, s, 0.15 * s, rgb, rng.uniform(3.0, 4.5, (nr, 1)))

    # --- sky dome: big shell, soft blue gradient + cloud streaks ---
    ns = n - sum(len(p[0]) for p in parts)
    d = rng.normal(0, 1, (ns, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d[:, 1] = -np.abs(d[:, 1])  # upper hemisphere only (up = -y)
    pos = d * 14.0
    height01 = np.clip(-d[:, 1], 0, 1)[:, None]
    sky = (np.array([0.75, 0.85, 0.95]) * (1 - height01)
           + np.array([0.35, 0.55, 0.90]) * height01)
    cloud = _texture(pos, (0.0,) * 3, (0.25,) * 3, 0.45, 3.7)
    rgb = np.clip(sky + cloud, 0, 1)
    s = np.full((ns, 1), 3.0) * (14.0 / np.sqrt(max(ns, 4)))
    add(pos, d, s, 0.3 * s, rgb, rng.uniform(1.0, 2.0, (ns, 1)))

    pos = np.concatenate([p[0] for p in parts])
    nrm = np.concatenate([p[1] for p in parts])
    tan_s = np.concatenate([p[2] for p in parts])
    nrm_s = np.concatenate([p[3] for p in parts])
    rgb = np.clip(np.concatenate([p[4] for p in parts]), 0.0, 1.0)
    op = np.concatenate([p[5] for p in parts])

    n_total = len(pos)
    aniso = rng.uniform(0.6, 1.6, (n_total, 1)).astype(np.float32)
    raw_scales = np.log(np.concatenate(
        [tan_s * aniso, tan_s / aniso, np.maximum(nrm_s, 1e-4)],
        axis=1)).astype(np.float32)
    raw_rotations = _surface_rotations(nrm, rng)
    C0 = 0.28209479177387814
    sh0 = ((rgb - 0.5) / C0)[:, None, :].astype(np.float32)
    n_rest = (sh_degree + 1) ** 2 - 1
    sh_rest = rng.normal(0, 0.02, (n_total, n_rest, 3)).astype(np.float32)
    # mild view-dependent sheen on the degree-1 bands of solid surfaces
    sh_rest[:, :3, :] += rng.normal(0, 0.06, (n_total, 3, 3))
    return dict(means=pos.astype(np.float32), scales=raw_scales,
                rotations=raw_rotations,
                opacities=op.astype(np.float32),
                sh_coefficients_0=sh0, sh_coefficients_rest=sh_rest)


def make_synthetic_dataset(
    n_gaussians: int = 2000, n_views: int = 24, width: int = 128,
    height: int = 96, focal: float = 110.0, seed: int = 0,
    bg=(0.0, 0.0, 0.0), test_step: int = 8, instance_cap: int = 1 << 18,
    scene_kind: str = 'random', elevation: float = 0.35,
) -> tuple:
    """Returns (BaseDataset, ground-truth scene dict).

    scene_kind: 'random' (uniform cloud, cheap) or 'structured' (surface
    scene, the garden-parity stand-in — orbit above the ground with a
    negative elevation, e.g. -0.4)."""
    make_scene = (structured_gaussian_scene if scene_kind == 'structured'
                  else random_gaussian_scene)
    scene = make_scene(n_gaussians, seed=seed)
    views = ring_cameras(n_views, radius=3.2, width=width, height=height,
                        focal=focal, bg=bg, elevation=elevation)
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
