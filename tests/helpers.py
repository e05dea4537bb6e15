"""Shared test fixtures: random scenes and cameras."""

import numpy as np
import jax.numpy as jnp

from fastergs_tpu.ops.projection import CameraParams
from fastergs_tpu.ops.rasterize import RasterizerSettings


def make_camera(width=64, height=48, near=0.2, far=100.0) -> CameraParams:
    # camera at origin looking down +z
    w2c = np.eye(4, dtype=np.float32)[:3]
    return CameraParams(
        w2c=jnp.asarray(w2c),
        cam_position=jnp.zeros(3),
        focal_x=jnp.float32(0.9 * width), focal_y=jnp.float32(0.9 * width),
        center_x=jnp.float32(width / 2), center_y=jnp.float32(height / 2),
        near_plane=jnp.float32(near), far_plane=jnp.float32(far),
        width=width, height=height,
    )


def make_scene(n=500, seed=0, sh_degree=3, spread=1.2):
    """Random Gaussians roughly in front of the camera."""
    rng = np.random.default_rng(seed)
    means = np.stack([
        rng.uniform(-spread, spread, n),
        rng.uniform(-spread, spread, n),
        rng.uniform(1.0, 6.0, n),
    ], axis=-1).astype(np.float32)
    raw_scales = rng.uniform(np.log(0.01), np.log(0.15), (n, 3)).astype(np.float32)
    raw_rotations = rng.normal(0, 1, (n, 4)).astype(np.float32)
    raw_opacities = rng.uniform(-2.0, 3.0, (n,)).astype(np.float32)
    n_bases = (sh_degree + 1) ** 2
    sh_0 = rng.normal(0, 0.8, (n, 1, 3)).astype(np.float32)
    sh_rest = rng.normal(0, 0.1, (n, n_bases - 1, 3)).astype(np.float32)
    return tuple(jnp.asarray(a) for a in
                 (means, raw_scales, raw_rotations, raw_opacities, sh_0, sh_rest))


def make_settings(cam, bg=(0.0, 0.0, 0.0), active_sh_bases=16,
                  proper_antialiasing=False) -> RasterizerSettings:
    return RasterizerSettings(
        camera=cam,
        bg_color=jnp.asarray(np.array(bg, dtype=np.float32)),
        active_sh_bases=active_sh_bases,
        proper_antialiasing=proper_antialiasing,
    )
