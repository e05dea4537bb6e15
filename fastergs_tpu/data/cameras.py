"""Cameras and views.

Provides the host-framework surface the reference method consumes
(SURVEY.md §2.3): `PerspectiveCamera` with width/height/focal/center/near/far/
background_color/distortion (reference usage: Renderer.py:28-42,
Model.py:177-191) and `View` with camera/w2c/position/rgb/alpha/
project_points (reference usage: Trainer.py:177-189, utils.py:42).

Convention: `w2c` is a (3, 4) or (4, 4) row-major world→camera matrix whose
rows r1/r2/r3 are used exactly like the reference kernels use w2c[0..2]
(kernels_forward.cuh:65-102). Camera looks down +z; pixel (0,0) is top-left,
pixel centers at +0.5.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np
import jax.numpy as jnp


@dataclasses.dataclass
class PerspectiveCamera:
    width: int
    height: int
    focal_x: float
    focal_y: float
    center_x: float
    center_y: float
    near_plane: float = 0.2
    far_plane: float = 10000.0
    background_color: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(3, dtype=np.float32))
    distortion: Optional[np.ndarray] = None

    def scaled(self, factor: float) -> 'PerspectiveCamera':
        """Returns a copy with the image plane rescaled by `factor`."""
        return dataclasses.replace(
            self,
            width=int(round(self.width * factor)),
            height=int(round(self.height * factor)),
            focal_x=self.focal_x * factor,
            focal_y=self.focal_y * factor,
            center_x=self.center_x * factor,
            center_y=self.center_y * factor,
        )


@dataclasses.dataclass
class View:
    """One posed (and optionally photographed) view of the scene."""
    camera: PerspectiveCamera
    w2c: np.ndarray                      # (3, 4) or (4, 4) world→camera
    rgb: Optional[np.ndarray] = None     # (3, H, W) float32 in [0, 1]
    alpha: Optional[np.ndarray] = None   # (1, H, W) float32 in [0, 1]
    name: str = ''
    timestamp: float = 0.0               # used by the 4D (dynamic) model family

    @property
    def w2c34(self) -> np.ndarray:
        return np.asarray(self.w2c, dtype=np.float32)[:3, :4]

    @property
    def c2w(self) -> np.ndarray:
        m = np.eye(4, dtype=np.float32)
        m[:3, :4] = self.w2c34
        return np.linalg.inv(m)

    @property
    def position(self) -> np.ndarray:
        """Camera position in world space: -R^T t."""
        w2c = self.w2c34
        return (-w2c[:3, :3].T @ w2c[:3, 3]).astype(np.float32)

    def project_points(self, points):
        """Projects (N, 3) world points; returns (xy_screen, depth, in_frustum).

        Mirrors the host's View.project_points used by visibility carving
        (reference: utils.py:42-49).
        """
        points = jnp.asarray(points)
        w2c = jnp.asarray(self.w2c34)
        cam = points @ w2c[:3, :3].T + w2c[:3, 3]
        depth = cam[:, 2]
        safe_depth = jnp.where(depth > 1e-12, depth, 1.0)
        x = cam[:, 0] / safe_depth * self.camera.focal_x + self.camera.center_x
        y = cam[:, 1] / safe_depth * self.camera.focal_y + self.camera.center_y
        xy = jnp.stack([x, y], axis=-1)
        in_frustum = ((depth >= self.camera.near_plane)
                      & (depth <= self.camera.far_plane)
                      & (x >= 0.0) & (x < self.camera.width)
                      & (y >= 0.0) & (y < self.camera.height))
        return xy, depth, in_frustum


def apply_background_color(rgb: jnp.ndarray, alpha: jnp.ndarray, bg_color: jnp.ndarray) -> jnp.ndarray:
    """gt = rgb*alpha + bg*(1-alpha), CHW (reference: Trainer.py:187-189)."""
    return rgb * alpha + bg_color[:, None, None] * (1.0 - alpha)
