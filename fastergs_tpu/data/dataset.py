"""Dataset abstraction.

Provides the host-framework dataset surface the reference consumes
(SURVEY.md §2.3: Datasets.Base.BaseDataset — iterable views, .train() mode,
.point_cloud, .bounding_box, .default_camera; reference usage:
Trainer.py:85-109, Model.py:148-198) plus the TPU-specific
`to_device_dataset()` that stacks all training views into device arrays —
the equivalent of the host's PRELOADING_LEVEL=2 "store training images in
VRAM" (fastergs_garden.yaml:22), which is what keeps the jitted train step
free of host transfers.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np
import jax.numpy as jnp

from fastergs_tpu.data.cameras import View
from fastergs_tpu.engine.train_step import DeviceDataset


class BaseDataset:
    """A posed multi-view dataset with optional SfM points."""

    def __init__(self,
                 train_views: List[View],
                 test_views: Optional[List[View]] = None,
                 point_cloud: Optional[Tuple[np.ndarray, Optional[np.ndarray]]] = None,
                 background_color: Optional[np.ndarray] = None) -> None:
        self.train_views = train_views
        self.test_views = test_views or []
        self.point_cloud = point_cloud  # (positions (N,3), colors (N,3) or None)
        self.background_color = (np.zeros(3, np.float32)
                                 if background_color is None
                                 else np.asarray(background_color, np.float32))
        self._mode = 'train'

    # reference-style mode switches (Datasets.Base usage in Trainer.py)
    def train(self) -> 'BaseDataset':
        self._mode = 'train'
        return self

    def test(self) -> 'BaseDataset':
        self._mode = 'test'
        return self

    def __iter__(self):
        return iter(self.train_views if self._mode == 'train' else self.test_views)

    def __len__(self) -> int:
        return len(self.train_views if self._mode == 'train' else self.test_views)

    @property
    def default_camera(self):
        return self.train_views[0].camera

    def bounding_box(self, padding: float = 0.05):
        """(min, size) of the scene: SfM points if present, else camera hull."""
        if self.point_cloud is not None:
            pts = self.point_cloud[0]
        else:
            pts = np.stack([v.position for v in self.train_views])
        lo = pts.min(axis=0)
        hi = pts.max(axis=0)
        size = hi - lo
        return (lo - padding * size).astype(np.float32), \
               ((1 + 2 * padding) * size).astype(np.float32)

    def to_device_dataset(self) -> DeviceDataset:
        views = self.train_views
        shapes = {(v.camera.height, v.camera.width) for v in views}
        if len(shapes) != 1:
            raise ValueError(
                f'device preloading requires uniform view sizes, got {shapes}')
        h, w = next(iter(shapes))
        rgb = np.stack([np.asarray(v.rgb, np.float32) for v in views])
        if views[0].alpha is not None:
            alpha = np.stack([np.asarray(v.alpha, np.float32) for v in views])
        else:
            alpha = np.ones((len(views), 1, h, w), np.float32)
        w2c = np.stack([v.w2c34 for v in views])
        cam_pos = np.stack([v.position for v in views])
        intr = np.stack([
            [v.camera.focal_x, v.camera.focal_y, v.camera.center_x,
             v.camera.center_y, v.camera.near_plane, v.camera.far_plane]
            for v in views]).astype(np.float32)
        timestamps = np.asarray([v.timestamp for v in views], np.float32)
        return DeviceDataset(
            rgb=jnp.asarray(rgb), alpha=jnp.asarray(alpha),
            w2c=jnp.asarray(w2c), cam_position=jnp.asarray(cam_pos),
            intrinsics=jnp.asarray(intr),
            bg_color=jnp.asarray(self.background_color),
            timestamps=jnp.asarray(timestamps))
