"""Renderer: view → image entry points.

Equivalent of the reference FasterGSRenderer (reference: Renderer.py:45-133):
training / inference / benchmark render paths and the Speedy-Splat
pruning-score accumulation over a dataset. The multi-GPU warning and CPU
refusal (Renderer.py:55-58) have no analog — the TPU build is single-chip
first with optional mesh parallelism in fastergs_tpu.parallel.
"""

from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp

from fastergs_tpu.config import Configurable
from fastergs_tpu.ops.projection import CameraParams
from fastergs_tpu.ops.pruning import update_pruning_scores
from fastergs_tpu.ops.rasterize import (
    RasterizerSettings, diff_rasterize, rasterize)


def extract_settings(view, active_sh_bases: int, bg_color,
                     proper_antialiasing: bool) -> RasterizerSettings:
    """Reference: Renderer.py:18-42."""
    return RasterizerSettings(
        camera=CameraParams.from_view(view),
        bg_color=jnp.asarray(bg_color, jnp.float32).reshape(3),
        active_sh_bases=active_sh_bases,
        proper_antialiasing=proper_antialiasing)


@Configurable.configure(
    SCALE_MODIFIER=1.0,
    PROPER_ANTIALIASING=False,
    FORCE_OPTIMIZED_INFERENCE=False,
    INSTANCE_CAP=1 << 21,
)
class FasterGSRenderer(Configurable):
    """Reference: Renderer.py:50-133."""

    def __init__(self, model, config_overrides: dict | None = None) -> None:
        self.apply_config(config_overrides)
        self.model = model

    def _gaussian_args(self, scale_offset: float = 0.0, view=None):
        """Per-view Gaussian arrays; applies the 4D temporal model when the
        underlying Gaussians are dynamic (models/gaussians4d.py).

        Returns (args tuple, opacity_factor or None)."""
        g = self.model.gaussians
        raw_scales = g.raw_scales
        if scale_offset != 0.0:
            raw_scales = raw_scales + scale_offset
        opacity_factor = None
        means, rotations = g.means, g.raw_rotations
        if getattr(g, 'is_temporal', False) and view is not None:
            means_t, rot_t, factor = g.temporal_params_at(
                jnp.float32(view.timestamp))
            n = g.n_active
            means, rotations = means_t[:n], rot_t[:n]
            opacity_factor = factor[:n]
        args = (means, raw_scales, rotations, g.raw_opacities,
                g.sh_coefficients_0, g.sh_coefficients_rest)
        return args, opacity_factor

    def render_image(self, view, to_chw: bool = False,
                     benchmark: bool = False) -> dict:
        """Reference: Renderer.py:60-67."""
        if benchmark or self.FORCE_OPTIMIZED_INFERENCE:
            return self.render_image_benchmark(view, to_chw=to_chw or benchmark)
        return self.render_image_inference(view, to_chw)

    def render_image_training(self, view, bg_color) -> jnp.ndarray:
        """Differentiable render path (reference: Renderer.py:69-81).

        Note: the production trainer uses the fused engine.train_step instead;
        this entry point exists for API parity and interactive use.
        """
        g = self.model.gaussians
        settings = extract_settings(view, g.active_sh_bases, bg_color,
                                    self.PROPER_ANTIALIASING)
        args, opacity_factor = self._gaussian_args(view=view)
        image, _ = diff_rasterize(*args, settings,
                                  instance_cap=self.INSTANCE_CAP,
                                  opacity_factor=opacity_factor)
        return image

    def render_image_inference(self, view, to_chw: bool = False) -> dict:
        """Reference: Renderer.py:83-97 — honors SCALE_MODIFIER, clamps."""
        g = self.model.gaussians
        settings = extract_settings(view, g.active_sh_bases,
                                    view.camera.background_color,
                                    self.PROPER_ANTIALIASING)
        offset = math.log(max(self.SCALE_MODIFIER, 1e-6))
        args, opacity_factor = self._gaussian_args(offset, view=view)
        image, _ = diff_rasterize(*args, settings,
                                  instance_cap=self.INSTANCE_CAP,
                                  opacity_factor=opacity_factor)
        image = jnp.clip(image, 0.0, 1.0)
        return {'rgb': image if to_chw else image.transpose(1, 2, 0)}

    def render_image_benchmark(self, view, to_chw: bool = False) -> dict:
        """Fast path (reference: Renderer.py:99-112 → _C.inference)."""
        g = self.model.gaussians
        settings = extract_settings(view, g.active_sh_bases,
                                    view.camera.background_color,
                                    self.PROPER_ANTIALIASING)
        args, opacity_factor = self._gaussian_args(view=view)
        image = rasterize(*args, settings, to_chw=to_chw,
                          instance_cap=self.INSTANCE_CAP,
                          opacity_factor=opacity_factor)
        return {'rgb': image}

    def compute_pruning_scores(self, dataset) -> jnp.ndarray:
        """Reference: Renderer.py:114-129 — accumulates Speedy-Splat scores
        over all training views. Operates at full capacity so the result
        aligns with model state rows."""
        g = self.model.gaussians
        cap = g.capacity
        active = jnp.arange(cap) < g.state.n_active
        eff = self._full_capacity_args()
        scores = jnp.zeros(cap, jnp.float32)
        for view in dataset.train_views:
            settings = extract_settings(view, g.active_sh_bases,
                                        view.camera.background_color,
                                        self.PROPER_ANTIALIASING)
            scores = update_pruning_scores(
                scores, *eff, settings, active_mask=active,
                instance_cap=self.INSTANCE_CAP)
        return scores

    def _full_capacity_args(self):
        from fastergs_tpu.models.gaussians import effective_raw_params
        g = self.model.gaussians
        eff = effective_raw_params(g.state.params, g.state.filter_3d,
                                   g.use_original_3d_filter)
        return (eff[0], eff[1], eff[2], eff[3], eff[4], eff[5])

    def postprocess_outputs(self, outputs: dict, *_) -> dict:
        return {'rgb': outputs['rgb']}
