"""Dynamic (4D) Gaussians: time-conditioned splatting.

TPU-native analog of the reference's FasterGS4D branch (not present in the
checkout; README.md:39 describes it as dynamic 4D Gaussians trained on
Neural 3D Video). This implementation uses the Spacetime-Gaussian-style
factorization, which maps cleanly onto the existing 3D rasterizer:

- polynomial motion:      mean(t)   = mean + v*dt + a*dt^2
- linear rotation drift:  quat(t)   = quat + omega*dt   (stays unnormalized —
  the rasterizer's quaternion math is scale-invariant, kernel_utils.cuh:15-30)
- temporal opacity:       opacity(t) = opacity * exp(-0.5 * (dt/sigma_t)^2)

with dt = t - mu_t. All five temporal parameter groups ride through the
generic padded-capacity maintenance machinery (models/maintenance.py) —
densify/prune/sort/MCMC operate on the params dict by key, so temporal
groups need no special casing.
"""

from __future__ import annotations

import jax.numpy as jnp

from fastergs_tpu.models.gaussians import Gaussians, FasterGSModel
from fastergs_tpu.models.maintenance import ModelState
from fastergs_tpu.ops.adam import init_adam_state, lr_decay_policy

TEMPORAL_PARAM_NAMES = ('time_means', 'time_scales', 'velocities',
                        'accelerations', 'rotation_rates')


def temporal_adapt(params: dict, t) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Evaluates the motion/visibility model at time t.

    Returns (means_t, rotations_t, opacity_factor) — differentiable w.r.t.
    all temporal parameters, so their gradients flow through the standard
    render VJP with no rasterizer changes.
    """
    dt = t - params['time_means'][:, 0]                      # (N,)
    means_t = (params['means']
               + params['velocities'] * dt[:, None]
               + params['accelerations'] * (dt * dt)[:, None])
    rotations_t = params['rotations'] + params['rotation_rates'] * dt[:, None]
    sigma_t = jnp.exp(params['time_scales'][:, 0])
    opacity_factor = jnp.exp(-0.5 * (dt / jnp.maximum(sigma_t, 1e-6)) ** 2)
    return means_t, rotations_t, opacity_factor


class Gaussians4D(Gaussians):
    """Gaussians + temporal parameters."""

    is_temporal = True

    def initialize_from_point_cloud(self, positions, colors, use_mcmc: bool,
                                    capacity=None,
                                    initial_time_scale: float = 0.5) -> None:
        super().initialize_from_point_cloud(positions, colors, use_mcmc,
                                            capacity)
        cap = self.capacity
        st = self.state
        params = dict(st.params)
        params['time_means'] = jnp.full((cap, 1), 0.5, jnp.float32)
        params['time_scales'] = jnp.full(
            (cap, 1), jnp.log(initial_time_scale), jnp.float32)
        params['velocities'] = jnp.zeros((cap, 3), jnp.float32)
        params['accelerations'] = jnp.zeros((cap, 3), jnp.float32)
        params['rotation_rates'] = jnp.zeros((cap, 4), jnp.float32)
        self.state = ModelState(
            params=params, adam=init_adam_state(params),
            densification_info=st.densification_info,
            filter_3d=st.filter_3d, n_active=st.n_active)

    def training_setup(self, optimizer_config, percent_dense: float,
                       training_cameras_extent: float) -> None:
        super().training_setup(optimizer_config, percent_dense,
                               training_cameras_extent)
        c = optimizer_config
        extent = training_cameras_extent
        self.lrs.update({
            'time_means': getattr(c, 'LEARNING_RATE_TIME_MEANS', 8e-4),
            'time_scales': getattr(c, 'LEARNING_RATE_TIME_SCALES', 2e-3),
            'velocities': getattr(c, 'LEARNING_RATE_VELOCITIES', 1.6e-4) * extent,
            'accelerations': getattr(c, 'LEARNING_RATE_ACCELERATIONS', 1.6e-4) * extent,
            'rotation_rates': getattr(c, 'LEARNING_RATE_ROTATION_RATES', 1e-3),
        })

    def temporal_params_at(self, t):
        return temporal_adapt(self.state.params, t)


class FasterGS4DModel(FasterGSModel):
    """Model wrapper for the dynamic variant."""

    def build(self) -> 'FasterGS4DModel':
        pretrained = self.num_iterations_trained > 0
        self.gaussians = Gaussians4D(self.SH_DEGREE, pretrained)
        return self
