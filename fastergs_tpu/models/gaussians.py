"""Gaussian parameter store and model-level operations.

TPU-native equivalent of the reference's `Gaussians` + `FasterGSModel`
(reference: Model.py:22-566). The torch.nn.Module with dynamically resized
Parameters becomes a host-side orchestrator over an immutable, padded
`ModelState` pytree (models/maintenance.py): the hot path stays jitted at a
fixed capacity; capacity grows in powers-of-two buckets when densification
approaches the limit (bounded recompiles instead of per-step reallocation —
this also replaces the reference's `enable_expandable_segments` allocator
workaround, utils.py:13-26, which has no TPU analog or need).
"""

from __future__ import annotations

import math
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from fastergs_tpu.ops.adam import AdamState, init_adam_state, lr_decay_policy
from fastergs_tpu.ops.filter3d import compute_3d_filter, stack_view_cameras
from fastergs_tpu.ops.knn import rms_knn_distances
from fastergs_tpu.ops.math import logit, sigmoid, quaternion_to_rotation_matrix
from fastergs_tpu.models import maintenance
from fastergs_tpu.models.maintenance import ModelState, PARAM_NAMES
from fastergs_tpu.utils.logging import log_info, log_warning


def _round_capacity(n: int, minimum: int = 4096) -> int:
    cap = minimum
    while cap < n:
        cap *= 2
    return cap


def effective_raw_params(params: dict, filter_3d: jnp.ndarray,
                         use_original_3d_filter: bool) -> tuple:
    """Returns (means, raw_scales, raw_rotations, raw_opacities, sh0, sh_rest)
    as fed to the rasterizer, with the original Mip-Splatting 3D filter folded
    into scales and opacities when active (reference properties raw_scales /
    raw_opacities, Model.py:61-67,93-104; filter stored squared in this mode,
    Model.py:194-195). Differentiable — gradients flow through the folding to
    the underlying parameters exactly as in the reference autograd graph.
    """
    means = params['means']
    raw_scales = params['scales']
    raw_opacities = params['opacities']
    if use_original_3d_filter:
        var = jnp.exp(2.0 * raw_scales)
        var_f = var + filter_3d[:, None]
        raw_scales = 0.5 * jnp.log(var_f)
        coef = jnp.sqrt(jnp.prod(var, axis=1) / jnp.maximum(jnp.prod(var_f, axis=1), 1e-30))
        raw_opacities = logit(sigmoid(raw_opacities) * coef[:, None], eps=1e-6)
    return (means, raw_scales, params['rotations'], raw_opacities,
            params['sh_coefficients_0'], params['sh_coefficients_rest'])


class Gaussians:
    """Stores a set of 3D Gaussians (reference: Model.py:22-504)."""

    is_temporal = False  # True for the 4D family (models/gaussians4d.py)

    def __init__(self, sh_degree: int, pretrained: bool) -> None:
        self.max_sh_degree = sh_degree
        self.active_sh_degree = sh_degree if pretrained else 0
        self.active_sh_bases = (self.active_sh_degree + 1) ** 2
        self.state: Optional[ModelState] = None
        self.percent_dense = 0.0
        self.training_cameras_extent = 1.0
        self.use_original_3d_filter = False
        self.use_optimized_3d_filter = False
        self.distance2filter = 0.0
        self.lr_means = 0.0
        self.lr_means_scheduler = None
        self.lrs: dict = {}
        self._n_active_host: int = 0  # host mirror of state.n_active

    # ------------------------------------------------------------------ #
    # capacity / state plumbing
    # ------------------------------------------------------------------ #
    @property
    def capacity(self) -> int:
        return self.state.params['means'].shape[0]

    @property
    def n_active(self) -> int:
        return self._n_active_host

    def _sync_n_active(self) -> None:
        self._n_active_host = int(self.state.n_active)

    def ensure_capacity(self, needed: int) -> bool:
        """Grows all state arrays to a bucketed capacity >= needed."""
        if needed <= self.capacity:
            return False
        new_cap = _round_capacity(needed, minimum=self.capacity * 2)
        pad = new_cap - self.capacity

        def grow(a):
            widths = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
            return jnp.pad(a, widths)

        st = self.state
        self.state = ModelState(
            params={k: grow(v) for k, v in st.params.items()},
            adam=AdamState(mu={k: grow(v) for k, v in st.adam.mu.items()},
                           nu={k: grow(v) for k, v in st.adam.nu.items()},
                           step=st.adam.step),
            densification_info=jnp.pad(st.densification_info, ((0, 0), (0, pad))),
            filter_3d=grow(st.filter_3d),
            n_active=st.n_active,
        )
        log_info(f'grew Gaussian capacity to {new_cap:,}')
        return True

    # ------------------------------------------------------------------ #
    # activated views of the parameters (reference properties, Model.py:47-132)
    # ------------------------------------------------------------------ #
    def _active_slice(self, a):
        return a[:self.n_active]

    @property
    def means(self):
        return self._active_slice(self.state.params['means'])

    @property
    def raw_scales(self):
        return self._active_slice(effective_raw_params(
            self.state.params, self.state.filter_3d,
            self.use_original_3d_filter)[1])

    @property
    def scales(self):
        return jnp.exp(self.raw_scales)

    @property
    def raw_rotations(self):
        return self._active_slice(self.state.params['rotations'])

    @property
    def rotations(self):
        q = self.raw_rotations
        return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)

    @property
    def raw_opacities(self):
        return self._active_slice(effective_raw_params(
            self.state.params, self.state.filter_3d,
            self.use_original_3d_filter)[3])

    @property
    def opacities(self):
        return sigmoid(self.raw_opacities)

    @property
    def sh_coefficients_0(self):
        return self._active_slice(self.state.params['sh_coefficients_0'])

    @property
    def sh_coefficients_rest(self):
        return self._active_slice(self.state.params['sh_coefficients_rest'])

    @property
    def sh_coefficients(self):
        return jnp.concatenate([self.sh_coefficients_0,
                                self.sh_coefficients_rest], axis=1)

    @property
    def covariances(self):
        R = quaternion_to_rotation_matrix(self.rotations, normalize=False)
        RS = R * self.scales[:, None, :]
        return RS @ jnp.swapaxes(RS, -1, -2)

    @property
    def densification_info(self):
        return self.state.densification_info

    def increase_used_sh_degree(self) -> None:
        """Reference: Model.py:142-146."""
        if self.active_sh_degree < self.max_sh_degree:
            self.active_sh_degree += 1
            self.active_sh_bases = (self.active_sh_degree + 1) ** 2

    # ------------------------------------------------------------------ #
    # initialization (reference: Model.py:200-249)
    # ------------------------------------------------------------------ #
    def initialize_from_point_cloud(self, positions, colors, use_mcmc: bool,
                                    capacity: Optional[int] = None) -> None:
        positions = jnp.asarray(positions, jnp.float32)
        n = positions.shape[0]
        cap = capacity or _round_capacity(n)
        log_info(f'number of Gaussians at initialization: {n:,} (capacity {cap:,})')

        if colors is None:
            rgbs = jnp.full((n, 3), 0.5)
        else:
            rgbs = jnp.asarray(colors, jnp.float32)
        sh0 = ((rgbs - 0.5) / 0.28209479177387814)[:, None, :]
        n_rest = (self.max_sh_degree + 1) ** 2 - 1

        distances = rms_knn_distances(positions)
        distances = distances * 0.1 if use_mcmc else distances
        scales = jnp.log(jnp.maximum(distances, 1e-10))[:, None].repeat(3, axis=1)

        initial_opacity = 0.5 if use_mcmc else 0.1
        op_logit = math.log(initial_opacity / (1.0 - initial_opacity))

        def padded(a, fill=0.0):
            widths = [(0, cap - n)] + [(0, 0)] * (a.ndim - 1)
            return jnp.pad(a, widths, constant_values=fill)

        params = {
            'means': padded(positions),
            'sh_coefficients_0': padded(sh0),
            'sh_coefficients_rest': jnp.zeros((cap, n_rest, 3), jnp.float32),
            'opacities': jnp.full((cap, 1), op_logit, jnp.float32),
            'scales': padded(scales),
            'rotations': padded(jnp.tile(jnp.asarray([1.0, 0, 0, 0], jnp.float32), (n, 1))),
        }
        self.state = ModelState(
            params=params,
            adam=init_adam_state(params),
            densification_info=jnp.zeros((2, cap), jnp.float32),
            filter_3d=jnp.zeros((cap,), jnp.float32),
            n_active=jnp.int32(n),
        )
        self._n_active_host = n

    def training_setup(self, optimizer_config, percent_dense: float,
                       training_cameras_extent: float) -> None:
        """Learning rates per group + means schedule (reference: Model.py:229-249)."""
        self.percent_dense = percent_dense
        self.training_cameras_extent = training_cameras_extent
        c = optimizer_config
        self.lrs = {
            'means': c.LEARNING_RATE_MEANS_INIT * training_cameras_extent,
            'sh_coefficients_0': c.LEARNING_RATE_SH_COEFFICIENTS_0,
            'sh_coefficients_rest': c.LEARNING_RATE_SH_COEFFICIENTS_REST,
            'opacities': c.LEARNING_RATE_OPACITIES,
            'scales': c.LEARNING_RATE_SCALES,
            'rotations': c.LEARNING_RATE_ROTATIONS,
        }
        self.lr_means_scheduler = lr_decay_policy(
            lr_init=c.LEARNING_RATE_MEANS_INIT * training_cameras_extent,
            lr_final=c.LEARNING_RATE_MEANS_FINAL * training_cameras_extent,
            max_steps=c.LEARNING_RATE_MEANS_MAX_STEPS)

    def update_learning_rate(self, iteration: int) -> None:
        self.lr_means = float(self.lr_means_scheduler(iteration))
        self.lrs['means'] = self.lr_means

    # ------------------------------------------------------------------ #
    # 3D filter (reference: Model.py:148-198)
    # ------------------------------------------------------------------ #
    def setup_3d_filter(self, filter_config, views) -> None:
        if filter_config.ORIGINAL_FORMULATION:
            self.use_original_3d_filter = True
            log_info(f'using mip-splatting 3d filter with variance '
                     f'{filter_config.FILTER_VARIANCE}')
        else:
            self.use_optimized_3d_filter = True
            log_info(f'using optimized 3d filter with variance '
                     f'{filter_config.FILTER_VARIANCE}')
        max_focal = max(max(v.camera.focal_x, v.camera.focal_y) for v in views)
        self.distance2filter = math.sqrt(filter_config.FILTER_VARIANCE) / max_focal
        self.compute_3d_filter(views)

    def compute_3d_filter(self, views, clipping_tolerance: float = 0.15) -> None:
        w2cs, intr, near = stack_view_cameras(views)
        mask = jnp.arange(self.capacity) < self.state.n_active
        filt, _ = compute_3d_filter(
            self.state.params['means'], w2cs, intr, near,
            jnp.float32(self.distance2filter), active_mask=mask,
            clipping_tolerance=clipping_tolerance)
        if self.use_original_3d_filter:
            filt = filt ** 2       # Model.py:194-195 (squared form)
        elif self.use_optimized_3d_filter:
            filt = jnp.log(jnp.maximum(filt, 1e-30))  # Model.py:196-197 (log)
        self.state = self.state._replace(filter_3d=filt)

    # ------------------------------------------------------------------ #
    # maintenance (delegating to jitted kernels)
    # ------------------------------------------------------------------ #
    def reset_densification_info(self) -> None:
        self.state = maintenance.reset_densification_info(self.state)

    def reset_opacities(self) -> None:
        self.state = maintenance.reset_opacities(
            self.state, self.use_original_3d_filter)

    def adaptive_density_control(self, key, grad_threshold: float,
                                 min_opacity: float,
                                 prune_large_gaussians: bool) -> None:
        # leave headroom: grow if the last round used > 2/3 of capacity
        if self.n_active * 3 > self.capacity * 2:
            self.ensure_capacity(self.n_active * 2)
        self.state, n_requested = maintenance.adaptive_density_control(
            self.state, key, grad_threshold, min_opacity,
            jnp.bool_(prune_large_gaussians), self.percent_dense,
            self.training_cameras_extent)
        self._sync_n_active()
        if int(n_requested) > self.capacity:
            log_warning(f'densification requested {int(n_requested):,} rows; '
                        f'capacity {self.capacity:,} — clones dropped, '
                        'growing for next round')
            self.ensure_capacity(int(n_requested))

    def mcmc_densification(self, key, min_opacity: float, cap_max: int) -> None:
        if self.n_active * 3 > self.capacity * 2 and self.capacity < cap_max:
            self.ensure_capacity(min(self.n_active * 2, _round_capacity(cap_max)))
        self.state, _ = maintenance.mcmc_densification(
            self.state, key, min_opacity, jnp.int32(cap_max))
        self._sync_n_active()

    def apply_morton_ordering(self) -> None:
        self.state = maintenance.morton_sort(self.state)

    def importance_pruning(self, scores, pruning_ratio: float) -> None:
        self.state = maintenance.importance_pruning(self.state, scores,
                                                    pruning_ratio)
        self._sync_n_active()

    def opacity_regularization_loss(self):
        """Reference: Model.py:134-136 (mean of activated opacities)."""
        return jnp.mean(self.opacities)

    def scale_regularization_loss(self):
        """Reference: Model.py:138-140 (mean of activated scales)."""
        return jnp.mean(self.scales)

    def training_cleanup(self, min_opacity: float) -> int:
        """Bake filter, prune, Morton sort, drop optimizer
        (reference: Model.py:475-504)."""
        if self.use_optimized_3d_filter:
            self.use_optimized_3d_filter = False  # already baked into scales
        elif self.use_original_3d_filter:
            # fold filter into opacities THEN scales (order matters,
            # Model.py:483-486)
            _, raw_scales, _, raw_op, _, _ = effective_raw_params(
                self.state.params, self.state.filter_3d, True)
            params = dict(self.state.params, opacities=raw_op, scales=raw_scales)
            self.state = self.state._replace(params=params)
            self.use_original_3d_filter = False
        self.state = self.state._replace(filter_3d=jnp.zeros_like(self.state.filter_3d))

        op_act = sigmoid(self.state.params['opacities'][:, 0])
        self.state = maintenance.training_cleanup_prune(
            self.state, min_opacity, op_act)
        self._sync_n_active()
        return self.n_active

    # ------------------------------------------------------------------ #
    # export (reference: Model.py:506-537)
    # ------------------------------------------------------------------ #
    def as_ply_dict(self) -> dict:
        from fastergs_tpu.models.ply import gaussians_to_ply_dict
        return gaussians_to_ply_dict(self)


class FasterGSModel:
    """Reference: Model.py:540-566 — thin model wrapper with build()."""

    def __init__(self, sh_degree: int = 3, name: str | None = None) -> None:
        self.SH_DEGREE = sh_degree
        self.name = name
        self.num_iterations_trained = 0
        self.gaussians: Optional[Gaussians] = None

    def build(self) -> 'FasterGSModel':
        pretrained = self.num_iterations_trained > 0
        self.gaussians = Gaussians(self.SH_DEGREE, pretrained)
        return self

    def get_ply_dict(self, proper_antialiasing: bool = False) -> dict:
        data = {}
        if self.gaussians is None or not (data := self.gaussians.as_ply_dict()):
            return data
        splat_render_mode = 'mip-0.1' if proper_antialiasing else 'default'
        data['comments'] = [f'SplatRenderMode: {splat_render_mode}',
                            'Generated with fastergs_tpu']
        return data
