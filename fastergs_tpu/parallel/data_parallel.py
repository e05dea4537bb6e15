"""Multi-chip view-parallel training over a device mesh.

The reference is explicitly single-GPU (reference: Renderer.py:55-58 warns
and falls back; no distributed code exists — SURVEY.md §2.2). This module is
the TPU-native scaling path that EXCEEDS the reference: data parallelism over
views. Each device renders a different training view against replicated
Gaussian state; per-Gaussian gradients are mean-reduced with `psum` over ICI;
the fused Adam update then runs identically (replicated) on every device.
Densification-info updates are likewise psum-reduced, so the maintenance
schedule sees the sum of all views' statistics — the multi-view analog of
the reference accumulating one view per iteration.

Built on `shard_map` over a 1D 'views' mesh axis, XLA inserting the
collectives — no NCCL/MPI analog needed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from fastergs_tpu.engine.train_step import (
    DeviceDataset, TrainStepStatics, camera_for_view, compute_view_grads)
from fastergs_tpu.models.maintenance import ModelState
from fastergs_tpu.ops.adam import AdamConfig, adam_step
from fastergs_tpu.ops.mcmc import add_noise
from fastergs_tpu.models.gaussians import effective_raw_params

AXIS = 'views'


def make_view_parallel_train_step(mesh: Mesh, statics: TrainStepStatics):
    """Builds a jitted multi-chip train step.

    Call signature: step(state, data, view_indices (D,), lrs, noise_lr, key)
    where D == mesh size; state is replicated, view_indices sharded.
    """

    def _shard_body(state: ModelState, data: DeviceDataset,
                    view_idx: jnp.ndarray, lrs: dict,
                    noise_lr: jnp.ndarray, key: jax.Array):
        # per-device: its own view (view_idx arrives as shape (1,))
        idx = view_idx[0]
        my = jax.lax.axis_index(AXIS)
        cam = camera_for_view(data, idx, statics)
        key_bg, key_noise = jax.random.split(key)
        if statics.use_random_background:
            bg = jax.random.uniform(jax.random.fold_in(key_bg, my), (3,))
        else:
            bg = data.bg_color

        g_params, visible, g_mean2d, metrics = compute_view_grads(
            state.params, state.filter_3d, state.n_active, cam,
            data.rgb[idx], data.alpha[idx], bg, statics)

        # mean-reduce gradients over the view axis (ICI all-reduce)
        n_dev = jax.lax.axis_size(AXIS)
        g_params = jax.tree_util.tree_map(
            lambda g: jax.lax.psum(g, AXIS) / n_dev, g_params)
        metrics = {k: jax.lax.pmean(v.astype(jnp.float32), AXIS)
                   for k, v in metrics.items()}

        new_info = state.densification_info
        if statics.update_densification_info:
            ndc = 0.5 * g_mean2d * jnp.asarray(
                [float(statics.width), float(statics.height)])[None, :]
            grad_norm = jnp.linalg.norm(ndc, axis=-1)
            info_update = jnp.stack([
                visible.astype(jnp.float32),
                jnp.where(visible, grad_norm, 0.0)])
            new_info = new_info + jax.lax.psum(info_update, AXIS)

        cap = state.params['means'].shape[0]
        active = jnp.arange(cap, dtype=jnp.int32) < state.n_active
        new_params, new_adam = adam_step(state.params, g_params, state.adam,
                                         lrs, AdamConfig(), mask=active)

        if statics.inject_noise:
            eff = effective_raw_params(new_params, state.filter_3d,
                                       statics.use_original_3d_filter)
            noise = jax.random.normal(key_noise, (cap, 3))
            new_params = dict(new_params, means=add_noise(
                new_params['means'], eff[1], eff[2], eff[3], noise,
                noise_lr, active_mask=active))
        if statics.use_optimized_3d_filter:
            new_params = dict(new_params, scales=jnp.maximum(
                new_params['scales'], state.filter_3d[:, None]))

        new_state = ModelState(
            params=new_params, adam=new_adam, densification_info=new_info,
            filter_3d=state.filter_3d, n_active=state.n_active)
        return new_state, metrics

    replicated = P()
    sharded_views = P(AXIS)
    body = shard_map(
        _shard_body, mesh=mesh,
        in_specs=(replicated, replicated, sharded_views, replicated,
                  replicated, replicated),
        out_specs=(replicated, replicated),
        # the blend while_loop carries are initialized unvarying but become
        # varying (they depend on the per-device view) — skip VMA checking
        check_vma=False)

    @functools.partial(jax.jit, donate_argnames=('state',))
    def step(state, data, view_indices, lrs, noise_lr, key):
        return body(state, data, view_indices, lrs, noise_lr, key)

    return step


def make_mesh(n_devices: int | None = None) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(devices, (AXIS,))
