"""Multi-chip Gaussian-sharded training over a device mesh.

Second scaling strategy beyond the single-GPU reference (SURVEY.md §2.2's
"Gaussian sharding" option), complementing the view-parallel step in
`parallel/data_parallel.py`:

- The model state (parameters, Adam moments, densification info, 3D filter)
  is SHARDED along the Gaussian axis — per-chip HBM holds N/D Gaussians, so
  the model can grow past single-chip memory.
- Per step (ONE view, shared by all chips): each chip preprocesses its own
  Gaussian shard (embarrassingly parallel), the screen-space primitives are
  `all_gather`ed over ICI, and each chip rasterizes only its BAND of tile
  rows (the `tile_row_band` hook in ops/tiles.py) — the dominant blend
  cost shards by image area.
- The per-band premultiplied color accumulators and transmittances combine
  with one `psum` (out-of-band tiles contribute acc=0/trans=1, so
  `psum(acc)` and `psum(trans) - (D-1)` reconstruct the full image), the
  loss and its image cotangent are computed replicated, each chip runs the
  blend backward for its band, and the per-Gaussian primitive cotangents
  are `psum`-reduced before each chip chains them into ITS parameter shard.
- Adam, MCMC noise, and the optimized-3D-filter clamp run on local shards.

Not sharded (replicated per chip): the instance expansion + sort. This
bounds the speedup (Amdahl) but keeps the stream kernels unchanged; the
memory win and preprocess/blend/Adam sharding are the point.

Communication per step: all_gather of the primitive struct (~N x 18 f32),
one image-sized psum, one primitive-cotangent psum — all riding ICI via
XLA collectives, no NCCL analog.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from fastergs_tpu.engine.loss import image_loss
from fastergs_tpu.engine.train_step import (
    DeviceDataset, TrainStepStatics, camera_for_view)
from fastergs_tpu.models.gaussians import effective_raw_params
from fastergs_tpu.models.maintenance import ModelState
from fastergs_tpu.ops.adam import AdamConfig, adam_step
from fastergs_tpu.ops.mcmc import add_noise
from fastergs_tpu.ops.projection import grid_size, preprocess
from fastergs_tpu.ops.rasterize import RasterizerSettings, render_from_primitives

AXIS = 'gaussians'


def _band_for(device: jnp.ndarray, n_devices: int, grid_height: int):
    """Static per-device tile-row band: rows [lo, hi). Uses the device id
    as a traced scalar — bands are ceil-split so every row is covered."""
    rows_per = -(-grid_height // n_devices)
    lo = device * rows_per
    hi = jnp.minimum(lo + rows_per, grid_height)
    return lo, hi


def make_gaussian_parallel_train_step(mesh: Mesh, statics: TrainStepStatics,
                                      view_axis: str | None = None):
    """Builds a jitted Gaussian-sharded train step.

    Call signature: step(state, data, view_idx (), lrs, noise_lr, key).
    `state` arrives SHARDED along the Gaussian axis (leading dim of every
    per-Gaussian array divisible by the Gaussian mesh axis); `state.n_active`
    is the GLOBAL active count (replicated).

    view_axis: name of a SECOND mesh axis for the hybrid 2-D strategy
    (built by `make_hybrid_parallel_train_step`): every view-row of the mesh
    renders a different view with the same Gaussian sharding; parameter
    gradients are additionally mean-reduced over the view axis before the
    (replicated-across-views) Adam update — the multi-chip composition of
    data_parallel x gaussian_parallel.
    """
    n_devices = int(mesh.shape[AXIS])

    def _shard_body(state: ModelState, data: DeviceDataset,
                    view_idx: jnp.ndarray, lrs: dict,
                    noise_lr: jnp.ndarray, key: jax.Array):
        if view_axis is not None:
            view_idx = view_idx[0]  # (1,) shard of the (Dv,) index vector
        my = jax.lax.axis_index(AXIS)
        cap_local = state.params['means'].shape[0]
        # local rows own global ids [my*cap_local, (my+1)*cap_local)
        global_idx = my * cap_local + jnp.arange(cap_local, dtype=jnp.int32)
        active = global_idx < state.n_active

        cam = camera_for_view(data, view_idx, statics)
        key_bg, key_noise = jax.random.split(key)
        if statics.use_random_background:
            if view_axis is not None:  # one bg per view-row, agreed within it
                key_bg = jax.random.fold_in(key_bg,
                                            jax.lax.axis_index(view_axis))
            bg = jax.random.uniform(key_bg, (3,))
        else:
            bg = data.bg_color
        settings = RasterizerSettings(
            camera=cam, bg_color=bg,
            active_sh_bases=statics.active_sh_bases,
            proper_antialiasing=statics.proper_antialiasing)

        # ---- stage A: LOCAL shard -> screen-space primitives ----
        def stage_a(p):
            eff = effective_raw_params(p, state.filter_3d,
                                       statics.use_original_3d_filter)
            return preprocess(*eff, cam, active_mask=active,
                              active_sh_bases=statics.active_sh_bases,
                              proper_antialiasing=statics.proper_antialiasing,
                              consts=statics.consts)

        prims_local, vjp_a = jax.vjp(stage_a, state.params)

        # ---- all-gather primitives over ICI (full N on every chip) ----
        prims_full = jax.tree_util.tree_map(
            lambda x: jax.lax.all_gather(x, AXIS, axis=0, tiled=True),
            prims_local)

        # ---- stage B: banded rasterization of the full set ----
        gw, gh = grid_size(cam.width, cam.height, statics.consts)
        lo, hi = _band_for(my, n_devices, gh)

        def stage_b(pr):
            # 4-channel [premultiplied rgb | transmittance], both on the
            # differentiable path (compositing happens after the psum)
            img4, aux = render_from_primitives(
                pr, settings, statics.instance_cap, statics.chunk,
                statics.consts, use_pallas=statics.use_pallas,
                tile_row_band=(lo, hi), composite_background=False)
            return img4, aux

        img4, vjp_b, aux = jax.vjp(stage_b, prims_full, has_aux=True)

        # ---- combine bands: acc sums; out-of-band trans contributes 1 ----
        acc_full = jax.lax.psum(img4[:3], AXIS)
        trans_full = jax.lax.psum(img4[3], AXIS) - (n_devices - 1.0)
        image = acc_full + trans_full[None] * bg[:, None, None]

        # ---- loss (replicated; identical on every chip) ----
        target = (data.rgb[view_idx] * data.alpha[view_idx]
                  + bg[:, None, None] * (1.0 - data.alpha[view_idx]))

        def img_loss(img):
            return image_loss(img, target, statics.loss_weights)

        (loss_val, metrics), g_image = jax.value_and_grad(
            img_loss, has_aux=True)(image)

        # cotangents of the banded 4-channel output: the psum transpose is
        # identity per chip; d image/d trans = <g_image, bg> per pixel
        g_trans_img = jnp.sum(g_image * bg[:, None, None], axis=0)
        g_img4 = jnp.concatenate([g_image, g_trans_img[None]], axis=0)
        (g_prims_full,) = vjp_b(g_img4)

        # reduce primitive cotangents over chips, slice the LOCAL rows
        g_prims_full = jax.tree_util.tree_map(
            lambda g: jax.lax.psum(g, AXIS), g_prims_full)
        g_prims_local = jax.tree_util.tree_map(
            lambda g: jax.lax.dynamic_slice_in_dim(
                g, my * cap_local, cap_local, axis=0),
            g_prims_full)
        (g_params,) = vjp_a(g_prims_local)
        if view_axis is not None:
            # mean across view-rows: the batched-optimization semantics of
            # engine/train_step.py's views_per_step, distributed over ICI
            g_params = jax.tree_util.tree_map(
                lambda g: jax.lax.pmean(g, view_axis), g_params)

        # ---- densification info (local shard rows) ----
        new_info = state.densification_info
        if statics.update_densification_info:
            ndc = 0.5 * g_prims_local.mean2d * jnp.asarray(
                [float(statics.width), float(statics.height)])[None, :]
            grad_norm = jnp.linalg.norm(ndc, axis=-1)
            visible = prims_local.visible
            upd = jnp.stack([visible.astype(jnp.float32),
                             jnp.where(visible, grad_norm, 0.0)])
            if view_axis is not None:
                # per-view statistics accumulate across view-rows
                upd = jax.lax.psum(upd, view_axis)
            new_info = new_info + upd

        # ---- local fused Adam + post-step ----
        new_params, new_adam = adam_step(state.params, g_params, state.adam,
                                         lrs, AdamConfig(), mask=active)
        if statics.inject_noise:
            eff = effective_raw_params(new_params, state.filter_3d,
                                       statics.use_original_3d_filter)
            noise = jax.random.normal(jax.random.fold_in(key_noise, my),
                                      (cap_local, 3))
            new_params = dict(new_params, means=add_noise(
                new_params['means'], eff[1], eff[2], eff[3], noise,
                noise_lr, active_mask=active))
        if statics.use_optimized_3d_filter:
            new_params = dict(new_params, scales=jnp.maximum(
                new_params['scales'], state.filter_3d[:, None]))

        metrics = dict(metrics)
        metrics['loss'] = loss_val
        if view_axis is not None:
            metrics = {k: jax.lax.pmean(v.astype(jnp.float32), view_axis)
                       for k, v in metrics.items()}
        metrics['n_visible'] = jax.lax.psum(
            jnp.sum(prims_local.visible.astype(jnp.int32)), AXIS)
        # expansion totals are band-independent (masking happens post-count)
        metrics['n_rect_instances'] = aux.n_rect_instances
        metrics['n_instances'] = aux.n_instances
        new_state = ModelState(
            params=new_params, adam=new_adam, densification_info=new_info,
            filter_3d=state.filter_3d, n_active=state.n_active)
        return new_state, metrics

    sharded = P(AXIS)
    repl = P()

    def _spec_like(state: ModelState):
        """Shard every per-Gaussian array along its leading axis; scalars
        (the Adam step counter, n_active) and the (2, CAP) densification
        info's CAP axis follow suit."""
        def leaf_spec(x):
            return repl if x.ndim == 0 else sharded
        return ModelState(
            params=jax.tree_util.tree_map(leaf_spec, state.params),
            adam=jax.tree_util.tree_map(leaf_spec, state.adam),
            densification_info=P(None, AXIS),
            filter_3d=sharded,
            n_active=repl)

    def make(state_example: ModelState):
        spec = _spec_like(state_example)
        idx_spec = repl if view_axis is None else P(view_axis)
        body = shard_map(
            _shard_body, mesh=mesh,
            in_specs=(spec, repl, idx_spec, repl, repl, repl),
            out_specs=(spec, repl),
            check_vma=False)

        @functools.partial(jax.jit, donate_argnames=('state',))
        def step(state, data, view_idx, lrs, noise_lr, key):
            return body(state, data, view_idx, lrs, noise_lr, key)

        return step

    return make


def make_mesh(n_devices: int | None = None) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(devices, (AXIS,))


# --------------------------------------------------------------------- #
# hybrid 2-D strategy: views x gaussians
# --------------------------------------------------------------------- #

VIEW_AXIS = 'views'


def make_hybrid_mesh(n_view_rows: int, n_gaussian_cols: int) -> Mesh:
    import numpy as _np
    devices = _np.asarray(
        jax.devices()[:n_view_rows * n_gaussian_cols]).reshape(
        n_view_rows, n_gaussian_cols)
    return Mesh(devices, (VIEW_AXIS, AXIS))


def make_hybrid_parallel_train_step(mesh: Mesh, statics: TrainStepStatics):
    """2-D composition: each view-row of the mesh renders one view with the
    Gaussian state sharded along the row; gradients mean-reduce across
    view-rows (batched optimization, engine/train_step.py views_per_step
    semantics) while per-Gaussian memory stays sharded. Call signature:
    step(state, data, view_indices (Dv,), lrs, noise_lr, key).
    """
    return make_gaussian_parallel_train_step(mesh, statics,
                                             view_axis=VIEW_AXIS)
