"""The jitted training step — the entire hot loop on device.

Equivalent of one reference training iteration
(reference: Trainer.py:167-196 → diff_rasterize → loss → backward →
FusedAdam.step → post_optimizer_step) but fused into ONE jit-compiled,
buffer-donated function: render forward, loss, manual two-stage VJP (so the
per-Gaussian mean2d cotangent can feed densification info, the analog of
kernels_backward.cuh:194-201), fused Adam update, MCMC noise injection, and
the optimized-3D-filter scale clamp. The Python boundary passes only a view
index and scalars; training images live on device in a stacked array (the
equivalent of the host's PRELOADING_LEVEL=2, fastergs_garden.yaml:22).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from fastergs_tpu.constants import RasterizerConstants, DEFAULT_CONSTANTS
from fastergs_tpu.engine.loss import LossWeights, image_loss
from fastergs_tpu.models.gaussians import effective_raw_params
from fastergs_tpu.models.maintenance import ModelState
from fastergs_tpu.ops.adam import AdamConfig, adam_step
from fastergs_tpu.ops.math import sigmoid
from fastergs_tpu.ops.mcmc import add_noise
from fastergs_tpu.ops.projection import CameraParams, preprocess
from fastergs_tpu.ops.rasterize import RasterizerSettings, render_from_primitives


class TrainStepStatics(NamedTuple):
    """Hashable per-compile configuration of the train step."""
    width: int
    height: int
    active_sh_bases: int
    proper_antialiasing: bool
    use_original_3d_filter: bool
    use_optimized_3d_filter: bool
    update_densification_info: bool
    inject_noise: bool
    use_random_background: bool
    instance_cap: int
    chunk: int
    loss_weights: LossWeights
    consts: RasterizerConstants = DEFAULT_CONSTANTS
    temporal: bool = False      # 4D model family (models/gaussians4d.py)
    use_pallas: bool | None = None  # None = auto (Pallas on real TPUs)
    views_per_step: int = 1     # >1: batched steps (mean grads, one Adam)


class DeviceDataset(NamedTuple):
    """Stacked per-view tensors living on device."""
    rgb: jnp.ndarray        # (V, 3, H, W)
    alpha: jnp.ndarray      # (V, 1, H, W) — ones if dataset has no alpha
    w2c: jnp.ndarray        # (V, 3, 4)
    cam_position: jnp.ndarray  # (V, 3)
    intrinsics: jnp.ndarray    # (V, 6) fx, fy, cx, cy, near, far
    bg_color: jnp.ndarray      # (3,) dataset background color
    timestamps: jnp.ndarray = None  # (V,) normalized times (4D family)


def camera_for_view(data: DeviceDataset, view_idx, statics) -> CameraParams:
    intr = data.intrinsics[view_idx]
    return CameraParams(
        w2c=data.w2c[view_idx], cam_position=data.cam_position[view_idx],
        focal_x=intr[0], focal_y=intr[1], center_x=intr[2], center_y=intr[3],
        near_plane=intr[4], far_plane=intr[5],
        width=statics.width, height=statics.height)


def compute_view_grads(
    params: dict,
    filter_3d: jnp.ndarray,
    n_active: jnp.ndarray,
    cam: CameraParams,
    rgb_gt: jnp.ndarray,
    alpha_gt: jnp.ndarray,
    bg: jnp.ndarray,
    statics: TrainStepStatics,
    timestamp: jnp.ndarray | None = None,
):
    """Render + loss + manual two-stage VJP for ONE view.

    Returns (g_params, loss value, visible mask, mean2d cotangent, metrics).
    Shared by the single-chip train step and the view-parallel shard_map
    step in fastergs_tpu.parallel (grads are psum-averaged there).
    """
    cap = params['means'].shape[0]
    active = jnp.arange(cap, dtype=jnp.int32) < n_active
    settings = RasterizerSettings(
        camera=cam, bg_color=bg,
        active_sh_bases=statics.active_sh_bases,
        proper_antialiasing=statics.proper_antialiasing)

    # ---- stage A: params → screen-space primitives (differentiable) ----
    def stage_a(p):
        opacity_factor = None
        if statics.temporal:
            from fastergs_tpu.models.gaussians4d import temporal_adapt
            means_t, rot_t, opacity_factor = temporal_adapt(p, timestamp)
            p = dict(p, means=means_t, rotations=rot_t)
        eff = effective_raw_params(p, filter_3d,
                                   statics.use_original_3d_filter)
        return preprocess(*eff, cam, active_mask=active,
                          active_sh_bases=statics.active_sh_bases,
                          proper_antialiasing=statics.proper_antialiasing,
                          consts=statics.consts,
                          opacity_factor=opacity_factor)

    prims, vjp_a = jax.vjp(stage_a, params)

    # ---- stage B: primitives → image (custom_vjp inside) ----
    def stage_b(pr):
        image, aux = render_from_primitives(
            pr, settings, statics.instance_cap, statics.chunk, statics.consts,
            use_pallas=statics.use_pallas)
        return image, aux

    image, vjp_b, aux = jax.vjp(stage_b, prims, has_aux=True)

    # ---- loss on the image ----
    target = rgb_gt * alpha_gt + bg[:, None, None] * (1.0 - alpha_gt)

    def img_loss(img):
        return image_loss(img, target, statics.loss_weights)

    (loss_img_val, metrics), g_image = jax.value_and_grad(
        img_loss, has_aux=True)(image)

    # ---- backward through the two stages ----
    (g_prims,) = vjp_b(g_image)
    (g_params,) = vjp_a(g_prims)

    # ---- regularizers (act directly on params; reference Loss.py:17-18) ----
    lw = statics.loss_weights
    reg_val = jnp.float32(0.0)
    if lw.lambda_opacity_reg > 0.0 or lw.lambda_scale_reg > 0.0:
        def reg_fn(p):
            eff = effective_raw_params(p, filter_3d,
                                       statics.use_original_3d_filter)
            denom = jnp.maximum(n_active.astype(jnp.float32), 1.0)
            op_act = sigmoid(eff[3])
            sc_act = jnp.exp(eff[1])
            op_mean = jnp.sum(jnp.where(active[:, None], op_act, 0.0)) / denom
            sc_mean = jnp.sum(jnp.where(active[:, None], sc_act, 0.0)) / (denom * 3.0)
            return lw.lambda_opacity_reg * op_mean + lw.lambda_scale_reg * sc_mean

        reg_val, g_reg = jax.value_and_grad(reg_fn)(params)
        g_params = {k: g_params[k] + g_reg[k] for k in g_params}

    metrics = dict(metrics)
    metrics['loss'] = loss_img_val + reg_val
    metrics['n_instances'] = aux.n_instances
    metrics['n_rect_instances'] = aux.n_rect_instances
    metrics['n_visible'] = aux.n_visible
    return g_params, prims.visible, g_prims.mean2d, metrics


def train_step_impl(
    state: ModelState,
    data: DeviceDataset,
    view_idx: jnp.ndarray,     # () int32
    lrs: dict,                 # per-group learning rates (traced scalars)
    noise_lr: jnp.ndarray,     # () — 5e5 * lr_means (reference Model.py:471)
    key: jax.Array,
    statics: TrainStepStatics,
):
    """One training iteration. Returns (new_state, metrics dict).

    With statics.views_per_step > 1, view_idx is (V,) and the step renders
    V views, averages their gradients, and applies ONE Adam update —
    batched optimization (an opt-in throughput mode beyond the reference's
    strictly per-view schedule); densification info still accumulates per
    rendered view, exactly V times per step.
    """
    cap = state.params['means'].shape[0]
    active = jnp.arange(cap, dtype=jnp.int32) < state.n_active
    filter_3d = state.filter_3d

    key_bg, key_noise = jax.random.split(key)

    V = statics.views_per_step
    view_ids = jnp.reshape(view_idx, (V,)) if V > 1 else [view_idx]
    bg_keys = jax.random.split(key_bg, V)

    new_info = state.densification_info
    g_params = None
    metrics = None
    for v in range(V):
        vid = view_ids[v]
        cam = camera_for_view(data, vid, statics)
        if statics.use_random_background:
            bg = jax.random.uniform(bg_keys[v], (3,))  # Trainer.py:179
        else:
            bg = data.bg_color
        timestamp = (data.timestamps[vid]
                     if statics.temporal and data.timestamps is not None
                     else None)
        g_v, visible, g_mean2d, m_v = compute_view_grads(
            state.params, filter_3d, state.n_active, cam,
            data.rgb[vid], data.alpha[vid], bg, statics, timestamp)
        g_params = g_v if g_params is None else {
            k: g_params[k] + g_v[k] for k in g_params}
        # float metrics accumulate (mean below); counters report the MAX
        # across the batch (n_rect_instances drives overflow detection)
        metrics = m_v if metrics is None else {
            k: (metrics[k] + m_v[k]
                if jnp.issubdtype(m_v[k].dtype, jnp.floating)
                else jnp.maximum(metrics[k], m_v[k])) for k in metrics}

        if statics.update_densification_info:
            # reference: kernels_backward.cuh:194-201 — visibility count and
            # NDC-scaled mean2d gradient norm accumulate per visible primitive
            ndc = 0.5 * g_mean2d * jnp.asarray(
                [float(statics.width), float(statics.height)])[None, :]
            grad_norm = jnp.linalg.norm(ndc, axis=-1)
            new_info = new_info.at[0].add(visible.astype(jnp.float32))
            new_info = new_info.at[1].add(jnp.where(visible, grad_norm, 0.0))

    if V > 1:
        g_params = {k: g_params[k] / float(V) for k in g_params}
        metrics = {k: (metrics[k] / float(V)
                       if jnp.issubdtype(metrics[k].dtype, jnp.floating)
                       else metrics[k]) for k in metrics}

    # ---- fused Adam update (adam/src/adam.cu semantics) ----
    new_params, new_adam = adam_step(state.params, g_params, state.adam, lrs,
                                     AdamConfig(), mask=active)

    # ---- post-optimizer step (reference: Model.py:467-473) ----
    if statics.inject_noise:
        eff = effective_raw_params(new_params, filter_3d,
                                   statics.use_original_3d_filter)
        noise = jax.random.normal(key_noise, (cap, 3))
        new_params = dict(new_params, means=add_noise(
            new_params['means'], eff[1], eff[2], eff[3], noise,
            noise_lr, active_mask=active))
    if statics.use_optimized_3d_filter:
        # clamp log-scales to the (log-space) 3D filter (Model.py:472-473)
        new_params = dict(new_params, scales=jnp.maximum(
            new_params['scales'], filter_3d[:, None]))

    new_state = ModelState(
        params=new_params, adam=new_adam,
        densification_info=new_info, filter_3d=state.filter_3d,
        n_active=state.n_active)

    return new_state, metrics


train_step = functools.partial(jax.jit, static_argnames=('statics',),
                               donate_argnames=('state',))(train_step_impl)


@functools.partial(jax.jit, static_argnames=('statics',),
                   donate_argnames=('state',))
def train_steps_fused(
    state: ModelState,
    data: DeviceDataset,
    view_indices: jnp.ndarray,   # (n_steps,) i32
    lrs: dict,                   # scalar lrs for the non-means groups
    means_lrs: jnp.ndarray,      # (n_steps,) per-iteration scheduled means lr
    key: jax.Array,
    statics: TrainStepStatics,
):
    """Runs n_steps hot-loop iterations inside ONE dispatch via lax.scan.

    Used by benchmarking and by the trainer between maintenance callbacks —
    amortizes host-dispatch latency that would otherwise dominate on a
    tunneled TPU. The means learning rate follows its exact per-iteration
    schedule via a scanned array; the MCMC noise lr is derived from it
    (5e5 * lr_means, reference Model.py:471).

    Returns (state, metrics) where every metrics leaf is stacked
    (n_steps,) — one entry per iteration, so loss/PSNR-vs-iteration
    curves reconstruct at the reference's per-iteration granularity
    (Loss.py:19) even in fused mode.
    """
    def body(st, per_step):
        idx, lr_means, k = per_step
        step_lrs = dict(lrs, means=lr_means)
        return train_step_impl(st, data, idx, step_lrs, 5e5 * lr_means, k,
                               statics)

    if statics.views_per_step > 1:
        # (n_steps * V,) flat sampling -> (n_steps, V) batched steps
        view_indices = view_indices.reshape(-1, statics.views_per_step)
    keys = jax.random.split(key, view_indices.shape[0])
    return jax.lax.scan(body, state, (view_indices, means_lrs, keys))
