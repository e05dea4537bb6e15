"""Speedy-Splat informed pruning scores.

TPU-native equivalent of the reference pruning-score pipeline
(reference: rasterization/src/pruning_scores.cu, kernels_pruning_scores.cuh:
349-473): per view, a forward blend pass establishes the final color and
transmittance, then a second front-to-back pass computes each splat's
dL/dalpha under grad_color == (1,1,1) and accumulates
score += (opacity * dL/dalpha)^2 per primitive.

Differences by design: the two passes share the chunked sweep structure of
ops/blend.py; the atomicAdd score accumulation becomes a scatter-add over
instance slots followed by the gather-transpose reduction to Gaussians.
Note the pruning kernels use the UNCLAMPED color (kernels_pruning_scores.cuh
:386,447), unlike the training blend.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from fastergs_tpu.constants import RasterizerConstants, DEFAULT_CONSTANTS
from fastergs_tpu.ops.blend import BlendStatics, _pixel_centers, _chunk_alpha
from fastergs_tpu.ops.projection import preprocess, grid_size
from fastergs_tpu.ops.rasterize import RasterizerSettings
from fastergs_tpu.ops.tiles import build_tile_instances


def _forward_unclamped(mean2d, conic, opacity, color, tile_start, tile_end,
                       statics: BlendStatics):
    """Forward blend with raw colors; returns (acc (T,P,3), trans (T,P))."""
    n_tiles = statics.grid_width * statics.grid_height
    n_pix = statics.tile_width * statics.tile_height
    chunk = statics.chunk
    cap = mean2d.shape[0]
    px, py = _pixel_centers(statics)
    max_len = jnp.max(tile_end - tile_start)
    arange_chunk = jnp.arange(chunk, dtype=jnp.int32)

    def cond(state):
        return state[0] * chunk < max_len

    def body(state):
        k, trans, acc = state
        idx = tile_start[:, None] + k * chunk + arange_chunk[None, :]
        valid = idx < tile_end[:, None]
        idxs = jnp.minimum(idx, cap - 1)
        alpha_eff, _, _, _ = _chunk_alpha(
            mean2d[idxs], conic[idxs], opacity[idxs], valid, px, py, statics)
        one_minus = 1.0 - alpha_eff
        cp = jnp.cumprod(one_minus, axis=1)
        excl = jnp.concatenate([jnp.ones_like(cp[:, :1]), cp[:, :-1]], axis=1)
        t_before = trans[:, None, :] * excl
        used = t_before >= statics.transmittance_threshold
        w = jnp.where(used, t_before * alpha_eff, 0.0)
        acc = acc + jnp.einsum('tcp,tcd->tpd', w, color[idxs],
                               preferred_element_type=jnp.float32)
        trans = trans * jnp.prod(jnp.where(used, one_minus, 1.0), axis=1)
        return k + 1, trans, acc

    init = (jnp.int32(0), jnp.ones((n_tiles, n_pix), jnp.float32),
            jnp.zeros((n_tiles, n_pix, 3), jnp.float32))
    _, trans, acc = jax.lax.while_loop(cond, body, init)
    return acc, trans


def _score_sweep(mean2d, conic, opacity, color, tile_start, tile_end,
                 acc_final, trans_final, bg_color, width, height,
                 statics: BlendStatics):
    """Second pass: per-instance (opacity * dL/dalpha)^2 summed over pixels."""
    chunk = statics.chunk
    cap = mean2d.shape[0]
    px, py = _pixel_centers(statics)
    # the reference only scores real pixels (inside test,
    # kernels_pruning_scores.cuh:366) — mask out tile padding
    inside = (px < width) & (py < height)                  # (T, P)
    max_len = jnp.max(tile_end - tile_start)
    arange_chunk = jnp.arange(chunk, dtype=jnp.int32)

    # grad_color == (1,1,1); common = T_final * -sum(bg) (pruning_scores:417-418)
    r0 = jnp.sum(acc_final, axis=-1)                       # color_after · 1
    common = -trans_final * jnp.sum(bg_color)

    def cond(state):
        return state[0] * chunk < max_len

    def body(state):
        k, trans, r_carry, scores_inst = state
        idx = tile_start[:, None] + k * chunk + arange_chunk[None, :]
        valid = idx < tile_end[:, None]
        idxs = jnp.minimum(idx, cap - 1)
        op = opacity[idxs]
        cl = color[idxs]
        alpha_eff, _, _, _ = _chunk_alpha(
            mean2d[idxs], conic[idxs], op, valid, px, py, statics)
        one_minus = 1.0 - alpha_eff
        cp = jnp.cumprod(one_minus, axis=1)
        excl = jnp.concatenate([jnp.ones_like(cp[:, :1]), cp[:, :-1]], axis=1)
        t_before = trans[:, None, :] * excl
        used = t_before >= statics.transmittance_threshold
        w = jnp.where(used, t_before * alpha_eff, 0.0)

        csum = jnp.sum(cl, axis=-1)                        # (T, C) color · 1
        u = w * csum[..., None]
        r_after = r_carry[:, None, :] - jnp.cumsum(u, axis=1)
        guard = 1.0 / jnp.maximum(one_minus, statics.one_minus_alpha_eps)
        d_alpha = (t_before * csum[..., None] - r_after * guard
                   + common[:, None, :] * guard)
        d_alpha = jnp.where(used & (alpha_eff > 0.0) & inside[:, None, :],
                            d_alpha, 0.0)
        d_gauss = op[..., None] * d_alpha
        score = jnp.sum(d_gauss * d_gauss, axis=2)          # (T, C)

        flat = idxs.reshape(-1)
        scores_inst = scores_inst.at[flat].add(
            jnp.where(valid.reshape(-1), score.reshape(-1), 0.0))
        trans = trans * jnp.prod(jnp.where(used, one_minus, 1.0), axis=1)
        r_carry = r_carry - jnp.sum(u, axis=1)
        return k + 1, trans, r_carry, scores_inst

    init = (jnp.int32(0), jnp.ones_like(trans_final), r0,
            jnp.zeros((cap,), jnp.float32))
    _, _, _, scores_inst = jax.lax.while_loop(cond, body, init)
    return scores_inst


def update_pruning_scores(
    scores: jnp.ndarray,  # (N,) accumulated across views
    means, raw_scales, raw_rotations, raw_opacities, sh_0, sh_rest,
    settings: RasterizerSettings,
    active_mask: jnp.ndarray | None = None,
    instance_cap: int = 1 << 20,
    chunk: int = 64,
    consts: RasterizerConstants = DEFAULT_CONSTANTS,
    use_pallas: bool | None = None,
) -> jnp.ndarray:
    """Adds one view's contribution to per-Gaussian pruning scores
    (reference API: update_pruning_scores, torch_bindings/rasterization.py:
    157-176; consumed by Renderer.compute_pruning_scores, Renderer.py:114-129).
    """
    cam = settings.camera
    prims = preprocess(
        means, raw_scales, raw_rotations, raw_opacities, sh_0, sh_rest, cam,
        active_mask=active_mask, active_sh_bases=settings.active_sh_bases,
        proper_antialiasing=settings.proper_antialiasing, consts=consts)
    gw, gh = grid_size(cam.width, cam.height, consts)
    statics = BlendStatics.create(gw, gh, chunk, consts,
                                  image_width=cam.width,
                                  image_height=cam.height)

    if use_pallas is None:
        use_pallas = jax.default_backend() == 'tpu'
    if use_pallas:
        # streaming-kernel path (~35x the XLA sweep's speed on v5e)
        from fastergs_tpu.ops import blend_stream
        from fastergs_tpu.ops.blend import pack_blend_inputs
        from fastergs_tpu.ops.tiles import build_tile_instances_stream
        instance_cap = (-(-instance_cap // blend_stream.STEP)
                        * blend_stream.STEP)
        pack9 = pack_blend_inputs(prims.mean2d, prims.conic, prims.opacity,
                                  prims.color)
        # fields ride the fill + sort (no post-sort gather) — same stream
        # construction as the render path
        inst_c, rows10 = build_tile_instances_stream(
            prims, pack9, gw, gh, instance_cap, consts)
        c = blend_stream.CHUNK
        ft = jnp.minimum(inst_c.tile_idx[::c], gw * gh - 1)
        lt = jnp.minimum(inst_c.tile_idx[c - 1::c], gw * gh - 1)
        scores_inst = blend_stream.blend_stream_pruning_scores(
            rows10, ft, lt, statics, jnp.sum(settings.bg_color),
            cam.width, cam.height)
        return scores.at[inst_c.gaussian_idx].add(scores_inst, mode='drop')

    inst = build_tile_instances(prims, gw, gh, instance_cap, consts)
    gi = inst.gaussian_idx
    m2, co = prims.mean2d[gi], prims.conic[gi]
    op, cl = prims.opacity[gi], prims.color[gi]
    acc, trans = _forward_unclamped(m2, co, op, cl,
                                    inst.tile_start, inst.tile_end, statics)
    scores_inst = _score_sweep(m2, co, op, cl, inst.tile_start, inst.tile_end,
                               acc, trans, settings.bg_color,
                               cam.width, cam.height, statics)
    return scores.at[gi].add(scores_inst)
