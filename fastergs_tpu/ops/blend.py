"""Tile-parallel alpha blending: forward + analytic backward (custom_vjp).

TPU-native redesign of the reference's blend kernels
(forward: kernels_forward.cuh:363-475, backward: kernels_backward.cuh:260-471).

Design notes (why this is NOT a translation):

- GPU reference: one 256-thread block per tile, sequential front-to-back loop
  per pixel with a sticky `done` flag for early termination, per-32-Gaussian
  (color, transmittance) bucket snapshots so the backward warp can resume
  mid-tile, and atomicAdd gradient accumulation.
- TPU version: all tiles advance in lockstep through chunks of instances.
  Within a chunk the per-pixel sequential product becomes an exclusive
  `cumprod` over the chunk axis (associative scan); a scalar transmittance
  carry links chunks. The bucket-snapshot machinery disappears entirely: the
  backward is a second front-to-back sweep that recomputes transmittance from
  the carried final color/transmittance, and gradient accumulation is a
  scatter-add over unique instance slots (deterministic — strictly better
  than the reference's atomics).
- All per-instance fields travel in ONE packed (I, 9) array
  [mean2d(2) | conic(3) | opacity(1) | color(3)]: XLA row gathers are
  latency-bound on TPU, so one 36-byte-row gather beats four narrow ones.

Early-termination equivalence (exact, not approximate): the reference sets
`done` once transmittance drops below 1e-4 *after* blending a Gaussian and
skips everything after (kernels_forward.cuh:452-455). Because transmittance
is non-increasing, "Gaussian k is used" is exactly equivalent to
"unstopped transmittance before k is >= threshold", which vectorizes as a
mask — no data-dependent control flow needed. The transmittance *carry*
freezes once the threshold is crossed (`factor = 1` for unused Gaussians), so
the stored final transmittance matches the reference semantics exactly.

The custom_vjp boundary sits at the per-instance packed array: the cotangent
returned here is per-instance, and JAX's transpose of the gather
(instance <- Gaussian) performs the per-Gaussian reduction — the moral
equivalent of the reference's atomicAdd accumulation
(kernels_backward.cuh:459-470), but deterministic.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from fastergs_tpu.constants import RasterizerConstants, DEFAULT_CONSTANTS

PACKED_WIDTH = 9  # mean2d(2) conic(3) opacity(1) color(3)


class BlendStatics(NamedTuple):
    """Hashable static configuration for the blend kernels."""
    grid_width: int
    grid_height: int
    chunk: int
    original_opacity_interpretation: bool
    min_alpha_threshold: float
    transmittance_threshold: float
    one_minus_alpha_eps: float
    tile_width: int
    tile_height: int
    # training blends clamp colors at >= 0 (kernels_forward.cuh:415); the
    # pruning-score pipeline blends RAW colors (kernels_pruning_scores.cuh:
    # 386,447)
    clamp_colors: bool = True
    # image extent in pixels (0 = unknown). When set, the streaming kernels'
    # per-tile done flag ignores pixels OUTSIDE the image: they can never
    # receive alpha, so they would otherwise pin T at 1 and keep edge tiles
    # from ever early-terminating (the reference terminates per-pixel and is
    # unaffected, kernels_forward.cuh:452-455; out-of-image outputs here are
    # discarded by tiles_to_image and carry zero cotangents).
    image_width: int = 0
    image_height: int = 0

    @classmethod
    def create(cls, grid_width: int, grid_height: int, chunk: int = 32,
               consts: RasterizerConstants = DEFAULT_CONSTANTS,
               image_width: int = 0,
               image_height: int = 0) -> 'BlendStatics':
        return cls(
            grid_width=grid_width,
            grid_height=grid_height,
            chunk=chunk,
            original_opacity_interpretation=consts.original_opacity_interpretation,
            min_alpha_threshold=consts.min_alpha_threshold,
            transmittance_threshold=consts.transmittance_threshold,
            one_minus_alpha_eps=consts.one_minus_alpha_eps,
            tile_width=consts.tile_width,
            tile_height=consts.tile_height,
            image_width=image_width,
            image_height=image_height,
        )


def pack_blend_inputs(mean2d, conic, opacity, color) -> jnp.ndarray:
    """Packs per-Gaussian blend fields into the (N, 9) layout."""
    return jnp.concatenate(
        [mean2d, conic, opacity[:, None], color], axis=1)


def _pixel_centers(statics: BlendStatics):
    """Per-tile pixel center coordinates, (T, P) each for x and y."""
    gw, gh = statics.grid_width, statics.grid_height
    tw, th = statics.tile_width, statics.tile_height
    t = jnp.arange(gw * gh, dtype=jnp.int32)
    tx = (t % gw).astype(jnp.float32)
    ty = (t // gw).astype(jnp.float32)
    p = jnp.arange(tw * th, dtype=jnp.int32)
    pc = (p % tw).astype(jnp.float32)
    pr = (p // tw).astype(jnp.float32)
    px = tx[:, None] * tw + pc[None, :] + 0.5
    py = ty[:, None] * th + pr[None, :] + 0.5
    return px, py


def _chunk_alpha(m, co, op, valid, px, py, statics: BlendStatics):
    """Per-(tile, chunk-instance, pixel) alpha evaluation with threshold masks.

    Mirrors kernels_forward.cuh:431-440. Returns (alpha_eff, delta_x, delta_y,
    gauss) where alpha_eff is zero for skipped fragments.
    """
    dx = m[..., 0:1] - px[:, None, :]                       # (T, C, P)
    dy = m[..., 1:2] - py[:, None, :]
    power = (-0.5 * (co[..., 0:1] * dx * dx + co[..., 2:3] * dy * dy)
             - co[..., 1:2] * dx * dy)
    gauss = jnp.exp(jnp.minimum(power, 0.0))
    alpha = op[..., None] * gauss
    if statics.original_opacity_interpretation:
        ok = alpha >= statics.min_alpha_threshold
    else:
        ok = gauss >= statics.min_alpha_threshold
    ok &= valid[..., None]
    alpha_eff = jnp.where(ok, alpha, 0.0)
    return alpha_eff, dx, dy, gauss


def _blend_forward(packed, tile_start, tile_end, statics: BlendStatics):
    """Returns (color_acc (T, P, 3), transmittance (T, P))."""
    n_tiles = statics.grid_width * statics.grid_height
    n_pix = statics.tile_width * statics.tile_height
    chunk = statics.chunk
    cap = packed.shape[0]
    px, py = _pixel_centers(statics)

    max_len = jnp.max(tile_end - tile_start)
    arange_chunk = jnp.arange(chunk, dtype=jnp.int32)

    def cond(state):
        k, _, _ = state
        return k * chunk < max_len

    def body(state):
        k, trans, acc = state
        idx = tile_start[:, None] + k * chunk + arange_chunk[None, :]  # (T, C)
        valid = idx < tile_end[:, None]
        rows = packed[jnp.minimum(idx, cap - 1)]             # (T, C, 9)
        m, co, op = rows[..., 0:2], rows[..., 2:5], rows[..., 5]
        cl = jnp.maximum(rows[..., 6:9], 0.0)  # kernels_forward.cuh:415

        alpha_eff, _, _, _ = _chunk_alpha(m, co, op, valid, px, py, statics)
        one_minus = 1.0 - alpha_eff
        cp = jnp.cumprod(one_minus, axis=1)
        excl = jnp.concatenate([jnp.ones_like(cp[:, :1]), cp[:, :-1]], axis=1)
        t_before = trans[:, None, :] * excl                  # (T, C, P)
        used = t_before >= statics.transmittance_threshold
        w = jnp.where(used, t_before * alpha_eff, 0.0)
        acc = acc + jnp.einsum('tcp,tcd->tpd', w, cl,
                               preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
        factor = jnp.where(used, one_minus, 1.0)
        trans = trans * jnp.prod(factor, axis=1)
        return k + 1, trans, acc

    init = (jnp.int32(0),
            jnp.ones((n_tiles, n_pix), jnp.float32),
            jnp.zeros((n_tiles, n_pix, 3), jnp.float32))
    _, trans, acc = jax.lax.while_loop(cond, body, init)
    return acc, trans


def _blend_backward(packed, tile_start, tile_end,
                    acc_final, trans_final, g_acc, g_trans,
                    statics: BlendStatics):
    """Analytic backward: second front-to-back sweep.

    Math mirrors blend_backward_cu (kernels_backward.cuh:260-471) with two
    intentional differences:
    - conic cotangents are the TRUE derivatives (the reference halves the
      off-diagonal term and compensates in its preprocess backward,
      kernels_backward.cuh:443-447 vs 130-134; here the downstream chain is
      JAX autodiff which expects true derivatives);
    - the background-color term arrives via the transmittance cotangent
      `g_trans` (the reference folds -<grad, bg> * T_final into
      `grad_alpha_common`, kernels_backward.cuh:374-377 — with
      g_trans = <g_image, bg> the expressions coincide).
    """
    chunk = statics.chunk
    cap = packed.shape[0]
    px, py = _pixel_centers(statics)

    max_len = jnp.max(tile_end - tile_start)
    arange_chunk = jnp.arange(chunk, dtype=jnp.int32)

    # residual color·grad dot product carry, initialized to the full
    # (pre-background) accumulated color — the "color_pixel_after" chain
    # (kernels_backward.cuh:370-372, 429).
    r0 = jnp.einsum('tpd,tpd->tp', acc_final, g_acc,
                precision=jax.lax.Precision.HIGHEST)
    # d transmittance term: for used Gaussian k, dT_final/dalpha_k =
    # -T_final / (1 - alpha_k)
    common = -trans_final * g_trans                           # (T, P)

    def cond(state):
        return state[0] * chunk < max_len

    def body(state):
        k, trans, r_carry, g_packed = state
        idx = tile_start[:, None] + k * chunk + arange_chunk[None, :]
        valid = idx < tile_end[:, None]
        idxs = jnp.minimum(idx, cap - 1)
        rows = packed[idxs]
        m, co, op = rows[..., 0:2], rows[..., 2:5], rows[..., 5]
        craw = rows[..., 6:9]
        cl = jnp.maximum(craw, 0.0)

        alpha_eff, dx, dy, gauss = _chunk_alpha(m, co, op, valid, px, py,
                                                statics)
        one_minus = 1.0 - alpha_eff
        cp = jnp.cumprod(one_minus, axis=1)
        excl = jnp.concatenate([jnp.ones_like(cp[:, :1]), cp[:, :-1]], axis=1)
        t_before = trans[:, None, :] * excl
        used = t_before >= statics.transmittance_threshold
        w = jnp.where(used, t_before * alpha_eff, 0.0)        # (T, C, P)

        # color gradient (with straight-through clamp factor,
        # kernels_backward.cuh:314-318, 426)
        g_color_inst = jnp.einsum('tcp,tpd->tcd', w, g_acc,
                                  preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
        g_color_inst = g_color_inst * (craw >= 0.0)

        # alpha gradient
        cg = jnp.einsum('tcd,tpd->tcp', cl, g_acc,
                        preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)   # c_k · g_p
        u = w * cg
        r_after = r_carry[:, None, :] - jnp.cumsum(u, axis=1)  # inclusive
        guard = 1.0 / jnp.maximum(one_minus, statics.one_minus_alpha_eps)
        d_alpha = t_before * cg - r_after * guard + common[:, None, :] * guard
        d_alpha = jnp.where(used & (alpha_eff > 0.0), d_alpha, 0.0)

        # opacity gradient (w.r.t. FINAL opacity; activation chain is autodiff)
        g_op_inst = jnp.sum(gauss * d_alpha, axis=2)

        # conic / mean2d gradients (true derivatives of the exponent)
        helper = -alpha_eff * d_alpha                         # (T, C, P)
        gc_a = 0.5 * jnp.sum(helper * dx * dx, axis=2)
        gc_b = jnp.sum(helper * dx * dy, axis=2)
        gc_c = 0.5 * jnp.sum(helper * dy * dy, axis=2)
        gm_x = jnp.sum(helper * (co[..., 0:1] * dx + co[..., 1:2] * dy), axis=2)
        gm_y = jnp.sum(helper * (co[..., 1:2] * dx + co[..., 2:3] * dy), axis=2)

        g_rows = jnp.concatenate([
            gm_x[..., None], gm_y[..., None],
            gc_a[..., None], gc_b[..., None], gc_c[..., None],
            g_op_inst[..., None], g_color_inst], axis=-1)     # (T, C, 9)

        # scatter into per-instance buffer (slots are unique → deterministic)
        flat = idxs.reshape(-1)
        g_rows = jnp.where(valid.reshape(-1)[:, None],
                           g_rows.reshape(-1, PACKED_WIDTH), 0.0)
        g_packed = g_packed.at[flat].add(g_rows)

        factor = jnp.where(used, one_minus, 1.0)
        trans = trans * jnp.prod(factor, axis=1)
        r_carry = r_carry - jnp.sum(u, axis=1)
        return k + 1, trans, r_carry, g_packed

    init = (jnp.int32(0),
            jnp.ones_like(trans_final),
            r0,
            jnp.zeros((cap, PACKED_WIDTH), jnp.float32))
    _, _, _, g_packed = jax.lax.while_loop(cond, body, init)
    return g_packed


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def blend_tiles(packed, tile_start, tile_end, statics: BlendStatics):
    """Front-to-back alpha blend over sorted per-instance data.

    Args:
        packed: (I, 9) per-instance [mean2d | conic | opacity | raw color].
        tile_start/tile_end: (T,) instance ranges per tile.
        statics: hashable blend configuration.

    Returns:
        (color_acc (T, P, 3), transmittance (T, P)) — background compositing
        and crop/reshape happen outside (and stay differentiable).
    """
    return _blend_forward(packed, tile_start, tile_end, statics)


def _blend_tiles_fwd(packed, tile_start, tile_end, statics):
    acc, trans = _blend_forward(packed, tile_start, tile_end, statics)
    return (acc, trans), (packed, tile_start, tile_end, acc, trans)


def _blend_tiles_bwd(statics, residuals, cotangents):
    packed, tile_start, tile_end, acc, trans = residuals
    g_acc, g_trans = cotangents
    g_packed = _blend_backward(packed, tile_start, tile_end,
                               acc, trans, g_acc, g_trans, statics)
    return g_packed, None, None


blend_tiles.defvjp(_blend_tiles_fwd, _blend_tiles_bwd)


def tiles_to_image(tile_pixels: jnp.ndarray, width: int, height: int,
                   statics: BlendStatics) -> jnp.ndarray:
    """(T, P, C) tile-major pixels → (C, H, W) image (CHW like the reference)."""
    gw, gh = statics.grid_width, statics.grid_height
    tw, th = statics.tile_width, statics.tile_height
    c = tile_pixels.shape[-1]
    img = tile_pixels.reshape(gh, gw, th, tw, c)
    img = img.transpose(0, 2, 1, 3, 4).reshape(gh * th, gw * tw, c)
    return img[:height, :width].transpose(2, 0, 1)


def image_to_tiles(image_chw: jnp.ndarray, statics: BlendStatics) -> jnp.ndarray:
    """(C, H, W) → zero-padded (T, P, C) tile-major pixels."""
    gw, gh = statics.grid_width, statics.grid_height
    tw, th = statics.tile_width, statics.tile_height
    c, h, w = image_chw.shape
    padded = jnp.zeros((gh * th, gw * tw, c), image_chw.dtype)
    padded = padded.at[:h, :w].set(image_chw.transpose(1, 2, 0))
    tiles = padded.reshape(gh, th, gw, tw, c).transpose(0, 2, 1, 3, 4)
    return tiles.reshape(gh * gw, th * tw, c)
