"""Slow, literal reference oracle renderer for testing.

Implements the reference blend semantics (kernels_forward.cuh:363-475) as a
sequential `lax.scan` over depth-sorted Gaussians with an explicit sticky
`done` flag — deliberately a *different structure* from the production
chunked/cumprod path in ops/blend.py, so the two cross-validate each other.
Differentiable, so `jax.grad` through it also serves as the gradient oracle
for the custom_vjp backward.

Only suitable for small scenes (O(N·pixels) dense evaluation).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from fastergs_tpu.constants import RasterizerConstants, DEFAULT_CONSTANTS
from fastergs_tpu.ops.projection import (
    CameraParams, preprocess, will_primitive_contribute, grid_size)
from fastergs_tpu.ops.rasterize import RasterizerSettings


def render_dense_oracle(
    means, raw_scales, raw_rotations, raw_opacities, sh_0, sh_rest,
    settings: RasterizerSettings,
    consts: RasterizerConstants = DEFAULT_CONSTANTS,
    exact_tile_test: bool = True,
):
    """Returns (CHW image, final transmittance (H, W)). O(N * H * W)."""
    cam = settings.camera
    prims = preprocess(
        means, raw_scales, raw_rotations, raw_opacities, sh_0, sh_rest, cam,
        active_sh_bases=settings.active_sh_bases,
        proper_antialiasing=settings.proper_antialiasing, consts=consts)

    n = means.shape[0]
    h, w = cam.height, cam.width
    gw, _ = grid_size(cam.width, cam.height, consts)

    # pixel grid and owning tiles
    ys, xs = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing='ij')
    px = xs.reshape(-1).astype(jnp.float32) + 0.5
    py = ys.reshape(-1).astype(jnp.float32) + 0.5
    tile_x = (xs.reshape(-1) // consts.tile_width).astype(jnp.int32)
    tile_y = (ys.reshape(-1) // consts.tile_height).astype(jnp.int32)

    # global depth order over all Gaussians (invisible pushed to the end)
    order = jnp.argsort(jnp.where(prims.visible, prims.depth, jnp.inf))

    def membership(i):
        """Does Gaussian i produce an instance in each pixel's tile?"""
        rect = prims.rect[i]
        in_rect = ((tile_x >= rect[0]) & (tile_x < rect[1])
                   & (tile_y >= rect[2]) & (tile_y < rect[3]))
        member = in_rect & prims.visible[i]
        if exact_tile_test:
            member &= will_primitive_contribute(
                prims.mean2d[i] - 0.5, prims.conic[i], tile_x, tile_y,
                prims.power_threshold[i], consts)
        return member

    def step(carry, i):
        trans, done, color = carry
        member = membership(i)
        dx = prims.mean2d[i, 0] - px
        dy = prims.mean2d[i, 1] - py
        co = prims.conic[i]
        power = -0.5 * (co[0] * dx * dx + co[2] * dy * dy) - co[1] * dx * dy
        gauss = jnp.exp(jnp.minimum(power, 0.0))
        alpha = prims.opacity[i] * gauss
        if consts.original_opacity_interpretation:
            ok = alpha >= consts.min_alpha_threshold
        else:
            ok = gauss >= consts.min_alpha_threshold
        use = member & ok & ~done
        weight = jnp.where(use, trans * alpha, 0.0)
        color = color + weight[:, None] * jnp.maximum(prims.color[i], 0.0)[None, :]
        trans = jnp.where(use, trans * (1.0 - alpha), trans)
        done = done | (trans < consts.transmittance_threshold)
        return (trans, done, color), None

    init = (jnp.ones(h * w), jnp.zeros(h * w, bool), jnp.zeros((h * w, 3)))
    (trans, _, color), _ = jax.lax.scan(step, init, order)

    color = color + trans[:, None] * settings.bg_color[None, :]
    image = color.reshape(h, w, 3).transpose(2, 0, 1)
    return image, trans.reshape(h, w)
