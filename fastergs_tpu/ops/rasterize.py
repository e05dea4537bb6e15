"""Public rasterization API: differentiable render, fast inference render.

TPU-native equivalent of the reference's binding surface
(reference: FasterGSCudaBackend/torch_bindings/rasterization.py:113-176 —
`diff_rasterize`, `rasterize`, `RasterizerSettings`) and of the CUDA host
orchestration (rasterization/src/forward.cu, inference.cu). The
`torch.autograd.Function` + byte-blob scratch plumbing is replaced by
`jax.custom_vjp` (in ops/blend.py) and ordinary functional composition; the
dynamic counter D2H syncs (forward.cu:99-102,234) are replaced by a static
instance capacity whose utilization is returned in `RenderAux` so the host
loop can grow it between jitted steps.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from fastergs_tpu.constants import RasterizerConstants, DEFAULT_CONSTANTS
from fastergs_tpu.ops.projection import CameraParams, Primitives2D, preprocess, grid_size
from fastergs_tpu.ops.tiles import TileInstances, build_tile_instances
from fastergs_tpu.ops.blend import (
    BlendStatics, blend_tiles, pack_blend_inputs, tiles_to_image,
    image_to_tiles)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RasterizerSettings:
    """Mirror of the reference RasterizerSettings NamedTuple
    (torch_bindings/rasterization.py:8-38): camera + background + SH state."""
    camera: CameraParams
    bg_color: jnp.ndarray  # (3,)
    active_sh_bases: int = dataclasses.field(metadata=dict(static=True), default=16)
    proper_antialiasing: bool = dataclasses.field(metadata=dict(static=True), default=False)


class RenderAux(NamedTuple):
    """Side information from a render (all non-differentiable)."""
    n_instances: jnp.ndarray       # () i32 contributing instances
    n_rect_instances: jnp.ndarray  # () i32 expanded slot count (overflow if > cap)
    n_visible: jnp.ndarray         # () i32 visible primitives
    transmittance: jnp.ndarray     # (T, P) final per-pixel transmittance


def render_from_primitives(
    prims: Primitives2D,
    settings: RasterizerSettings,
    instance_cap: int,
    chunk: int = 32,
    consts: RasterizerConstants = DEFAULT_CONSTANTS,
    exact_tile_test: bool = True,
    use_pallas: bool | None = None,
    tile_row_band: tuple | None = None,
    composite_background: bool = True,
    inference: bool = False,
) -> tuple[jnp.ndarray, RenderAux]:
    """Differentiable image from per-Gaussian screen-space primitives.

    tile_row_band=(lo, hi): render only tiles whose row is in [lo, hi) —
    the device-banding hook of the Gaussian-sharded multi-chip step; out-of-
    band tiles come back as (acc=0, transmittance=1).
    composite_background=False returns a 4-channel [rgb | transmittance]
    image (both differentiable) and leaves compositing to the caller (used
    by the banded step, which composites AFTER the cross-device reduction).
    inference=True (render-only; NOT differentiable) dispatches the
    dedicated no-saved-state forward (the analog of the reference's
    inference pipeline, inference.cu:11-221): no custom_vjp plumbing, no
    gradient re-attachment gather, no frozen-transmittance bookkeeping.
    On the non-Pallas (XLA/CPU) path there is no dedicated render-only
    composition — inference=True falls back to the ordinary forward
    (results identical; the speed distinction only exists on real TPUs).

    Splitting here (rather than inside one opaque function) lets the training
    step capture the per-Gaussian mean2d cotangent for densification info —
    the analog of the reference's densification_info accumulation inside
    preprocess_backward_cu (kernels_backward.cuh:194-201).
    """
    if use_pallas is None:
        # hand-written kernels on real TPUs; the XLA composition elsewhere
        # (interpret-mode Pallas is only for correctness tests)
        use_pallas = jax.default_backend() == 'tpu'
    cam = settings.camera
    gw, gh = grid_size(cam.width, cam.height, consts)
    statics = BlendStatics.create(gw, gh, chunk, consts,
                                  image_width=cam.width,
                                  image_height=cam.height)
    sg_prims = jax.tree_util.tree_map(jax.lax.stop_gradient, prims)

    # one differentiable packed gather: its transpose is the per-Gaussian
    # scatter-add reduction (the deterministic analog of
    # kernels_backward.cuh:459-470)
    pack9 = pack_blend_inputs(prims.mean2d, prims.conic, prims.opacity,
                              prims.color)
    if use_pallas:
        from fastergs_tpu.ops import blend_stream
        from fastergs_tpu.ops.tiles import (
            attach_stream_grad, build_tile_instances_stream)
        # streaming kernels process STEP instances per grid step
        instance_cap = -(-instance_cap // blend_stream.STEP) * blend_stream.STEP
        # the 9 field columns ride the expansion + sort as payload (nearly
        # free) instead of a post-sort row gather (~12 ns/row latency-bound);
        # attach_stream_grad restores the pack9 gradient via the
        # deterministic per-Gaussian reduction
        inst, rows10 = build_tile_instances_stream(
            sg_prims, jax.lax.stop_gradient(pack9), gw, gh, instance_cap,
            consts, tile_row_band=tile_row_band)
        n_instances, n_expanded = inst.n_instances, inst.n_expanded_instances
        if inference:
            # render-only: the sorted columns feed the no-saved-state
            # forward directly (no grad attachment, no bwd block pipeline)
            acc, trans = blend_stream.split_fin(
                blend_stream.blend_stream_forward(
                    rows10, statics, inference=True))
        else:
            packed_t = attach_stream_grad(pack9, rows10, inst.gaussian_idx)
            # per-chunk first/last tile ids drive the backward's pipeline
            c = blend_stream.CHUNK
            ft = jnp.minimum(inst.tile_idx[::c], gw * gh - 1)
            lt = jnp.minimum(inst.tile_idx[c - 1::c], gw * gh - 1)
            acc, trans = blend_stream.blend_stream(packed_t, ft, lt, statics)
    else:
        inst: TileInstances = build_tile_instances(
            sg_prims, gw, gh, instance_cap, consts, exact_tile_test,
            tile_row_band=tile_row_band)
        n_instances, n_expanded = inst.n_instances, inst.n_expanded_instances
        packed = pack9[inst.gaussian_idx]
        acc, trans = blend_tiles(packed, inst.tile_start, inst.tile_end,
                                 statics)

    # background compositing (kernels_forward.cuh:460) — differentiable in bg
    if composite_background:
        tile_pixels = acc + trans[..., None] * settings.bg_color[None, None, :]
    else:
        # 4-channel output [premultiplied rgb | transmittance]: keeps the
        # transmittance on the DIFFERENTIABLE path so a caller compositing
        # after a cross-device reduction still backpropagates through it
        tile_pixels = jnp.concatenate([acc, trans[..., None]], axis=-1)
    image = tiles_to_image(tile_pixels, cam.width, cam.height, statics)

    aux = RenderAux(
        n_instances=n_instances,
        n_rect_instances=n_expanded,
        n_visible=jnp.sum(prims.visible.astype(jnp.int32)),
        transmittance=trans,
    )
    return image, aux


def _validate_inputs(means, raw_scales, raw_rotations, raw_opacities,
                     sh0, sh_rest, settings):
    """Debug-mode trace-time validation (the reference's CHECK_INPUT,
    utils/torch_utils.h:14-19 — contiguity/device checks become shape and
    dtype checks; XLA owns layout and placement)."""
    n = means.shape[0]
    expect = {
        'means': (means, (n, 3)),
        'raw_scales': (raw_scales, (n, 3)),
        'raw_rotations': (raw_rotations, (n, 4)),
        'sh_coefficients_0': (sh0, (n, 1, 3)),
    }
    for name, (arr, shape) in expect.items():
        if tuple(arr.shape) != shape:
            raise ValueError(f'{name}: expected shape {shape}, '
                             f'got {tuple(arr.shape)}')
        if arr.dtype != jnp.float32:
            raise ValueError(f'{name}: expected float32, got {arr.dtype}')
    if raw_opacities.shape not in ((n,), (n, 1)):
        raise ValueError(f'raw_opacities: expected ({n},) or ({n}, 1), '
                         f'got {tuple(raw_opacities.shape)}')
    if sh_rest.ndim != 3 or sh_rest.shape[0] != n or sh_rest.shape[2] != 3:
        raise ValueError(f'sh_coefficients_rest: expected ({n}, B-1, 3), '
                         f'got {tuple(sh_rest.shape)}')
    n_bases = sh_rest.shape[1] + 1
    if settings.active_sh_bases > n_bases:
        raise ValueError(f'active_sh_bases {settings.active_sh_bases} '
                         f'exceeds stored bases {n_bases}')
    if settings.camera.width <= 0 or settings.camera.height <= 0:
        raise ValueError('camera width/height must be set (static fields)')


def diff_rasterize(
    means: jnp.ndarray,
    raw_scales: jnp.ndarray,
    raw_rotations: jnp.ndarray,
    raw_opacities: jnp.ndarray,
    sh_coefficients_0: jnp.ndarray,
    sh_coefficients_rest: jnp.ndarray,
    settings: RasterizerSettings,
    active_mask: jnp.ndarray | None = None,
    instance_cap: int = 1 << 20,
    chunk: int = 32,
    consts: RasterizerConstants = DEFAULT_CONSTANTS,
    exact_tile_test: bool = True,
    use_pallas: bool | None = None,
    opacity_factor: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, RenderAux]:
    """Differentiable render (reference: diff_rasterize,
    torch_bindings/rasterization.py:113-132). Returns (CHW image, aux)."""
    if consts.debug:
        _validate_inputs(means, raw_scales, raw_rotations, raw_opacities,
                         sh_coefficients_0, sh_coefficients_rest, settings)
    prims = preprocess(
        means, raw_scales, raw_rotations, raw_opacities,
        sh_coefficients_0, sh_coefficients_rest, settings.camera,
        active_mask=active_mask, active_sh_bases=settings.active_sh_bases,
        proper_antialiasing=settings.proper_antialiasing, consts=consts,
        opacity_factor=opacity_factor)
    return render_from_primitives(prims, settings, instance_cap, chunk,
                                  consts, exact_tile_test, use_pallas)


def rasterize(
    means: jnp.ndarray,
    raw_scales: jnp.ndarray,
    raw_rotations: jnp.ndarray,
    raw_opacities: jnp.ndarray,
    sh_coefficients_0: jnp.ndarray,
    sh_coefficients_rest: jnp.ndarray,
    settings: RasterizerSettings,
    to_chw: bool = True,
    active_mask: jnp.ndarray | None = None,
    instance_cap: int = 1 << 20,
    chunk: int = 64,
    consts: RasterizerConstants = DEFAULT_CONSTANTS,
    opacity_factor: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Fast inference render (reference: rasterize → _C.inference,
    inference.cu:11-221): no gradient state, saturated output, CHW or HWC.

    Dispatches the dedicated render-only pipeline (render_from_primitives
    inference=True): no custom_vjp machinery, no gradient re-attachment,
    no frozen-transmittance bookkeeping inside the kernel — the TPU analog
    of the reference's no-saved-state inference kernels
    (kernels_inference.cuh:349-432). On the non-Pallas (XLA/CPU) fallback
    the ordinary forward composition runs instead — results identical,
    the fast path only exists on real TPUs.
    """
    if consts.debug:
        _validate_inputs(means, raw_scales, raw_rotations, raw_opacities,
                         sh_coefficients_0, sh_coefficients_rest, settings)
    args = (means, raw_scales, raw_rotations, raw_opacities,
            sh_coefficients_0, sh_coefficients_rest)
    args = jax.tree_util.tree_map(jax.lax.stop_gradient, args)
    prims = preprocess(
        *args, settings.camera,
        active_mask=active_mask, active_sh_bases=settings.active_sh_bases,
        proper_antialiasing=settings.proper_antialiasing, consts=consts,
        opacity_factor=opacity_factor)
    image, _ = render_from_primitives(prims, settings, instance_cap, chunk,
                                      consts, inference=True)
    image = jnp.clip(image, 0.0, 1.0)  # __saturatef (kernels_inference.cuh)
    return image if to_chw else image.transpose(1, 2, 0)
