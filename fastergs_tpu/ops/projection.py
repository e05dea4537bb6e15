"""Per-Gaussian preprocessing: culling, EWA projection, conic + anti-aliasing,
SH→color, screen-space tile bounds.

TPU-native redesign of the reference's `preprocess_cu` kernel
(reference: rasterization/include/kernels_forward.cuh:14-210). Differences
from the CUDA design, by intent:

- Fully vectorized over N with masks instead of thread-level early exits; the
  compacted atomic counters (`n_visible_primitives`, `n_instances`,
  kernels_forward.cuh:205-209) are replaced by boolean masks + prefix sums so
  everything stays static-shaped under `jit`.
- Written as a pure differentiable function; the entire analytic preprocess
  backward (kernels_backward.cuh:15-257) — cov2d→cov3d→{scale, rotation}
  chain, clipped-Jacobian mean gradient, SH direction gradient — falls out of
  JAX autodiff because the forward math is identical, including the frustum
  clamp (whose clamp subgradient reproduces the reference's valid_x/valid_y
  logic at kernels_backward.cuh:211-217).
- The Mip-Splatting anti-aliasing convolution factor is wrapped in
  `stop_gradient` w.r.t. cov2d, reproducing
  `detach_dilation_proper_antialiasing_from_cov2d=true`
  (rasterization_config.h:12, kernels_backward.cuh:137-144): the gradient
  flows to opacity only.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from fastergs_tpu.constants import RasterizerConstants, DEFAULT_CONSTANTS
from fastergs_tpu.ops.math import sigmoid
from fastergs_tpu.ops.sh import eval_sh_color


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CameraParams:
    """Camera bundle passed into jitted render functions.

    `width`/`height` are static metadata (they determine output shapes and the
    tile grid); pose and intrinsics are traced leaves so switching views does
    not retrigger compilation.
    """
    w2c: jnp.ndarray           # (3, 4) world→camera
    cam_position: jnp.ndarray  # (3,)
    focal_x: jnp.ndarray
    focal_y: jnp.ndarray
    center_x: jnp.ndarray
    center_y: jnp.ndarray
    near_plane: jnp.ndarray
    far_plane: jnp.ndarray
    width: int = dataclasses.field(metadata=dict(static=True), default=0)
    height: int = dataclasses.field(metadata=dict(static=True), default=0)

    @classmethod
    def from_view(cls, view) -> 'CameraParams':
        """Build from a `fastergs_tpu.data.cameras.View`."""
        c = view.camera
        return cls(
            w2c=jnp.asarray(view.w2c34),
            cam_position=jnp.asarray(view.position),
            focal_x=jnp.float32(c.focal_x), focal_y=jnp.float32(c.focal_y),
            center_x=jnp.float32(c.center_x), center_y=jnp.float32(c.center_y),
            near_plane=jnp.float32(c.near_plane), far_plane=jnp.float32(c.far_plane),
            width=c.width, height=c.height,
        )


# static size of the per-Gaussian exact-tile-test window: Gaussians whose
# rect covers more tiles fall back to conservative rect binning (the blend's
# alpha threshold makes any superset of the exact instance set produce
# identical output — see ops/tiles.py)
EXACT_TEST_WINDOW = 64


class Primitives2D(NamedTuple):
    """Per-Gaussian screen-space primitives (all shape (N, ...))."""
    visible: jnp.ndarray          # (N,) bool — survives all culling tests
    depth: jnp.ndarray            # (N,) f32 camera-space z
    mean2d: jnp.ndarray           # (N, 2) f32 pixel coords
    conic: jnp.ndarray            # (N, 3) f32 inverse cov2d (a, b, c)
    opacity: jnp.ndarray          # (N,) f32 final opacity (after AA factor)
    color: jnp.ndarray            # (N, 3) f32 raw SH color (unclamped)
    power_threshold: jnp.ndarray  # (N,) f32 truncation power
    rect: jnp.ndarray             # (N, 4) i32 tile bounds (x0, x1, y0, y1)
    n_touched: jnp.ndarray        # (N,) i32 instance count (exact when the
                                  # rect fits the test window, else rect area)
    tile_mask: jnp.ndarray        # (N, 2) i32 64-bit contribution bitmask
    exact: jnp.ndarray            # (N,) bool — tile_mask/exact count valid


def grid_size(width: int, height: int, consts: RasterizerConstants = DEFAULT_CONSTANTS):
    gw = -(-width // consts.tile_width)
    gh = -(-height // consts.tile_height)
    return gw, gh


def preprocess(
    means: jnp.ndarray,          # (N, 3)
    raw_scales: jnp.ndarray,     # (N, 3) log-space
    raw_rotations: jnp.ndarray,  # (N, 4) unnormalized (w, x, y, z)
    raw_opacities: jnp.ndarray,  # (N,) or (N, 1) logit-space
    sh_0: jnp.ndarray,           # (N, 1, 3)
    sh_rest: jnp.ndarray,        # (N, B-1, 3)
    cam: CameraParams,
    active_mask: jnp.ndarray | None = None,   # (N,) bool for padded capacity
    active_sh_bases: int = 16,
    proper_antialiasing: bool = False,
    consts: RasterizerConstants = DEFAULT_CONSTANTS,
    opacity_factor: jnp.ndarray | None = None,  # (N,) e.g. temporal visibility
) -> Primitives2D:
    """Vectorized equivalent of preprocess_cu (kernels_forward.cuh:14-210)."""
    n = means.shape[0]
    raw_opacities = raw_opacities.reshape(n)
    w2c = cam.w2c
    r1, r2, r3 = w2c[0], w2c[1], w2c[2]

    visible = jnp.ones((n,), dtype=bool) if active_mask is None else active_mask

    # --- z culling (kernels_forward.cuh:64-67) ---
    depth = jnp.matmul(means, r3[:3],
                   precision=jax.lax.Precision.HIGHEST) + r3[3]
    visible &= (depth >= cam.near_plane) & (depth <= cam.far_plane)
    safe_depth = jnp.where(depth > 1e-12, depth, 1.0)

    # --- opacity culling (kernels_forward.cuh:73-75) ---
    opacity = sigmoid(raw_opacities)
    if opacity_factor is not None:
        # e.g. the 4D model's temporal visibility window (gaussians4d.py)
        opacity = opacity * opacity_factor
    if consts.original_opacity_interpretation:
        visible &= opacity >= consts.min_alpha_threshold

    # --- 3d covariance (kernels_forward.cuh:78-96) ---
    # Struct-of-arrays component form throughout: (N, 3, 3) stacks/einsums
    # produce 3-wide minor dimensions that the TPU vector unit cannot tile;
    # explicit (N,) component arithmetic keeps every op a full-lane vector op.
    variance = jnp.exp(2.0 * raw_scales)  # (N, 3)
    v1, v2, v3 = variance[:, 0], variance[:, 1], variance[:, 2]
    q = raw_rotations
    norm_sq = jnp.sum(q * q, axis=-1)
    visible &= norm_sq >= 1e-8
    s = 1.0 / jnp.maximum(norm_sq, 1e-12)
    r_, x_, y_, z_ = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    xx, yy, zz = x_ * x_, y_ * y_, z_ * z_
    xy, xz, yz = x_ * y_, x_ * z_, y_ * z_
    rx, ry, rz = r_ * x_, r_ * y_, r_ * z_
    # rotation matrix components (rows ra*, rb*, rc*)
    ra1 = 1.0 - 2.0 * (yy + zz) * s
    ra2 = 2.0 * (xy - rz) * s
    ra3 = 2.0 * (xz + ry) * s
    rb1 = 2.0 * (xy + rz) * s
    rb2 = 1.0 - 2.0 * (xx + zz) * s
    rb3 = 2.0 * (yz - rx) * s
    rc1 = 2.0 * (xz - ry) * s
    rc2 = 2.0 * (yz + rx) * s
    rc3 = 1.0 - 2.0 * (xx + yy) * s
    # cov3d = R diag(variance) R^T, six unique components
    c11 = ra1 * ra1 * v1 + ra2 * ra2 * v2 + ra3 * ra3 * v3
    c12 = ra1 * rb1 * v1 + ra2 * rb2 * v2 + ra3 * rb3 * v3
    c13 = ra1 * rc1 * v1 + ra2 * rc2 * v2 + ra3 * rc3 * v3
    c22 = rb1 * rb1 * v1 + rb2 * rb2 * v2 + rb3 * rb3 * v3
    c23 = rb1 * rc1 * v1 + rb2 * rc2 * v2 + rb3 * rc3 * v3
    c33 = rc1 * rc1 * v1 + rc2 * rc2 * v2 + rc3 * rc3 * v3

    # --- normalized image coords (kernels_forward.cuh:99-102) ---
    x = (jnp.matmul(means, r1[:3],
                precision=jax.lax.Precision.HIGHEST) + r1[3]) / safe_depth
    y = (jnp.matmul(means, r2[:3],
                precision=jax.lax.Precision.HIGHEST) + r2[3]) / safe_depth

    # --- EWA Jacobian with ±15% frustum clamp (kernels_forward.cuh:105-124) ---
    clip_left = (-0.15 * cam.width - cam.center_x) / cam.focal_x
    clip_right = (1.15 * cam.width - cam.center_x) / cam.focal_x
    clip_top = (-0.15 * cam.height - cam.center_y) / cam.focal_y
    clip_bottom = (1.15 * cam.height - cam.center_y) / cam.focal_y
    x_clipped = jnp.clip(x, clip_left, clip_right)
    y_clipped = jnp.clip(y, clip_top, clip_bottom)
    j11 = cam.focal_x / safe_depth
    j13 = -j11 * x_clipped
    j22 = cam.focal_y / safe_depth
    j23 = -j22 * y_clipped
    # JW rows in components: w1k = j11*r1[k] + j13*r3[k] (camera rows are
    # (3,) scalars broadcast over lanes)
    w11 = j11 * r1[0] + j13 * r3[0]
    w12 = j11 * r1[1] + j13 * r3[1]
    w13 = j11 * r1[2] + j13 * r3[2]
    w21 = j22 * r2[0] + j23 * r3[0]
    w22 = j22 * r2[1] + j23 * r3[1]
    w23 = j22 * r2[2] + j23 * r3[2]

    # cov2d = JW cov3d JW^T (kernels_forward.cuh:125-139)
    jwc11 = w11 * c11 + w12 * c12 + w13 * c13
    jwc12 = w11 * c12 + w12 * c22 + w13 * c23
    jwc13 = w11 * c13 + w12 * c23 + w13 * c33
    jwc21 = w21 * c11 + w22 * c12 + w23 * c13
    jwc22 = w21 * c12 + w22 * c22 + w23 * c23
    jwc23 = w21 * c13 + w22 * c23 + w23 * c33
    cov_a_raw = jwc11 * w11 + jwc12 * w12 + jwc13 * w13
    cov_b = jwc11 * w21 + jwc12 * w22 + jwc13 * w23
    cov_c_raw = jwc21 * w21 + jwc22 * w22 + jwc23 * w23

    det_raw = cov_a_raw * cov_c_raw - cov_b * cov_b
    kernel_size = (consts.dilation_proper_antialiasing if proper_antialiasing
                   else consts.dilation)
    cov_a = cov_a_raw + kernel_size
    cov_c = cov_c_raw + kernel_size
    det = cov_a * cov_c - cov_b * cov_b
    visible &= det >= consts.min_cov2d_determinant
    safe_det = jnp.where(jnp.abs(det) > 1e-12, det, 1.0)
    conic = jnp.stack([cov_c / safe_det, -cov_b / safe_det, cov_a / safe_det], axis=-1)

    if proper_antialiasing:
        # conv factor detached from cov2d (rasterization_config.h:12):
        # the gradient flows to opacity only (kernels_backward.cuh:137-144).
        conv_factor = jnp.sqrt(jnp.maximum(det_raw / safe_det, 0.0))
        if consts.detach_dilation_proper_antialiasing_from_cov2d:
            conv_factor = jax.lax.stop_gradient(conv_factor)
        opacity = opacity * conv_factor
        if consts.original_opacity_interpretation:
            visible &= opacity >= consts.min_alpha_threshold

    # --- screen-space mean (kernels_forward.cuh:157-160) ---
    mean2d = jnp.stack([x * cam.focal_x + cam.center_x,
                        y * cam.focal_y + cam.center_y], axis=-1)

    # --- per-primitive truncation power (kernels_forward.cuh:163) ---
    if consts.original_opacity_interpretation:
        power_threshold = jnp.log(
            jnp.maximum(opacity, 1e-12) * consts.min_alpha_threshold_rcp)
    else:
        power_threshold = jnp.full((n,), consts.max_power_threshold,
                                   dtype=jnp.float32)

    # --- tile bounds (kernels_forward.cuh:164-174) — integer, no gradient ---
    gw, gh = grid_size(cam.width, cam.height, consts)
    cutoff = jnp.maximum(2.0 * power_threshold, 0.0)
    sg = jax.lax.stop_gradient
    extent_x = jnp.maximum(jnp.sqrt(jnp.maximum(sg(cov_a) * cutoff, 0.0)) - 0.5, 0.0)
    extent_y = jnp.maximum(jnp.sqrt(jnp.maximum(sg(cov_c) * cutoff, 0.0)) - 0.5, 0.0)
    m2d = sg(mean2d)
    x0 = jnp.clip(jnp.floor((m2d[:, 0] - extent_x) / consts.tile_width), 0, gw).astype(jnp.int32)
    x1 = jnp.clip(jnp.ceil((m2d[:, 0] + extent_x) / consts.tile_width), 0, gw).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor((m2d[:, 1] - extent_y) / consts.tile_height), 0, gh).astype(jnp.int32)
    y1 = jnp.clip(jnp.ceil((m2d[:, 1] + extent_y) / consts.tile_height), 0, gh).astype(jnp.int32)
    area = (x1 - x0) * (y1 - y0)
    visible &= area > 0
    rect = jnp.stack([x0, x1, y0, y1], axis=-1)

    # --- exact tile contribution count + bitmask ---
    # TPU-native form of compute_exact_n_touched_tiles (kernel_utils.cuh:
    # 108-171): instead of warp-cooperative enumeration, every Gaussian tests
    # a static window of rect positions in one vectorized sweep; the result
    # is stored as a 64-bit mask so instance expansion needs NO per-instance
    # float data. Oversized rects (> EXACT_TEST_WINDOW tiles, rare) fall back
    # to conservative rect binning — the blend's alpha threshold guarantees
    # identical output for any superset of the exact instance set.
    r = jnp.arange(EXACT_TEST_WINDOW, dtype=jnp.int32)
    rect_w = jnp.maximum(x1 - x0, 1)
    rx = x0[:, None] + r[None, :] % rect_w[:, None]
    ry = y0[:, None] + r[None, :] // rect_w[:, None]
    in_area = r[None, :] < area[:, None]
    contrib = in_area & will_primitive_contribute(
        sg(mean2d)[:, None, :] - 0.5, sg(conic)[:, None, :], rx, ry,
        sg(power_threshold)[:, None], consts)
    half = EXACT_TEST_WINDOW // 2
    weights = (jnp.uint32(1) << jnp.arange(half, dtype=jnp.uint32))
    mask_lo = jnp.sum(contrib[:, :half].astype(jnp.uint32) * weights[None],
                      axis=1).astype(jnp.int32)
    mask_hi = jnp.sum(contrib[:, half:].astype(jnp.uint32) * weights[None],
                      axis=1).astype(jnp.int32)
    exact = area <= EXACT_TEST_WINDOW
    n_exact = jnp.sum(contrib, axis=1).astype(jnp.int32)
    n_touched = jnp.where(exact, n_exact, area)
    visible &= n_touched > 0
    n_touched = jnp.where(visible, n_touched, 0)

    # --- SH color (kernels_forward.cuh:198-203, sh_utils.cuh:32-69) ---
    color = eval_sh_color(sh_0, sh_rest, means, cam.cam_position, active_sh_bases)

    return Primitives2D(
        visible=visible,
        depth=depth,
        mean2d=mean2d,
        conic=conic,
        opacity=opacity,
        color=color,
        power_threshold=power_threshold,
        rect=rect,
        n_touched=n_touched,
        tile_mask=jnp.stack([mask_lo, mask_hi], axis=1),
        exact=exact,
    )


def will_primitive_contribute(
    mean2d_shifted: jnp.ndarray,   # (..., 2) mean2d - 0.5
    conic: jnp.ndarray,            # (..., 3)
    tile_x: jnp.ndarray,           # (...,) i32
    tile_y: jnp.ndarray,           # (...,) i32
    power_threshold: jnp.ndarray,  # (...,)
    consts: RasterizerConstants = DEFAULT_CONSTANTS,
) -> jnp.ndarray:
    """Exact tile-contribution test (StopThePop), vectorized.

    Reference: kernel_utils.cuh:62-105. Finds the point inside the tile with
    maximal Gaussian contribution along the closest edge and checks its power
    against the truncation threshold. Shrinks the instance set 2-4x compared
    to plain rect binning.
    """
    tw, th = float(consts.tile_width), float(consts.tile_height)
    rect_min_x = tile_x.astype(jnp.float32) * tw
    rect_min_y = tile_y.astype(jnp.float32) * th
    rect_max_x = rect_min_x + (tw - 1.0)
    rect_max_y = rect_min_y + (th - 1.0)

    mx, my = mean2d_shifted[..., 0], mean2d_shifted[..., 1]
    ca, cb, cc = conic[..., 0], conic[..., 1], conic[..., 2]

    x_min_diff = rect_min_x - mx
    x_left = (x_min_diff > 0.0).astype(jnp.float32)
    not_in_x = x_left + (mx > rect_max_x).astype(jnp.float32)
    y_min_diff = rect_min_y - my
    y_above = (y_min_diff > 0.0).astype(jnp.float32)
    not_in_y = y_above + (my > rect_max_y).astype(jnp.float32)

    inside = (not_in_x + not_in_y) == 0.0

    # closest corner via lerp(rect_max, rect_min, left/above)
    corner_x = rect_max_x + x_left * (rect_min_x - rect_max_x)
    corner_y = rect_max_y + y_above * (rect_min_y - rect_max_y)
    diff_x = mx - corner_x
    diff_y = my - corner_y
    dx = jnp.where(x_min_diff > 0.0, tw - 1.0, -(tw - 1.0))
    dy = jnp.where(y_min_diff > 0.0, th - 1.0, -(th - 1.0))

    tx = not_in_y * jnp.clip((dx * ca * diff_x + dx * cb * diff_y) / (dx * ca * dx), 0.0, 1.0)
    ty = not_in_x * jnp.clip((dy * cb * diff_x + dy * cc * diff_y) / (dy * cc * dy), 0.0, 1.0)

    px = corner_x + tx * dx
    py = corner_y + ty * dy
    delta_x = mx - px
    delta_y = my - py
    max_power = 0.5 * (ca * delta_x * delta_x + cc * delta_y * delta_y) + cb * delta_x * delta_y
    return inside | (max_power <= power_threshold)
