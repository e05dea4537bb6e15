"""Chunk-major streaming Pallas blend kernels (forward + backward).

Second-generation TPU blend design (the first-generation per-tile
kernels were removed; see git history of ops/blend_pallas.py). The
per-tile design required every tile's instance range to start at a
128-aligned slot, which forced ~30%
dummy padding slots through the sort/gather/scatter stages plus an XLA
histogram scatter (~15 ms) to size the padding. This kernel instead walks
the tile-sorted instance stream in fixed 128-instance chunks:

- grid = I / 128 chunks; the packed instance fields arrive as auto-pipelined
  (16, 128) blocks — fully sequential HBM reads, no manual DMA of inputs;
- tile boundaries are detected IN-KERNEL from a tile-id field row; the
  front-to-back products/sums become *segmented* lane scans that reset at
  boundaries (the segment condition rides the same log-step lane rolls);
- per-pixel tile state (color accumulator, transmittance, residual-grad
  carry) lives in VMEM scratch and carries across grid steps until the
  tile's last instance streams by;
- forward outputs are flushed per completed tile through a small ring of
  DMA staging buffers; empty tiles are emitted on tile-id skips;
- the backward writes each chunk's gradient rows to its own auto-pipelined
  output block — by construction no two chunks write the same slots, so the
  alignment padding (and its extra scatter rows) disappears entirely.

Consequences upstream: binning needs NO per-tile histogram, NO alignment
dummies, and NO searchsorted ranges — just the expansion and one
lexicographic sort over the compact instance capacity (ops/tiles.py
build_tile_instances_compact).

Semantics are identical to the XLA path in ops/blend.py (reference:
kernels_forward.cuh:363-475, kernels_backward.cuh:260-471): original or
revised opacity thresholding, sticky frozen transmittance at the early-
termination crossing, straight-through color clamp, background handled by
the caller, deterministic per-instance gradients.

Instance field layout (16, I) transposed struct-of-fields, instances in
lanes: rows [mx, my, conic_a, conic_b, conic_c, opacity, r, g, b, tile_id,
pad...]; slots past the real instance count carry tile_id == n_tiles
(sentinel) and all-zero fields (alpha == 0, inert).

Finiteness precondition: the masked-matmul expansions (seg_acc's wm·c3 and
the backward's ga6/cl6/w6 rank-k products) zero the MASK side only, so a
non-finite color/aux value in an excluded lane would propagate as 0·Inf =
NaN through the MXU reduction. Callers guarantee finite fields: sentinel
slots are zero-filled by the binning fill, and the projection/activation
pipeline produces finite primitives for any finite parameters (opacities
via sigmoid, scales via bounded exp, conics via guarded inversion).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fastergs_tpu.ops.blend import BlendStatics

# Mosaic supports only DEFAULT (1-pass bf16) and HIGHEST (6-pass f32-exact)
# dot precision; bf16 is too coarse for the transmittance cumsums and the
# gradient parity contract, so every kernel matmul runs HIGHEST
_PREC = jax.lax.Precision.HIGHEST

# Exact-side limb matmuls (round 5): when ONE operand is exactly
# representable in bf16 (the 0/1 triangular cumsum matrix; the pixel basis,
# whose entries are half-integer products with <= 8 significant bits), a
# 3-limb bf16 decomposition of the OTHER operand reproduces HIGHEST's
# accuracy in 3 MXU passes instead of 6 (HIGHEST decomposes BOTH sides).
_EXACT_SIDE_LIMBS = True
_N_LIMBS = 3


def _limbs(x, n=None):
    """bf16 limb decomposition: x == sum(limbs) to ~8*n mantissa bits."""
    n = _N_LIMBS if n is None else n
    out = []
    rest = x
    for i in range(n):
        li = rest.astype(jnp.bfloat16)
        out.append(li)
        if i + 1 < n:
            rest = rest - li.astype(jnp.float32)
    return out


def _mm_exact_lhs(a_exact, b, dims=(((1,), (0,)), ((), ()))):
    """a_exact @ b where a_exact is bf16-exact; b split into bf16 limbs."""
    if not _EXACT_SIDE_LIMBS:
        return jax.lax.dot_general(a_exact, b, dims,
                                   preferred_element_type=jnp.float32,
                                   precision=_PREC)
    a_bf = a_exact.astype(jnp.bfloat16)
    acc = None
    for lb in _limbs(b):
        p = jax.lax.dot_general(a_bf, lb, dims,
                                preferred_element_type=jnp.float32)
        acc = p if acc is None else acc + p
    return acc


def _mm_exact_rhs(a, b_exact, dims=(((1,), (0,)), ((), ()))):
    """a @ b_exact where b_exact is bf16-exact; a split into bf16 limbs."""
    if not _EXACT_SIDE_LIMBS:
        return jax.lax.dot_general(a, b_exact, dims,
                                   preferred_element_type=jnp.float32,
                                   precision=_PREC)
    b_bf = b_exact.astype(jnp.bfloat16)
    acc = None
    for la in _limbs(a):
        p = jax.lax.dot_general(la, b_bf, dims,
                                preferred_element_type=jnp.float32)
        acc = p if acc is None else acc + p
    return acc

CHUNK = 128        # instances per lane scan (lanes)
SUBS = 4           # 128-lane sub-chunks processed per grid step: amortizes
                   # the fixed per-grid-step cost (DMA orchestration, grid
                   # bookkeeping) 4x; the scans stay 128 wide so the MXU
                   # cumsum cost stays linear in the stream length
STEP = CHUNK * SUBS  # instances per grid step
FIELD_ROWS = 16    # struct rows: 10 used + 6 pad (sublane tiling multiple)
TILE_ROW = 9       # row index of the per-instance tile id (as f32)
RING = 8           # forward output staging ring depth


def _col(shape=(1, CHUNK)):
    return jax.lax.broadcasted_iota(jnp.int32, shape, 1)


def _seg_start_lane(t_ids):
    """(1, C) lane index of each lane's segment start (0 for the first).

    A 7-step max-scan over a single (1, C) i32 row — negligible next to the
    (P, C) math it steers.
    """
    col = _col()
    b = (col > 0) & (t_ids != pltpu.roll(t_ids, 1, axis=1))
    x = jnp.where(b, col, 0)
    step = 1
    while step < CHUNK:
        x = jnp.maximum(x, jnp.where(col >= step,
                                     pltpu.roll(x, step, axis=1), 0))
        step *= 2
    return x


def _tri():
    """(C, C) upper-triangular ones: cumsum along lanes as ONE MXU matmul
    instead of a log2(C)-step shifted-add scan over the full (P, C) tile."""
    ri = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 1)
    return (ri <= ci).astype(jnp.float32)


def _seg_cumsum_mxu(x, seg0, exclusive):
    """Segmented cumulative sum along lanes via MXU + one lane gather.

    x: (P, C); seg0: (1, C) per-lane segment start. cumsum(x) on the MXU,
    then subtract each lane's prefix at its segment start (gathered along
    lanes — Mosaic supports lane-axis take_along_axis).
    """
    full = _mm_exact_rhs(x, _tri())   # 0/1 matrix: bf16-exact rhs
    idx = jnp.maximum(seg0 - 1, 0)
    prev = jnp.take_along_axis(full, jnp.broadcast_to(idx, x.shape), axis=1)
    prev = jnp.where(seg0 > 0, prev, 0.0)
    out = full - prev
    return out - x if exclusive else out


# alpha clamp keeping log1p finite; exp(-16.6) ~ 6e-8 is far below any
# transmittance threshold, so semantics are unchanged
_ALPHA_LOG_MAX = 1.0 - 6e-8


def _basis(n_pix, tw, th):
    """(P, 8) constant tile-local pixel basis [lx², lx, ly², ly, lx·ly, 1,
    0, 0] (lx/ly are pixel centers within a tile). Every entry is a
    half-integer product with <= 8 significant bits — exactly
    representable in bf16 (the exact-side limb matmuls rely on this).

    The per-(pixel, instance) Gaussian power is a quadratic form in tile-
    local coordinates, so it factors into basis @ per-instance coefficients
    — ONE small MXU matmul per chunk instead of ~8 VPU ops on the full
    (P, C) tile. The same basis contracted against the backward's helper
    field yields all five second-moment reductions as one matmul.
    """
    p = jax.lax.broadcasted_iota(jnp.int32, (n_pix, 1), 0)
    # tile-CENTER origin halves |coordinate| ranges vs a corner origin,
    # which halves the cancellation error of the expanded quadratic form
    lx = (p % tw).astype(jnp.float32) + 0.5 - 0.5 * tw
    ly = (p // tw).astype(jnp.float32) + 0.5 - 0.5 * th
    one = jnp.ones_like(lx)
    zero = jnp.zeros_like(lx)
    return jnp.concatenate(
        [lx * lx, lx, ly * ly, ly, lx * ly, one, zero, zero], axis=1)


def _power_coeffs(fields, t_ids, statics: BlendStatics):
    """Per-lane quadratic-form coefficients (8, C) + tile-local means.

    power(p, c) = -0.5·(mean - pixel)ᵀ conic (mean - pixel) expanded in the
    tile-local basis; numerically safe because the contribution test bounds
    |power| at accepted tiles, which bounds every expanded term.
    """
    tw, th = statics.tile_width, statics.tile_height
    tx = (t_ids % statics.grid_width).astype(jnp.float32)      # (1, C)
    ty = (t_ids // statics.grid_width).astype(jnp.float32)
    mxl = fields[0:1] - (tx + 0.5) * tw                                # tile-local
    myl = fields[1:2] - (ty + 0.5) * th
    ca, cb, cc = fields[2:3], fields[3:4], fields[4:5]
    zero = jnp.zeros_like(ca)
    k = jnp.concatenate([
        -0.5 * ca,                                             # lx²
        ca * mxl + cb * myl,                                   # lx
        -0.5 * cc,                                             # ly²
        cc * myl + cb * mxl,                                   # ly
        -cb,                                                   # lx·ly
        -0.5 * (ca * mxl * mxl + cc * myl * myl) - cb * mxl * myl,  # 1
        zero, zero], axis=0)                                   # (8, C)
    return k, mxl, myl


def _mm(a, b):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=_PREC)


def _basis_is_exact(statics) -> bool:
    # half-integer basis products stay <= 8 significant bits only for
    # tiles up to 16x16 (|l| <= 7.5 -> odd products <= 225 < 256)
    return statics.tile_width <= 16 and statics.tile_height <= 16


def _mm_basis(basis, coeffs, statics):
    """power = basis @ coeffs with the exact-side limb fast path."""
    if _basis_is_exact(statics):
        return _mm_exact_lhs(basis, coeffs)
    return _mm(basis, coeffs)


def _alpha_eff_from_power(power, op, statics: BlendStatics):
    """(P, C) power → effective alpha (kernels_forward.cuh:431-446)."""
    gauss = jnp.exp(jnp.minimum(power, 0.0))
    alpha = op * gauss
    if statics.original_opacity_interpretation:
        ok = alpha >= statics.min_alpha_threshold
    else:
        ok = gauss >= statics.min_alpha_threshold
    return jnp.where(ok, alpha, 0.0)


def _extract_at_lane(x, pos):
    """(P, C) → (P, 1): column `pos` (traced scalar) via masked sum."""
    return jnp.sum(jnp.where(_col() == pos, x, 0.0), axis=1, keepdims=True)


def _live_trans_max(trans, tile, statics: BlendStatics):
    """Max transmittance over the IN-IMAGE pixels of `tile` (traced scalar).

    Drives the per-tile done flag. Pixels outside the image never receive
    alpha, so without masking they pin T at 1 and edge tiles never
    early-terminate; their outputs are discarded by tiles_to_image and their
    cotangents are zero, so ignoring them is exact.
    """
    if not statics.image_width or not statics.image_height:
        return jnp.max(trans)
    tw, th = statics.tile_width, statics.tile_height
    n_pix = tw * th
    tx = jax.lax.rem(tile, statics.grid_width)
    ty = jax.lax.div(tile, statics.grid_width)
    pix = jax.lax.broadcasted_iota(jnp.int32, (n_pix, 1), 0)
    lx = jax.lax.rem(pix, tw)
    ly = jax.lax.div(pix, tw)
    inside = ((tx * tw + lx < statics.image_width)
              & (ty * th + ly < statics.image_height))
    return jnp.max(jnp.where(inside, trans, 0.0))


class _FieldRows:
    """Single-row slicing over separate per-row refs.

    Mirrors `packed[(r, r+1)]` row access on a (16, C) block so the kernel
    math is layout-agnostic: when the stream arrives as 10 separate sorted
    columns (the sort outputs — see tiles.build_tile_instances_stream),
    no (16, I) stack is ever materialized in HBM.
    """

    def __init__(self, rows):
        self._rows = rows

    def __getitem__(self, sl):
        assert isinstance(sl, slice) and sl.stop == sl.start + 1, sl
        return self._rows[sl.start]


def _as_rows10(packed):
    """Normalizes the stream input: a (16, I) array or a tuple/list of 10+
    (I,) f32 columns -> list of 10 (1, I) arrays (rows 10-15 are padding
    and never read by the kernels)."""
    if isinstance(packed, (tuple, list)):
        return [r.reshape(1, -1) for r in packed[:10]]
    return [packed[r:r + 1] for r in range(10)]


def _n_inst(packed):
    if isinstance(packed, (tuple, list)):
        return packed[0].shape[-1]
    return packed.shape[1]


# --------------------------------------------------------------------- #
# forward
# --------------------------------------------------------------------- #

def _fwd_kernel(*refs, statics: BlendStatics, n_steps: int,
                inference: bool = False):
    row_refs = refs[:10]
    out_hbm, stage, state, smem, sems = refs[10:]
    """One grid step = SUBS sequential 128-instance sub-chunks of the
    tile-sorted stream.

    smem: [0] tile in progress (-1 before first), [1] ring head, [2] done
    flag (all pixels of the in-progress tile below the transmittance
    threshold, or the sentinel region reached).
    state: (P, 4) VMEM — accumulated color (ch 0-2) and transmittance (ch 3)
    of the in-progress tile.
    stage: (RING, P, 4) output staging ring; sems: per-slot DMA semaphores.

    inference=True is the render-only mode (the analog of the reference's
    dedicated no-saved-state pipeline, inference.cu:11-221): the sticky
    frozen-transmittance bookkeeping that exists only for gradient parity
    is dropped. Scans stay at HIGHEST precision: running them at DEFAULT
    (one-pass bf16) was measured at only ~4% fps (the render is
    binning+VPU-bound, and the MXU overlaps) while costing 9.3e-3 max
    image error on deep blends (> 2/255) — rejected; see PLAN.md round 3.
    """
    k = pl.program_id(0)
    n_pix = statics.tile_width * statics.tile_height
    n_tiles = statics.grid_width * statics.grid_height
    thresh = statics.transmittance_threshold

    init_state = jnp.concatenate(
        [jnp.zeros((n_pix, 3), jnp.float32),
         jnp.ones((n_pix, 1), jnp.float32)], axis=1)

    @pl.when(k == 0)
    def _():
        smem[0] = -1
        smem[1] = 0
        smem[2] = 0
        state[:] = init_state

    def flush(pred, tile_idx, block, head):
        """If pred: stages `block` (P, 4) and DMAs it to out_hbm[tile_idx]."""
        slot = jax.lax.rem(head, RING)

        @pl.when(pred)
        def _():
            @pl.when(head >= RING)
            def _():
                pltpu.make_async_copy(stage.at[slot], out_hbm.at[tile_idx],
                                      sems.at[slot]).wait()

            stage[slot] = block
            pltpu.make_async_copy(stage.at[slot], out_hbm.at[tile_idx],
                                  sems.at[slot]).start()

        return head + pred.astype(jnp.int32)

    empty_block = jnp.concatenate(
        [jnp.zeros((3, n_pix), jnp.float32),
         jnp.ones((1, n_pix), jnp.float32)], axis=0)        # (4, P)

    def flush_empties(cur, upto, head):
        """Writes init blocks for empty tiles (cur, upto) exclusive."""
        def cond(s):
            c, _ = s
            return c + 1 < jnp.minimum(upto, n_tiles)

        def body(s):
            c, h = s
            h = flush(jnp.bool_(True), c + 1, empty_block, h)
            return c + 1, h

        _, head = jax.lax.while_loop(cond, body, (cur, head))
        return head

    for sub in range(SUBS):
        fields = _FieldRows(tuple(
            r[0:1, sub * CHUNK:(sub + 1) * CHUNK] for r in row_refs))
        t_ids = fields[TILE_ROW:TILE_ROW + 1].astype(jnp.int32)
        cur0 = smem[0]
        done0 = smem[2]
        col = _col()
        prev_t = pltpu.roll(t_ids, 1, axis=1)
        is0 = col == 0
        bmask = (is0 & (t_ids != cur0)) | (~is0 & (t_ids != prev_t))
        n_bound = jnp.sum(bmask.astype(jnp.int32))
        heavy = (n_bound > 0) | (done0 == 0)

        @pl.when(heavy)
        def _(fields=fields, t_ids=t_ids, cur0=cur0, col=col, bmask=bmask,
              n_bound=n_bound):
            coeffs, _, _ = _power_coeffs(fields, t_ids, statics)
            power = _mm_basis(_basis(n_pix, statics.tile_width,
                                      statics.tile_height), coeffs,
                              statics)                         # (P, C)
            alpha_eff = _alpha_eff_from_power(power, fields[5:6], statics)
            one_minus = 1.0 - alpha_eff
            seg0 = _seg_start_lane(t_ids)
            logs = jnp.log1p(-jnp.minimum(alpha_eff, _ALPHA_LOG_MAX))
            excl = jnp.exp(_seg_cumsum_mxu(logs, seg0, exclusive=True))
            state_v = state[:]                                 # (P, 4)
            trans_carry = state_v[:, 3:4]                      # (P, 1)
            base = jnp.where(t_ids == cur0, trans_carry, 1.0)  # (P, C)
            t_before = base * excl
            used = t_before >= thresh
            w = jnp.where(used, t_before * alpha_eff, 0.0)
            if statics.clamp_colors:                           # clamp fwd:415
                c3 = jnp.concatenate([jnp.maximum(fields[6:7], 0.0),
                                      jnp.maximum(fields[7:8], 0.0),
                                      jnp.maximum(fields[8:9], 0.0)], axis=0)
            else:                                              # pruning: raw
                c3 = jnp.concatenate([fields[6:7], fields[7:8],
                                      fields[8:9]], axis=0)    # (3, C)
            t_after = t_before * one_minus
            frozen_cand = jnp.where(t_before < thresh, t_before, -1.0)

            def seg_acc(mask):
                """(1, C) lane mask → (P, 3) color sums over those lanes.

                One MXU matmul (contract lanes against the color rows)
                replaces three per-channel multiplies + masked reductions
                over the full (P, C) tile."""
                wm = jnp.where(mask, w, 0.0)
                return jax.lax.dot_general(
                    wm, c3, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=_PREC)

            def seg_final_t(mask, end_pos, empty):
                """Final transmittance of a segment ending at lane end_pos."""
                t_end = _extract_at_lane(t_after, end_pos)
                if inference:
                    # no sticky freeze: past the threshold crossing T only
                    # keeps shrinking below 1e-4 — composite difference is
                    # bounded by the threshold itself
                    unfrozen = t_end
                else:
                    fr = jnp.max(jnp.where(mask, frozen_cand, -1.0), axis=1,
                                 keepdims=True)                # (P, 1)
                    unfrozen = jnp.where(fr >= 0.0, fr, t_end)
                return jnp.where(empty, state[:][:, 3:4], unfrozen)

            # ---- serial pass over tile boundaries: finalize tiles ----
            def cond(s):
                i, *_ = s
                return i < n_bound

            def body(s):
                i, cur, seg_start, search_from, head = s
                pos = jnp.min(jnp.where(bmask & (col >= search_from), col,
                                        CHUNK))
                tn = jnp.max(jnp.where(col == pos, t_ids, -1))
                seg_mask = (col >= seg_start) & (col < pos)
                empty = pos == seg_start

                # finalize tile `cur` (if one is in progress)
                acc_fin = state[:][:, 0:3] + seg_acc(seg_mask)
                t_fin = seg_final_t(seg_mask, pos - 1, empty)
                block = jnp.concatenate([acc_fin, t_fin], axis=1).T  # (4, P)
                head = flush(cur >= 0, cur, block, head)
                head = flush_empties(cur, tn, head)
                # reset in-progress state for the new tile
                state[:] = init_state
                return i + 1, tn, pos, pos + 1, head

            i0 = (jnp.int32(0), cur0, jnp.int32(0), jnp.int32(0), smem[1])
            _, cur, seg_start, _, head = jax.lax.while_loop(cond, body, i0)

            # ---- fold the trailing (in-progress) segment into the carry --
            tail_mask = col >= seg_start
            new_acc = state[:][:, 0:3] + seg_acc(tail_mask)
            new_trans = seg_final_t(tail_mask, jnp.int32(CHUNK - 1),
                                    jnp.bool_(False))
            state[:] = jnp.concatenate([new_acc, new_trans], axis=1)
            smem[0] = cur
            smem[1] = head
            done = ((_live_trans_max(new_trans, cur, statics) < thresh)
                    | (cur >= n_tiles))
            smem[2] = done.astype(jnp.int32)

    # ---- last step: flush the in-progress tile, trailing empties, DMAs ---
    @pl.when(k == n_steps - 1)
    def _():
        cur = smem[0]
        head = smem[1]
        block = state[:].T                                     # (4, P)
        head = flush((cur >= 0) & (cur < n_tiles), cur, block, head)
        head = flush_empties(cur, jnp.int32(n_tiles), head)
        smem[1] = head
        for s in range(RING):
            @pl.when(head > s)
            def _(s=s):
                pltpu.make_async_copy(stage.at[s], out_hbm.at[0],
                                      sems.at[s]).wait()


def blend_stream_forward(packed_t, statics: BlendStatics, interpret=None,
                         inference: bool = False):
    """packed_t: (16, I) transposed struct-of-fields (row 9 = tile id) OR a
    tuple of 10 (I,) f32 columns (rows 0-8 fields, 9 tile id) — the sort
    outputs feed the kernel directly, no stacked layout in HBM.
    Returns (T, P, 4): channels 0-2 color accumulator, 3 transmittance.

    inference=True: render-only variant (reference inference.cu:11-221) —
    no frozen-transmittance bookkeeping (see _fwd_kernel); NOT suitable
    under jax.grad (no custom_vjp pairs with it).
    """
    n_tiles = statics.grid_width * statics.grid_height
    n_pix = statics.tile_width * statics.tile_height
    rows10 = _as_rows10(packed_t)
    n_inst = rows10[0].shape[1]
    assert n_inst % STEP == 0, 'instance capacity must be STEP-aligned'
    n_steps = n_inst // STEP
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    row_spec = pl.BlockSpec((1, STEP), lambda k: (0, k),
                            memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_steps,),
        in_specs=[row_spec] * 10,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((RING, 4, n_pix), jnp.float32),
            pltpu.VMEM((n_pix, 4), jnp.float32),
            pltpu.SMEM((4,), jnp.int32),
            pltpu.SemaphoreType.DMA((RING,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_fwd_kernel, statics=statics, n_steps=n_steps,
                          inference=inference),
        out_shape=jax.ShapeDtypeStruct((n_tiles, 4, n_pix), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(*rows10)


# --------------------------------------------------------------------- #
# backward
# --------------------------------------------------------------------- #

def _bwd_kernel(ft_ref, lt_ref, *refs, statics: BlendStatics,
                score_cfg=None):
    row_refs = refs[:10]
    aux_fs = refs[10:10 + SUBS]
    aux_ls = refs[10 + SUBS:10 + 2 * SUBS]
    aux_hbm = refs[10 + 2 * SUBS]
    g_blk, state, mid, smem, mid_sems = refs[11 + 2 * SUBS:]
    """Backward chunk step.

    Per-tile quantities arrive through ONE XLA-built aux table (T, 8, P):
    sublane channels [ga_r, ga_g, ga_b, r0, common, pad] — r0 and common
    are precomputed outside the kernel, and one table halves the DMA
    streams vs separate fin/g_fin blocks. (Channels must ride sublanes:
    an 8-wide lane dimension cannot be sliced out of HBM — Mosaic needs
    the last dim 128-aligned.) Two auto-pipelined (1, 8, P) blocks are
    keyed by the chunk's first and last tile (prefetched scalars); the
    rare tiles fully interior to a chunk are fetched synchronously from
    HBM (`mid`).

    state: (P, 4) VMEM — ch 0 = residual-grad carry r, ch 1 = transmittance
    carry of the in-progress tile. smem: [0] = tile in progress, [1] done.
    """
    k = pl.program_id(0)
    n_pix = statics.tile_width * statics.tile_height
    n_tiles = statics.grid_width * statics.grid_height
    thresh = statics.transmittance_threshold
    guard_eps = statics.one_minus_alpha_eps

    @pl.when(k == 0)
    def _():
        smem[0] = -1
        smem[1] = 0
        state[:] = jnp.zeros((n_pix, 4), jnp.float32)
        # the middle-segment patches ACCUMULATE masked expansions of `mid`;
        # uninitialized VMEM may hold NaN bitpatterns and 0·NaN = NaN, so
        # zero it before the first (possibly skipped) fetch
        mid[:] = jnp.zeros((8, n_pix), jnp.float32)

    for sub in range(SUBS):
        _bwd_subchunk(k, sub, ft_ref, lt_ref, row_refs, aux_fs[sub],
                      aux_ls[sub], aux_hbm, g_blk, state, mid, smem, mid_sems,
                      statics, n_pix, n_tiles, thresh, guard_eps, score_cfg)


def _bwd_grad_rows(g_blk, sub, fields, basis, mxl, myl, alpha_eff, d_alpha,
                   op, gcol_r, gcol_g, gcol_b, craw_r, craw_g, craw_b,
                   basis_exact=False):
    """Writes the nine per-instance gradient rows for one sub-chunk.

    Helper-field moments against the tile-local basis: all five second-
    moment reductions (dL/d{conic, mean2d}) in ONE matmul (the per-pixel
    dx/dy tensors never materialize). gcol_*: (1, C) per-instance color
    cotangent rows (Σ_p w·ga), already reduced on the MXU by the caller."""
    helper = -alpha_eff * d_alpha
    dims_t = (((0,), (0,)), ((), ()))
    if basis_exact:
        mom = _mm_exact_lhs(basis, helper, dims=dims_t)
    else:
        mom = jax.lax.dot_general(basis, helper, dims_t,
                                  preferred_element_type=jnp.float32,
                                  precision=_PREC)
    m_lx2, m_lx = mom[0:1], mom[1:2]                       # Σh·lx², Σh·lx
    m_ly2, m_ly = mom[2:3], mom[3:4]
    m_lxy, m0 = mom[4:5], mom[5:6]
    hdx = mxl * m0 - m_lx                                  # Σ h·dx
    hdy = myl * m0 - m_ly
    gc_a = 0.5 * (mxl * mxl * m0 - 2.0 * mxl * m_lx + m_lx2)
    gc_b = mxl * myl * m0 - mxl * m_ly - myl * m_lx + m_lxy
    gc_c = 0.5 * (myl * myl * m0 - 2.0 * myl * m_ly + m_ly2)
    ca, cb, cc = fields[2:3], fields[3:4], fields[4:5]
    gm_x = ca * hdx + cb * hdy
    gm_y = cb * hdx + cc * hdy
    # Σ gauss·dα == -Σ h / opacity (h vanishes wherever alpha_eff does)
    g_op = -m0 / jnp.maximum(op, 1e-20)
    gcol_r = jnp.where(craw_r >= 0.0, gcol_r, 0.0)         # clamp bwd:314-318
    gcol_g = jnp.where(craw_g >= 0.0, gcol_g, 0.0)
    gcol_b = jnp.where(craw_b >= 0.0, gcol_b, 0.0)
    pad = jnp.zeros((FIELD_ROWS - 9, CHUNK), jnp.float32)
    g_blk[:, sub * CHUNK:(sub + 1) * CHUNK] = jnp.concatenate(
        [gm_x, gm_y, gc_a, gc_b, gc_c, g_op,
         gcol_r, gcol_g, gcol_b, pad], axis=0)


def _bwd_subchunk(k, sub, ft_ref, lt_ref, row_refs, aux_f, aux_l, aux_hbm,
                  g_blk, state, mid, smem, mid_sems, statics, n_pix, n_tiles,
                  thresh, guard_eps, score_cfg=None):
    """score_cfg=(width, height): Speedy-Splat scoring mode — the per-tile
    color cotangent is identically (1,1,1) (so cg is the per-instance RAW
    color sum), and the output row is op^2 * sum_pixels(d_alpha^2) over
    real image pixels (kernels_pruning_scores.cuh:349-473) instead of the
    nine gradient rows."""
    fields = _FieldRows(tuple(
        r[0:1, sub * CHUNK:(sub + 1) * CHUNK] for r in row_refs))
    t_ids = fields[TILE_ROW:TILE_ROW + 1].astype(jnp.int32)
    cur0 = smem[0]
    done0 = smem[1]
    col = _col()
    prev_t = pltpu.roll(t_ids, 1, axis=1)
    is0 = col == 0
    bmask = (is0 & (t_ids != cur0)) | (~is0 & (t_ids != prev_t))
    n_bound = jnp.sum(bmask.astype(jnp.int32))
    heavy = (n_bound > 0) | (done0 == 0)

    @pl.when(jnp.logical_not(heavy))
    def _():
        g_blk[:, sub * CHUNK:(sub + 1) * CHUNK] = jnp.zeros(
            (FIELD_ROWS, CHUNK), jnp.float32)

    @pl.when(heavy)
    def _():
        ft = ft_ref[SUBS * k + sub]
        lt = lt_ref[SUBS * k + sub]

        aux_f0 = aux_f[0]                                      # (8, P)
        aux_l0 = aux_l[0]

        m_f = t_ids == ft                                      # (1, C)
        # exclude the first-keyed tile so rank-6 expansions never double-
        # count a single-tile chunk (ft == lt)
        m_l = (t_ids == lt) & (lt != ft)
        m_c = t_ids == cur0

        def outer(rows_kp, cols_kc):
            """(K, P) × (K, C) → (P, C) rank-K expansion on the MXU."""
            return jax.lax.dot_general(
                rows_kp, cols_kc, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=_PREC)

        # ---- vectorized blend recomputation over the whole chunk ----
        basis = _basis(n_pix, statics.tile_width, statics.tile_height)
        coeffs, mxl, myl = _power_coeffs(fields, t_ids, statics)
        power = _mm_basis(basis, coeffs, statics)              # (P, C)
        op = fields[5:6]
        alpha_eff = _alpha_eff_from_power(power, op, statics)
        one_minus = 1.0 - alpha_eff
        seg0 = _seg_start_lane(t_ids)
        logs = jnp.log1p(-jnp.minimum(alpha_eff, _ALPHA_LOG_MAX))
        excl = jnp.exp(_seg_cumsum_mxu(logs, seg0, exclusive=True))
        state_v = state[:]
        t_base = jnp.where(m_c, state_v[:, 1:2], 1.0)
        t_before = t_base * excl
        used = t_before >= thresh
        w = jnp.where(used, t_before * alpha_eff, 0.0)

        craw_r, craw_g, craw_b = fields[6:7], fields[7:8], fields[8:9]
        if statics.clamp_colors:
            cl_r = jnp.maximum(craw_r, 0.0)
            cl_g = jnp.maximum(craw_g, 0.0)
            cl_b = jnp.maximum(craw_b, 0.0)
        else:                                  # pruning scores: raw colors
            cl_r, cl_g, cl_b = craw_r, craw_g, craw_b

        # Per-lane tile vectors as rank-6 MXU expansions over the two
        # resident aux blocks — replaces five (P, C) where-chains plus the
        # per-channel cg/gcol products/reductions with three matmuls:
        #   cg[p, c]  = Σ_ch cl_ch[c]·ga_ch[tile(c), p]   (color cotangent)
        #   cv[p, c]  = common[tile(c), p] − r0[tile(c), p]
        #   W6[k, c]  = Σ_p w[p, c]·ga_k[p]               (gcol rows)
        ga6 = jnp.concatenate([aux_f0[0:3], aux_l0[0:3]], axis=0)   # (6, P)
        cl6 = jnp.concatenate(
            [jnp.where(m, cl, 0.0) for m in (m_f, m_l)
             for cl in (cl_r, cl_g, cl_b)], axis=0)                 # (6, C)
        cg = outer(ga6, cl6)                                        # (P, C)
        cv2 = jnp.concatenate([aux_f0[4:5] - aux_f0[3:4],
                               aux_l0[4:5] - aux_l0[3:4]], axis=0)  # (2, P)
        # build the f32 mask rows via select, NOT .astype: Mosaic rejects
        # bool-vector casts (bitcast_vreg i1 -> i32) — the round-2 regression
        m2 = jnp.concatenate([jnp.where(m_f, 1.0, 0.0),
                              jnp.where(m_l, 1.0, 0.0)], axis=0)
        cv_rb = outer(cv2, m2)                    # common − r0, per lane
        w6 = jax.lax.dot_general(ga6, w, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32,
                                 precision=_PREC)

        # ---- rare middle segments: tiles strictly inside the chunk ----
        # (a tile both starting AND ending within this chunk, other than
        # the first/last-keyed resident blocks — fetched synchronously from
        # HBM and ACCUMULATED through the same expansions; masked rows keep
        # every term zero when is_mid is false)
        first_bound = jnp.sum((bmask & (col == 0)).astype(jnp.int32))
        n_segs = n_bound + 1 - first_bound
        has_middle = n_segs > 2

        def body2(s):
            i, search_from, cg, cv_rb, w3 = s
            pos = jnp.min(jnp.where(bmask & (col >= search_from), col,
                                    CHUNK))
            tn = jnp.max(jnp.where(col == pos, t_ids, -1))
            is_mid = (tn != ft) & (tn != lt) & (tn < n_tiles)

            @pl.when(is_mid)
            def _():
                tc = jnp.minimum(tn, n_tiles - 1)
                cp = pltpu.make_async_copy(aux_hbm.at[tc], mid, mid_sems)
                cp.start()
                cp.wait()

            mm = (t_ids == tn) & is_mid
            mmf = jnp.where(mm, 1.0, 0.0)      # no i1-vector cast (Mosaic)
            mid_v = mid[:]
            ga_m = mid_v[0:3]                                  # (3, P)
            cl3m = jnp.concatenate(
                [jnp.where(mm, cl, 0.0) for cl in (cl_r, cl_g, cl_b)],
                axis=0)
            cg = cg + outer(ga_m, cl3m)
            cv_rb = cv_rb + outer(mid_v[4:5] - mid_v[3:4], mmf)
            wm = jnp.where(mm, w, 0.0)
            w3 = w3 + jax.lax.dot_general(
                ga_m, wm, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=_PREC)
            return i + 1, pos + 1, cg, cv_rb, w3

        # materialized zero (0·matmul-result): a splat-layout while carry
        # trips Mosaic (see PLAN.md round-2 finding 4)
        s0 = (jnp.int32(0), jnp.int32(0), cg, cv_rb, 0.0 * w6[0:3])
        out = jax.lax.while_loop(
            lambda s: (s[0] < n_bound) & has_middle, body2, s0)
        cg, cv_rb, w3_mid = out[2], out[3], out[4]

        # gcol rows: select the owning tile's Σ_p w·ga row per lane
        gcol_r = (jnp.where(m_f, w6[0:1], 0.0)
                  + jnp.where(m_l, w6[3:4], 0.0) + w3_mid[0:1])
        gcol_g = (jnp.where(m_f, w6[1:2], 0.0)
                  + jnp.where(m_l, w6[4:5], 0.0) + w3_mid[1:2])
        gcol_b = (jnp.where(m_f, w6[2:3], 0.0)
                  + jnp.where(m_l, w6[5:6], 0.0) + w3_mid[2:3])

        # in-progress-tile lanes: common − r_base uses the CARRIED r, not r0
        common_f_col = aux_f0[4:5].T                           # (P, 1)
        cv_rb = jnp.where(m_c, common_f_col - state_v[:, 0:1], cv_rb)

        u = w * cg
        u_csum = _seg_cumsum_mxu(u, seg0, exclusive=False)
        guard = 1.0 / jnp.maximum(one_minus, guard_eps)
        # common − (r_base − u_csum), reassociated as (common − r_base) +
        # u_csum so r_base never materializes per lane
        d_alpha = t_before * cg + (cv_rb + u_csum) * guard
        # sentinel-tile lanes (t_ids == n_tiles) can carry REAL fields when
        # an upstream band filter masked their tile (tile_row_band) — their
        # gradient must not leak into this device's reduction
        valid_lane = t_ids < n_tiles
        d_alpha = jnp.where(valid_lane & used & (alpha_eff > 0.0),
                            d_alpha, 0.0)

        def psum(x):
            return jnp.sum(x, axis=0, keepdims=True)           # (1, C)

        if score_cfg is not None:
            # Speedy-Splat scoring: out row 0 = op^2 * sum_p d_alpha^2 over
            # real image pixels (kernels_pruning_scores.cuh:444-458); rows
            # 1.. stay zero. The per-pixel blend state still advances below.
            width, height = score_cfg
            tw, th = statics.tile_width, statics.tile_height
            tx = (t_ids % statics.grid_width).astype(jnp.float32)
            ty = (t_ids // statics.grid_width).astype(jnp.float32)
            pix = jax.lax.broadcasted_iota(jnp.int32, (n_pix, 1), 0)
            lx = (pix % tw).astype(jnp.float32)
            ly = (pix // tw).astype(jnp.float32)
            inside = ((tx * tw + lx < float(width))
                      & (ty * th + ly < float(height)))        # (P, C)
            da = jnp.where(inside, d_alpha, 0.0)
            score = op * op * psum(da * da)
            g_blk[0:1, sub * CHUNK:(sub + 1) * CHUNK] = score
            g_blk[1:, sub * CHUNK:(sub + 1) * CHUNK] = jnp.zeros(
                (FIELD_ROWS - 1, CHUNK), jnp.float32)
        else:
            _bwd_grad_rows(g_blk, sub, fields, basis, mxl, myl,
                           alpha_eff, d_alpha, op,
                           gcol_r, gcol_g, gcol_b,
                           craw_r, craw_g, craw_b,
                           basis_exact=_basis_is_exact(statics))

        # ---- carry update for the trailing segment ----
        ls = jnp.max(jnp.where(bmask, col, 0))                 # last seg start
        tail = col >= ls
        t_after = t_before * one_minus
        fr = jnp.max(jnp.where(tail & (t_before < thresh), t_before, -1.0),
                     axis=1, keepdims=True)
        new_trans = jnp.where(fr >= 0.0, fr, t_after[:, CHUNK - 1:CHUNK])
        # trailing r carry = r_base(last tile) − u_csum at the last lane;
        # the last tile's r0 sits in the last-keyed aux block (lanes of a
        # sentinel tail only ever feed more sentinels, so the clamped
        # aux_l0 row is safe there)
        cur = jnp.max(t_ids)                                   # last lane tile
        r_base_last = jnp.where(cur == cur0, state_v[:, 0:1],
                                aux_l0[3:4].T)                 # (P, 1)
        r_last = r_base_last - u_csum[:, CHUNK - 1:CHUNK]
        state[:] = jnp.concatenate(
            [r_last, new_trans,
             jnp.zeros((n_pix, 2), jnp.float32)], axis=1)
        smem[0] = cur
        done = ((_live_trans_max(new_trans, cur, statics) < thresh)
                | (cur >= n_tiles))
        smem[1] = done.astype(jnp.int32)


def build_tile_aux(fin, g_fin):
    """Precomputes the per-tile backward quantities, pixel-major.

    fin, g_fin: (T, 4, P) kernel-layout final state and its cotangent.
    Returns (T, 8, P): sublane channels [ga_r, ga_g, ga_b, r0, common,
    pad x3] where r0 = <final color, color cotangent> and common =
    -T_final * g_T (the reference's accumulated-grad initialization,
    kernels_backward.cuh:300-331).
    """
    ga = g_fin[:, 0:3, :]                                      # (T, 3, P)
    r0 = jnp.sum(fin[:, 0:3, :] * g_fin[:, 0:3, :], axis=1)    # (T, P)
    common = -fin[:, 3, :] * g_fin[:, 3, :]
    n_tiles, n_pix = r0.shape
    return jnp.concatenate(
        [ga, r0[:, None, :], common[:, None, :],
         jnp.zeros((n_tiles, 3, n_pix), jnp.float32)], axis=1)


def blend_stream_backward(packed_t, first_tile, last_tile, fin, g_fin,
                          statics: BlendStatics, interpret=None,
                          score_cfg=None):
    """Returns per-instance gradient rows (16, I) in the stream layout
    (score_cfg=(width, height): row 0 = Speedy-Splat scores instead)."""
    n_pix = statics.tile_width * statics.tile_height
    rows10 = _as_rows10(packed_t)
    n_inst = rows10[0].shape[1]
    assert n_inst % STEP == 0, 'instance capacity must be STEP-aligned'
    n_steps = n_inst // STEP
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    aux = build_tile_aux(fin, g_fin)

    def spec_f(sub):
        return pl.BlockSpec((1, 8, n_pix),
                            lambda k, ft, lt, sub=sub: (ft[SUBS * k + sub],
                                                        0, 0),
                            memory_space=pltpu.VMEM)

    def spec_l(sub):
        return pl.BlockSpec((1, 8, n_pix),
                            lambda k, ft, lt, sub=sub: (lt[SUBS * k + sub],
                                                        0, 0),
                            memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_steps,),
        in_specs=[
            *[pl.BlockSpec((1, STEP), lambda k, ft, lt: (0, k),
                           memory_space=pltpu.VMEM)] * 10,     # stream rows
            *[spec_f(s) for s in range(SUBS)],                 # aux @ firsts
            *[spec_l(s) for s in range(SUBS)],                 # aux @ lasts
            pl.BlockSpec(memory_space=pl.ANY),                 # aux (HBM)
        ],
        out_specs=pl.BlockSpec((FIELD_ROWS, STEP), lambda k, ft, lt: (0, k),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((n_pix, 4), jnp.float32),
            pltpu.VMEM((8, n_pix), jnp.float32),
            pltpu.SMEM((2,), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    return pl.pallas_call(
        functools.partial(_bwd_kernel, statics=statics, score_cfg=score_cfg),
        out_shape=jax.ShapeDtypeStruct((FIELD_ROWS, n_inst), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(first_tile, last_tile, *rows10, *([aux] * (2 * SUBS + 1)))


def blend_stream_pruning_scores(packed_t, first_tile, last_tile,
                                statics: BlendStatics, bg_sum,
                                width: int, height: int, interpret=None):
    """Per-instance Speedy-Splat pruning scores (I,) via the stream kernels.

    Pass 1: forward blend with RAW (unclamped) colors. Pass 2: the backward
    sweep in score mode with the crafted cotangent g_fin = [1, 1, 1, Σbg]
    — build_tile_aux then yields exactly the reference's initialization
    (r0 = Σ_ch color_after, common = -T_final·Σbg,
    kernels_pruning_scores.cuh:407-418) and each instance's output row is
    opacity² · Σ_pixels dL/dα² over real image pixels.
    """
    s2 = statics._replace(clamp_colors=False)
    fin = blend_stream_forward(packed_t, s2, interpret=interpret)
    n_tiles, _, n_pix = fin.shape
    g_fin = jnp.concatenate([
        jnp.ones((n_tiles, 3, n_pix), jnp.float32),
        jnp.broadcast_to(jnp.asarray(bg_sum, jnp.float32),
                         (n_tiles, 1, n_pix))], axis=1)
    rows = blend_stream_backward(packed_t, first_tile, last_tile, fin, g_fin,
                                 s2, interpret=interpret,
                                 score_cfg=(width, height))
    return rows[0]


# --------------------------------------------------------------------- #
# custom_vjp wrapper
# --------------------------------------------------------------------- #

def split_fin(fin):
    """(T, 4, P) kernel layout → ((T, P, 3) acc, (T, P) transmittance).

    Public: the inference dispatch in ops/rasterize.py uses it to unpack
    the no-saved-state forward's output."""
    return jnp.swapaxes(fin[:, 0:3, :], 1, 2), fin[:, 3, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def blend_stream(packed_t, first_tile, last_tile, statics: BlendStatics):
    """(16, I) stream fields → ((T, P, 3) color acc, (T, P) transmittance).

    first_tile/last_tile: (I/128,) i32 — tile id of each chunk's first/last
    instance, clamped to n_tiles-1 (drive the backward's block pipeline).
    """
    return split_fin(blend_stream_forward(packed_t, statics))


def _fwd(packed_t, first_tile, last_tile, statics):
    fin = blend_stream_forward(packed_t, statics)
    return split_fin(fin), (packed_t, first_tile, last_tile, fin)


def _bwd(statics, residuals, cotangents):
    packed_t, first_tile, last_tile, fin = residuals
    g_acc, g_trans = cotangents
    g_fin = jnp.concatenate(
        [jnp.swapaxes(g_acc, 1, 2), g_trans[:, None, :]], axis=1)  # (T, 4, P)
    g_packed = blend_stream_backward(packed_t, first_tile, last_tile,
                                     fin, g_fin, statics)
    if isinstance(packed_t, (tuple, list)):
        # match the tuple structure; rows >= 9 (tile id, padding) get zeros
        g_packed = type(packed_t)(
            g_packed[r] if r < 9 else jnp.zeros_like(g_packed[0])
            for r in range(len(packed_t)))
    return g_packed, None, None


blend_stream.defvjp(_fwd, _bwd)
