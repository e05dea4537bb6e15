"""Pallas TPU kernels for the tile blend (forward + backward).

Hand-written replacements for the XLA-composed blend in ops/blend.py — same
math, same custom_vjp contract, much faster on real tile distributions
because:

- each tile advances through ITS OWN instance range (a per-tile while loop
  with chunk-level early termination) instead of all tiles marching in
  lockstep to the global max length;
- per-pixel transmittance / color state lives in VMEM for the whole tile —
  the XLA version round-trips (T, P) state through HBM on every chunk;
- instance rows arrive via double-buffered DMA of contiguous aligned slices,
  overlapping memory with compute;
- the within-chunk front-to-back product is a log2(C)-step shifted-multiply
  scan in registers.

Data layout (chosen for Mosaic's lane-alignment rules — HBM DMA slices must
be 128-aligned in the minor dimension):

- instance data is a TRANSPOSED struct-of-fields array (16, I_pad): fields in
  sublanes, instances in lanes. A (9, 128) chunk DMA lands with each field
  as a (1, C) row that broadcasts directly against (P, C) pixel math — no
  in-kernel transposes at all;
- every tile's range starts at a multiple of CHUNK (ops/tiles.py
  pad_tile_ranges); padding slots reference a zero sentinel row whose alpha
  is exactly 0, so chunks need no validity masking and gradient writebacks
  never cross tile boundaries;
- pixels are SUBLANES (P = 256 rows), chunk instances are LANES (C = 128).

Equivalent of the reference blend kernels (kernels_forward.cuh:363-475,
kernels_backward.cuh:260-471) — see ops/blend.py for the semantics notes
(early-termination equivalence, clamp straight-through, true conic
derivatives). The reference's per-32-Gaussian bucket snapshots
(BucketBuffers) have no analog here: the backward recomputes transmittance
front-to-back, which on TPU is cheaper than staging snapshots through HBM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fastergs_tpu.ops.blend import BlendStatics

CHUNK = 128        # instances per DMA/compute chunk (lanes)
FIELD_ROWS = 16    # struct-of-fields rows: 9 used + 7 pad (HBM sublane
                   # tiling rounds to 8 — 9-row slices are illegal)


def _scan_mul(x, chunk):
    """Inclusive cumulative product along the lane axis via log-step shifts."""
    step = 1
    while step < chunk:
        shifted = pltpu.roll(x, step, axis=1)
        col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        x = x * jnp.where(col >= step, shifted, 1.0)
        step *= 2
    return x


def _scan_add(x, chunk):
    """Inclusive cumulative sum along the lane axis via log-step shifts."""
    step = 1
    while step < chunk:
        shifted = pltpu.roll(x, step, axis=1)
        col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        x = x + jnp.where(col >= step, shifted, 0.0)
        step *= 2
    return x


def _exclusive(incl, identity):
    """Shift an inclusive lane scan to exclusive."""
    excl = pltpu.roll(incl, 1, axis=1)
    col = jax.lax.broadcasted_iota(jnp.int32, excl.shape, 1)
    return jnp.where(col == 0, identity, excl)


def _pixel_coords(tile_idx, statics: BlendStatics, n_pix):
    """Pixel centers as (P, 1) columns (pixels are sublanes)."""
    tw, th = statics.tile_width, statics.tile_height
    tx = (tile_idx % statics.grid_width).astype(jnp.float32)
    ty = (tile_idx // statics.grid_width).astype(jnp.float32)
    p = jax.lax.broadcasted_iota(jnp.int32, (n_pix, 1), 0)
    px = tx * tw + (p % tw).astype(jnp.float32) + 0.5
    py = ty * th + (p // tw).astype(jnp.float32) + 0.5
    return px, py


def _chunk_terms(fields, px, py, statics: BlendStatics):
    """Per-(pixel, instance) alpha math, (P, C) arrays.

    `fields` is the (16, C) chunk: rows are [mx, my, a, b, c, op, r, g, b].
    Padding instances have all-zero fields → alpha == 0 → inert.
    Mirrors kernels_forward.cuh:431-446.
    """
    m_x, m_y = fields[0:1], fields[1:2]                      # (1, C)
    co_a, co_b, co_c = fields[2:3], fields[3:4], fields[4:5]
    op = fields[5:6]
    dx = m_x - px                                            # (P, C)
    dy = m_y - py
    power = -0.5 * (co_a * dx * dx + co_c * dy * dy) - co_b * dx * dy
    gauss = jnp.exp(jnp.minimum(power, 0.0))
    alpha = op * gauss
    if statics.original_opacity_interpretation:
        ok = alpha >= statics.min_alpha_threshold
    else:
        ok = gauss >= statics.min_alpha_threshold
    alpha_eff = jnp.where(ok, alpha, 0.0)
    return dict(dx=dx, dy=dy, gauss=gauss, alpha_eff=alpha_eff,
                co_a=co_a, co_b=co_b, co_c=co_c)


def _transmittance_update(trans, t_before, incl, thresh):
    """Exact frozen transmittance: the value at the first threshold crossing
    (the reference's sticky `done`, kernels_forward.cuh:452-455)."""
    below = t_before < thresh
    frozen = jnp.max(jnp.where(below, t_before, -1.0), axis=1, keepdims=True)
    unfrozen = trans * incl[:, CHUNK - 1:CHUNK]
    return jnp.where(frozen >= 0.0, frozen, unfrozen)


def _blend_fwd_kernel(tile_start, tile_end, packed_hbm, out,
                      chunk_vmem, sems, statics: BlendStatics):
    t = pl.program_id(0)
    n_pix = statics.tile_width * statics.tile_height
    start = tile_start[t]
    n = tile_end[t] - start
    px, py = _pixel_coords(t, statics, n_pix)
    thresh = statics.transmittance_threshold

    def dma(slot, k):
        off = pl.multiple_of(start + k * CHUNK, CHUNK)
        return pltpu.make_async_copy(
            packed_hbm.at[:, pl.ds(off, CHUNK)],
            chunk_vmem.at[slot], sems.at[slot])

    @pl.when(n > 0)
    def _():
        dma(0, 0).start()

    def cond(state):
        k, _, _, done = state
        return (k * CHUNK < n) & jnp.logical_not(done)

    def body(state):
        k, trans, acc, _ = state
        slot = jax.lax.rem(k, 2)

        @pl.when((k + 1) * CHUNK < n)
        def _():
            dma(1 - slot, k + 1).start()

        dma(slot, k).wait()
        fields = chunk_vmem[slot]                            # (16, C)
        terms = _chunk_terms(fields, px, py, statics)
        alpha_eff = terms['alpha_eff']
        one_minus = 1.0 - alpha_eff
        incl = _scan_mul(one_minus, CHUNK)
        excl = _exclusive(incl, 1.0)
        t_before = trans * excl                              # (P, C)
        used = t_before >= thresh
        w = jnp.where(used, t_before * alpha_eff, 0.0)
        col_r = jnp.maximum(fields[6:7], 0.0)                # clamp (fwd:415)
        col_g = jnp.maximum(fields[7:8], 0.0)
        col_b = jnp.maximum(fields[8:9], 0.0)
        acc = acc + jnp.concatenate([
            jnp.sum(w * col_r, axis=1, keepdims=True),
            jnp.sum(w * col_g, axis=1, keepdims=True),
            jnp.sum(w * col_b, axis=1, keepdims=True)], axis=1)  # (P, 3)

        trans = _transmittance_update(trans, t_before, incl, thresh)
        done = jnp.max(trans) < thresh
        return k + 1, trans, acc, done

    init = (jnp.int32(0), jnp.ones((n_pix, 1), jnp.float32),
            jnp.zeros((n_pix, 3), jnp.float32), n <= 0)
    k_fin, trans, acc, _ = jax.lax.while_loop(cond, body, init)

    # early termination may leave one prefetched DMA in flight — drain it so
    # the double-buffer semaphores stay balanced across grid steps
    @pl.when((k_fin > 0) & (k_fin * CHUNK < n))
    def _():
        dma(jax.lax.rem(k_fin, 2), k_fin).wait()

    out[0] = jnp.concatenate([acc, trans], axis=1)           # (P, 4)


def blend_tiles_pallas_forward(packed_t, tile_start, tile_end,
                               statics: BlendStatics, interpret=None):
    """packed_t: (16, I_pad) transposed struct-of-fields.
    Returns combined (T, P, 4): channels 0-2 color accumulator, channel 3
    transmittance."""
    n_tiles = statics.grid_width * statics.grid_height
    n_pix = statics.tile_width * statics.tile_height
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, n_pix, 4), lambda t, *_: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, FIELD_ROWS, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_blend_fwd_kernel, statics=statics),
        out_shape=jax.ShapeDtypeStruct((n_tiles, n_pix, 4), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(tile_start, tile_end, packed_t)


def _blend_bwd_kernel(tile_start, tile_end, packed_hbm, fin, g_fin,
                      g_packed_hbm, chunk_vmem, grad_vmem, sems, out_sems,
                      statics: BlendStatics):
    t = pl.program_id(0)
    n_pix = statics.tile_width * statics.tile_height
    start = tile_start[t]
    n = tile_end[t] - start
    px, py = _pixel_coords(t, statics, n_pix)
    thresh = statics.transmittance_threshold
    guard_eps = statics.one_minus_alpha_eps

    fin_pc = fin[0]                                          # (P, 4)
    g_pc = g_fin[0]                                          # (P, 4)
    acc_fin = fin_pc[:, 0:3]
    trans_fin = fin_pc[:, 3:4]
    ga = g_pc[:, 0:3]                                        # (P, 3)
    g_trans = g_pc[:, 3:4]
    r0 = jnp.sum(acc_fin * ga, axis=1, keepdims=True)        # (P, 1)
    common = -trans_fin * g_trans                            # (P, 1)
    ga_r, ga_g, ga_b = ga[:, 0:1], ga[:, 1:2], ga[:, 2:3]

    def dma_in(slot, k):
        off = pl.multiple_of(start + k * CHUNK, CHUNK)
        return pltpu.make_async_copy(
            packed_hbm.at[:, pl.ds(off, CHUNK)],
            chunk_vmem.at[slot], sems.at[slot])

    def dma_out(slot, k):
        # aligned tile ranges: writebacks stay inside this tile's own slots
        off = pl.multiple_of(start + k * CHUNK, CHUNK)
        return pltpu.make_async_copy(
            grad_vmem.at[slot],
            g_packed_hbm.at[:, pl.ds(off, CHUNK)],
            out_sems.at[slot])

    @pl.when(n > 0)
    def _():
        dma_in(0, 0).start()

    def cond(state):
        k, *_ = state
        return k * CHUNK < n

    def body(state):
        k, trans, r_carry = state
        slot = jax.lax.rem(k, 2)

        @pl.when((k + 1) * CHUNK < n)
        def _():
            dma_in(1 - slot, k + 1).start()

        dma_in(slot, k).wait()
        # the grad buffer slot we are about to overwrite must have drained
        @pl.when(k >= 2)
        def _():
            dma_out(slot, k - 2).wait()

        fields = chunk_vmem[slot]
        terms = _chunk_terms(fields, px, py, statics)
        alpha_eff = terms['alpha_eff']
        dx, dy, gauss = terms['dx'], terms['dy'], terms['gauss']
        one_minus = 1.0 - alpha_eff
        incl = _scan_mul(one_minus, CHUNK)
        excl = _exclusive(incl, 1.0)
        t_before = trans * excl
        used = t_before >= thresh
        w = jnp.where(used, t_before * alpha_eff, 0.0)       # (P, C)

        craw_r, craw_g, craw_b = fields[6:7], fields[7:8], fields[8:9]
        cl_r = jnp.maximum(craw_r, 0.0)
        cl_g = jnp.maximum(craw_g, 0.0)
        cl_b = jnp.maximum(craw_b, 0.0)
        cg = cl_r * ga_r + cl_g * ga_g + cl_b * ga_b         # (P, C)
        u = w * cg
        u_csum = _scan_add(u, CHUNK)
        r_after = r_carry - u_csum                           # inclusive
        guard = 1.0 / jnp.maximum(one_minus, guard_eps)
        d_alpha = t_before * cg - r_after * guard + common * guard
        d_alpha = jnp.where(used & (alpha_eff > 0.0), d_alpha, 0.0)

        def psum(x):  # reduce over pixels → (1, C)
            return jnp.sum(x, axis=0, keepdims=True)

        g_op = psum(gauss * d_alpha)
        helper = -alpha_eff * d_alpha
        gc_a = 0.5 * psum(helper * dx * dx)
        gc_b = psum(helper * dx * dy)
        gc_c = 0.5 * psum(helper * dy * dy)
        gm_x = psum(helper * (terms['co_a'] * dx + terms['co_b'] * dy))
        gm_y = psum(helper * (terms['co_b'] * dx + terms['co_c'] * dy))
        # color grad with straight-through clamp factor
        gcol_r = psum(w * ga_r) * (craw_r >= 0.0)
        gcol_g = psum(w * ga_g) * (craw_g >= 0.0)
        gcol_b = psum(w * ga_b) * (craw_b >= 0.0)

        pad = jnp.zeros((FIELD_ROWS - 9, CHUNK), jnp.float32)
        grad_vmem[slot] = jnp.concatenate(
            [gm_x, gm_y, gc_a, gc_b, gc_c, g_op,
             gcol_r, gcol_g, gcol_b, pad], axis=0)           # (16, C)
        dma_out(slot, k).start()

        trans = _transmittance_update(trans, t_before, incl, thresh)
        r_carry = r_carry - u_csum[:, CHUNK - 1:CHUNK]
        return k + 1, trans, r_carry

    init = (jnp.int32(0), jnp.ones((n_pix, 1), jnp.float32), r0)
    k_fin, _, _ = jax.lax.while_loop(cond, body, init)

    # drain outstanding grad writebacks
    @pl.when(k_fin >= 2)
    def _():
        dma_out(jax.lax.rem(k_fin, 2), k_fin - 2).wait()

    @pl.when(k_fin >= 1)
    def _():
        dma_out(jax.lax.rem(k_fin - 1, 2), k_fin - 1).wait()


def blend_tiles_pallas_backward(packed_t, tile_start, tile_end, fin, g_fin,
                                statics: BlendStatics, interpret=None):
    """Returns per-instance gradient rows (16, I_pad) (transposed layout).

    Slots outside every aligned tile range are undefined here; the wrapper's
    sentinel-gather transpose discards them.
    """
    n_tiles = statics.grid_width * statics.grid_height
    n_pix = statics.tile_width * statics.tile_height
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),               # packed_t
            pl.BlockSpec((1, n_pix, 4), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),           # fin
            pl.BlockSpec((1, n_pix, 4), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),           # g_fin
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),         # g_packed (HBM)
        scratch_shapes=[
            pltpu.VMEM((2, FIELD_ROWS, CHUNK), jnp.float32),
            pltpu.VMEM((2, FIELD_ROWS, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_blend_bwd_kernel, statics=statics),
        out_shape=jax.ShapeDtypeStruct(packed_t.shape, jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(tile_start, tile_end, packed_t, fin, g_fin)


# ---------------------------------------------------------------------- #
# custom_vjp wrapper — operates on the transposed padded layout; callers
# build it via ops.tiles.pad_tile_ranges + a sentinel gather (see
# ops/rasterize.py)
# ---------------------------------------------------------------------- #

@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def blend_tiles_pallas(packed_t, tile_start, tile_end, statics: BlendStatics):
    """(16, I_pad) instance fields → ((T, P, 3) color acc, (T, P) trans)."""
    fin = blend_tiles_pallas_forward(packed_t, tile_start, tile_end, statics)
    return fin[..., 0:3], fin[..., 3]


def _fwd(packed_t, tile_start, tile_end, statics):
    fin = blend_tiles_pallas_forward(packed_t, tile_start, tile_end, statics)
    return (fin[..., 0:3], fin[..., 3]), (packed_t, tile_start, tile_end, fin)


def _bwd(statics, residuals, cotangents):
    packed_t, tile_start, tile_end, fin = residuals
    g_acc_tpc, g_trans = cotangents
    g_fin = jnp.concatenate([g_acc_tpc, g_trans[..., None]], axis=2)
    g_packed_t = blend_tiles_pallas_backward(
        packed_t, tile_start, tile_end, fin, g_fin, statics)
    return g_packed_t, None, None


blend_tiles_pallas.defvjp(_fwd, _bwd)
