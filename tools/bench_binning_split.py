"""Split the stream-build (binning) cost: fill kernel vs expansion decode
vs sort, on the real workload's primitives.

Round-5 finding driver: the 12-op sort measures only ~2.9 ms
(bench_sort_shapes), yet the whole stream build was ~20 ms at 2^21 — this
harness shows where the rest lives. Host-chained reps (tunnel-dispatch
bias cancels in the A/B).

Usage: python tools/bench_binning_split.py [n_gaussians] [cap]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from fastergs_tpu.utils.compilation_cache import enable_persistent_cache
enable_persistent_cache()

from fastergs_tpu.data.synthetic import random_gaussian_scene, ring_cameras
from fastergs_tpu.models.gaussians import FasterGSModel
from fastergs_tpu.ops.projection import CameraParams, grid_size, preprocess
from fastergs_tpu.ops import tiles
from fastergs_tpu.ops.blend import pack_blend_inputs

WIDTH, HEIGHT = 1297, 840
N_GAUSS = int(sys.argv[1]) if len(sys.argv) > 1 else 150_000
CAP = int(sys.argv[2]) if len(sys.argv) > 2 else 1_245_184
REPS = 20


def timeit(name, fn, *args):
    t0 = time.perf_counter()
    out = fn(*args)
    float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    bump = jnp.float32(0.0)
    for _ in range(REPS):
        out = fn(*((a + bump.astype(a.dtype) if hasattr(a, 'dtype') else a)
                   for a in args))
        leaf = jax.tree_util.tree_leaves(out)[0]
        bump = 0.0 * jnp.asarray(leaf).ravel()[0].astype(jnp.float32)
    float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    dt = (time.perf_counter() - t0) / REPS * 1e3
    print(f'{name:46s} {dt:8.2f} ms  (first {compile_s:5.1f} s)', flush=True)


def main():
    scene = random_gaussian_scene(N_GAUSS, seed=0)
    model = FasterGSModel(sh_degree=3).build()
    model.gaussians.initialize_from_point_cloud(
        scene['means'], None, use_mcmc=False)
    g = model.gaussians
    view = ring_cameras(4, radius=4.6, width=WIDTH, height=HEIGHT,
                        focal=0.55 * WIDTH)[0]
    cam = CameraParams.from_view(view)
    gw, gh = grid_size(WIDTH, HEIGHT)

    prims = jax.jit(lambda m, s, r, o, s0, sr: preprocess(
        m, s, r, o, s0, sr, cam, active_sh_bases=16))(
        g.means, g.raw_scales, g.raw_rotations, g.raw_opacities,
        g.sh_coefficients_0, g.sh_coefficients_rest)
    prims = jax.tree_util.tree_map(jnp.asarray, prims)
    pack9 = jax.jit(pack_blend_inputs)(
        prims.mean2d, prims.conic, prims.opacity, prims.color)
    print(f'demand: {int(jnp.sum(prims.n_touched)):,} cap {CAP:,}',
          flush=True)

    # full stream build (fill + decode + 12-op sort + post)
    def full(p9, depth):
        pr = prims._replace(depth=depth)
        inst, rows10 = tiles.build_tile_instances_stream(
            pr, p9, gw, gh, CAP)
        return rows10

    timeit('build_tile_instances_stream (full)', full, pack9, prims.depth)

    # expansion only (fill + decode, no sort)
    def expand(p9, depth):
        pr = prims._replace(depth=depth)
        f_i32 = jax.lax.bitcast_convert_type(p9, jnp.int32)
        tile_key, depth_key, own, total, extra = tiles._expand_instances(
            pr, gw, gh, CAP, extra_cols=f_i32)
        return tile_key, depth_key, own, total, *extra

    timeit('expand (fill kernel + decode)', expand, pack9, prims.depth)

    # fill kernel alone (same 15 columns, no decode)
    from fastergs_tpu.ops import fill as fill_mod

    def fill_only(p9, depth):
        pr = prims._replace(depth=depth)
        counts = pr.n_touched
        offsets = jnp.cumsum(counts)
        starts = (offsets - counts).astype(jnp.int32)
        f_i32 = jax.lax.bitcast_convert_type(p9, jnp.int32)
        from fastergs_tpu.ops.math import float32_ordered_bits
        n = counts.shape[0]
        rect = pr.rect
        geom = rect[:, 0] | (jnp.maximum(rect[:, 1] - rect[:, 0], 1) << 10) \
            | (rect[:, 2] << 20)
        ownex = (jnp.arange(n, dtype=jnp.int32)
                 | (pr.exact.astype(jnp.int32) << 30))
        cols = [starts, geom, float32_ordered_bits(pr.depth),
                pr.tile_mask[:, 0], pr.tile_mask[:, 1], ownex] \
            + [f_i32[:, c] for c in range(9)]
        cols += [jnp.zeros((n,), jnp.int32)] * (fill_mod.ROWS - len(cols))
        rows_t = jnp.stack(cols, axis=0)
        return fill_mod.segment_fill_rows(rows_t, starts, CAP)

    timeit('fill kernel alone (15 cols)', fill_only, pack9, prims.depth)

    timeit('preprocess (N-bound)', jax.jit(
        lambda m: preprocess(m, g.raw_scales, g.raw_rotations,
                             g.raw_opacities, g.sh_coefficients_0,
                             g.sh_coefficients_rest, cam,
                             active_sh_bases=16).n_touched), g.means)

    timeit('pack9 (N-bound)', jax.jit(
        lambda m2, c, o, col: pack_blend_inputs(m2, c, o, col)),
        prims.mean2d, prims.conic, prims.opacity, prims.color)


if __name__ == '__main__':
    main()
