"""Stage-level timing of the INFERENCE render path at 1080p on the real TPU.

Mirrors the bench.py render-FPS workload (150k Gaussians, 1920x1080,
2^21 instance cap — keep these in sync with bench.py N_GAUSSIANS /
RENDER_CAP) and times each forward stage as its own jitted dispatch, so
the inference fast-path work targets the true bottlenecks.

Usage: python tools/profile_render.py [n_gaussians]
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

W, H = 1920, 1080
N_GAUSSIANS = int(sys.argv[1]) if len(sys.argv) > 1 else 150_000
INSTANCE_CAP = (int(sys.argv[2]) if len(sys.argv) > 2 else 1_966_080)
# default matches bench.py RENDER_CAP (30 * 2^16): the 1080p view of this
# scene demands ~1.86M instances; an undersized cap silently truncates the
# profiled workload
REPS = 10


def _fetch(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.asarray(leaf, jnp.float32).ravel()[0])


def timeit(name, fn, *args):
    out = fn(*args)
    _fetch(out)
    t0 = time.perf_counter()
    out = fn(*args)
    _fetch(out)
    dt = (time.perf_counter() - t0) / REPS * 1e3
    print(f'{name:42s} {dt:8.2f} ms')
    return out


def rep(fn):
    def run(*args):
        def body(i, carry):
            acc, a = carry
            out = fn(*a)
            v = jnp.float32(0.0)
            for leaf in jax.tree_util.tree_leaves(out):
                if jnp.issubdtype(leaf.dtype, jnp.floating):
                    v = v + jnp.sum(leaf.astype(jnp.float32))
                else:
                    v = v + jnp.sum(leaf).astype(jnp.float32)
            v = 1e-12 * v
            a0 = jax.tree_util.tree_map(
                lambda x: x + (0.0 * v).astype(x.dtype)
                if jnp.issubdtype(x.dtype, jnp.floating) else x, a[0])
            a = (a0,) + a[1:]
            return acc + v, a
        acc, _ = jax.lax.fori_loop(0, REPS, body, (jnp.float32(0.0), args))
        return acc
    return jax.jit(run)


def main():
    from fastergs_tpu.data.synthetic import random_gaussian_scene
    from fastergs_tpu.models.gaussians import FasterGSModel
    from fastergs_tpu.ops.projection import CameraParams, preprocess, grid_size
    from fastergs_tpu.ops.tiles import build_tile_instances_stream
    from fastergs_tpu.ops import blend_stream
    from fastergs_tpu.ops.blend import (BlendStatics, pack_blend_inputs,
                                        tiles_to_image)
    from fastergs_tpu.constants import DEFAULT_CONSTANTS
    from fastergs_tpu.ops.rasterize import RasterizerSettings, rasterize

    scene = random_gaussian_scene(N_GAUSSIANS, seed=0)
    model = FasterGSModel(sh_degree=3).build()
    model.gaussians.initialize_from_point_cloud(
        jnp.asarray(scene['means']), None, use_mcmc=False)
    g = model.gaussians

    w2c = np.eye(4, dtype=np.float32)[:3]
    w2c[2, 3] = 3.5
    cam = CameraParams(
        w2c=jnp.asarray(w2c), cam_position=jnp.asarray([0.0, 0.0, -3.5]),
        focal_x=jnp.float32(0.55 * W), focal_y=jnp.float32(0.55 * W),
        center_x=jnp.float32(W / 2), center_y=jnp.float32(H / 2),
        near_plane=jnp.float32(0.05), far_plane=jnp.float32(200.0),
        width=W, height=H)
    consts = DEFAULT_CONSTANTS
    gw, gh = grid_size(W, H, consts)
    bstat = BlendStatics.create(gw, gh, 32, consts,
                                image_width=W, image_height=H)
    params = (g.means, g.raw_scales, g.raw_rotations, g.raw_opacities,
              g.sh_coefficients_0, g.sh_coefficients_rest)

    def f_pre(params):
        return preprocess(*params, cam, active_sh_bases=16, consts=consts)

    timeit('preprocess fwd', rep(f_pre), params)
    prims = jax.jit(f_pre)(params)

    def f_pack(prims):
        return pack_blend_inputs(prims.mean2d, prims.conic, prims.opacity,
                                 prims.color)

    pack9 = jax.jit(f_pack)(prims)

    def f_stream(prims, pack9):
        inst, rows10 = build_tile_instances_stream(
            prims, pack9, gw, gh, INSTANCE_CAP, consts)
        return rows10, inst.tile_idx, inst.n_expanded_instances

    timeit('stream build (fill+sort+payload)', rep(f_stream), prims, pack9)
    rows10, tidx, n_exp = jax.jit(f_stream)(prims, pack9)
    print(f'    tiles={gw}x{gh}={gw * gh}  demand={int(n_exp)}  '
          f'cap={INSTANCE_CAP}')
    if int(n_exp) > INSTANCE_CAP:
        print(f'    *** WARNING: demand {int(n_exp)} exceeds the cap — '
              f'timings below profile a TRUNCATED workload ***')

    def f_blend_fwd(rows10):
        return blend_stream.blend_stream_forward(rows10, bstat)

    timeit('stream blend fwd', rep(f_blend_fwd), rows10)
    fin = jax.jit(f_blend_fwd)(rows10)

    def f_to_image(fin):
        acc = jnp.swapaxes(fin[:, 0:3, :], 1, 2)
        trans = fin[:, 3, :]
        tile_pixels = acc  # bg black
        return tiles_to_image(tile_pixels, W, H, bstat), trans

    timeit('tiles_to_image', rep(f_to_image), fin)

    settings = RasterizerSettings(camera=cam, bg_color=jnp.zeros(3),
                                  active_sh_bases=16)

    def f_full(params):
        return rasterize(*params, settings, instance_cap=INSTANCE_CAP,
                         chunk=64)

    timeit('full rasterize()', rep(f_full), params)


if __name__ == '__main__':
    main()
