"""Stage-level timing of the training-step pipeline on the real TPU.

Times each pipeline stage as a separate jitted dispatch (with a fori_loop
repeat inside to amortize dispatch latency) so optimization work can target
the true bottlenecks. Not a test — a development tool.

Usage: python tools/profile_stages.py [n_gaussians]
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

WIDTH, HEIGHT = 1297, 840
N_GAUSSIANS = int(sys.argv[1]) if len(sys.argv) > 1 else 150_000
# default matches bench.py's honest (non-truncated) cap
INSTANCE_CAP = int(sys.argv[2]) if len(sys.argv) > 2 else 1 << 21
REPS = 10


def _fetch(out):
    """Value fetch: block_until_ready is unreliable on the tunneled backend."""
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
    """Wraps fn into a jitted REPS-times loop with a data dependency.

    EVERY output leaf is consumed by a full reduction — consuming only one
    element lets XLA dead-code-eliminate the rest of the computation (e.g.
    a 'train step' timing that silently drops the whole backward).
    """
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
            v = 1e-12 * v  # tiny scale keeps acc (and the arg nudge) finite
            a0 = jax.tree_util.tree_map(
                lambda x: x + (0.0 * v).astype(x.dtype)
                if jnp.issubdtype(x.dtype, jnp.floating) else x, a[0])
            a = (a0,) + a[1:]
            return acc + v, a
        acc, _ = jax.lax.fori_loop(0, REPS, body, (jnp.float32(0.0), args))
        return acc
    return jax.jit(run)


def main():
    from fastergs_tpu.data.synthetic import (
        make_synthetic_dataset, random_gaussian_scene)
    from fastergs_tpu.models.gaussians import FasterGSModel, effective_raw_params
    from fastergs_tpu.engine.loss import LossWeights, image_loss
    from fastergs_tpu.engine.train_step import (
        TrainStepStatics, camera_for_view, train_step_impl)
    from fastergs_tpu.ops.projection import preprocess, grid_size
    from fastergs_tpu.ops.tiles import (attach_stream_grad,
                                        build_tile_instances_compact,
                                        build_tile_instances_stream)
    from fastergs_tpu.ops import blend_stream
    from fastergs_tpu.ops.blend import BlendStatics, pack_blend_inputs
    from fastergs_tpu.constants import DEFAULT_CONSTANTS
    from fastergs_tpu.ops.rasterize import RasterizerSettings

    dataset, scene = make_synthetic_dataset(
        n_gaussians=N_GAUSSIANS, n_views=2, width=WIDTH, height=HEIGHT,
        focal=0.55 * WIDTH, seed=0, instance_cap=INSTANCE_CAP,
        test_step=10_000)
    data = dataset.to_device_dataset()
    model = FasterGSModel(sh_degree=3).build()
    model.gaussians.initialize_from_point_cloud(scene['means'], None,
                                                use_mcmc=False)
    g = model.gaussians
    state = g.state
    statics = TrainStepStatics(
        width=WIDTH, height=HEIGHT, active_sh_bases=16,
        proper_antialiasing=False, use_original_3d_filter=False,
        use_optimized_3d_filter=False, update_densification_info=True,
        inject_noise=False, use_random_background=False,
        instance_cap=INSTANCE_CAP, chunk=32, loss_weights=LossWeights())
    consts = DEFAULT_CONSTANTS
    cam = camera_for_view(data, jnp.int32(0), statics)
    gw, gh = grid_size(WIDTH, HEIGHT, consts)
    bstat = BlendStatics.create(gw, gh, 32, consts)
    cap = state.params['means'].shape[0]
    active = jnp.arange(cap, dtype=jnp.int32) < state.n_active

    # ---- stage functions ----
    def f_preprocess(params, f3d):
        eff = effective_raw_params(params, f3d, False)
        return preprocess(*eff, cam, active_mask=active, active_sh_bases=16,
                          consts=consts)

    prims = timeit('preprocess fwd', rep(f_preprocess),
                   state.params, state.filter_3d)
    prims = jax.jit(f_preprocess)(state.params, state.filter_3d)

    def f_bin(prims):
        inst = build_tile_instances_compact(prims, gw, gh, INSTANCE_CAP,
                                            consts)
        return inst.gaussian_idx, inst.tile_idx, inst.n_instances

    timeit('expand+sort (compact binning)', rep(f_bin), prims)
    gidx, tidx, n_i = jax.jit(f_bin)(prims)
    n_exp = int(jax.jit(lambda p: build_tile_instances_compact(
        p, gw, gh, INSTANCE_CAP, consts).n_expanded_instances)(prims))
    print(f'    n_instances={int(n_i)}  I={gidx.shape[0]}  demand={n_exp}')

    def f_pack(prims):
        return pack_blend_inputs(prims.mean2d, prims.conic, prims.opacity,
                                 prims.color)

    timeit('pack9', rep(f_pack), prims)
    pack9 = jax.jit(f_pack)(prims)

    def f_gather(pack9, gidx, tidx):
        pack_s = jnp.concatenate(
            [pack9, jnp.zeros((1, 9), pack9.dtype)], axis=0)
        rows9 = pack_s[gidx]
        return jnp.concatenate(
            [rows9, tidx.astype(jnp.float32)[:, None],
             jnp.zeros((rows9.shape[0], 6), jnp.float32)], axis=1).T

    timeit('gather rows + tile row + T (OLD)', rep(f_gather),
           pack9, gidx, tidx)

    # the production path: fields ride the fill + sort; no gather.
    # rows10 is a TUPLE of 10 sorted (I,) columns feeding the kernels
    # directly (no stacked layout in HBM).
    def f_stream(prims, pack9):
        inst, rows10 = build_tile_instances_stream(
            prims, pack9, gw, gh, INSTANCE_CAP, consts)
        return rows10, inst.tile_idx

    timeit('stream build (fill+sort+payload)', rep(f_stream), prims, pack9)
    packed_t, _ = jax.jit(f_stream)(prims, pack9)

    # sub-stages of the stream build: expansion (fill kernel + tile decode)
    # vs the 12-operand lexicographic sort
    from fastergs_tpu.ops.tiles import _expand_instances

    def f_expand(prims, pack9):
        fields_i32 = jax.lax.bitcast_convert_type(pack9, jnp.int32)
        tk, dk, own, total, extra = _expand_instances(
            prims, gw, gh, INSTANCE_CAP, extra_cols=fields_i32)
        return (tk, dk, own) + tuple(extra)

    timeit('  stream expand only (fill+decode)', rep(f_expand), prims, pack9)
    cols12 = jax.jit(f_expand)(prims, pack9)

    def f_sort12(*cols):
        return jax.lax.sort(tuple(cols), num_keys=2, is_stable=False)

    timeit('  stream sort only (12 ops, 2 keys)', rep(f_sort12), *cols12)
    c = blend_stream.CHUNK
    ft = jnp.minimum(tidx[::c], gw * gh - 1)
    lt = jnp.minimum(tidx[c - 1::c], gw * gh - 1)

    def f_blend_fwd(packed_t):
        return blend_stream.blend_stream_forward(packed_t, bstat)

    timeit('stream blend fwd', rep(f_blend_fwd), packed_t)
    fin = jax.jit(f_blend_fwd)(packed_t)

    g_fin = jnp.ones_like(fin)

    def f_blend_bwd(packed_t, ft, lt, fin, g_fin):
        return blend_stream.blend_stream_backward(
            packed_t, ft, lt, fin, g_fin, bstat)

    timeit('stream blend bwd', rep(f_blend_bwd),
           packed_t, ft, lt, fin, g_fin)
    g_packed = jax.jit(f_blend_bwd)(packed_t, ft, lt, fin, g_fin)

    def f_scatter(g_packed_t, gidx):
        rows = g_packed_t.T[:, :9]
        out = jnp.zeros((cap + 1, 9), jnp.float32).at[gidx].add(rows)
        return out[:cap]

    timeit('grad transpose + scatter-add', rep(f_scatter), g_packed, gidx)

    # gather/scatter as one vjp (what the train step actually runs)
    def f_gather_only(pack9, gidx):
        pack_s = jnp.concatenate(
            [pack9, jnp.zeros((1, 9), pack9.dtype)], axis=0)
        return pack_s[gidx]

    def f_gather_vjp(pack9, gidx, ct):
        _, vjp = jax.vjp(lambda p: f_gather_only(p, gidx), pack9)
        return vjp(ct)[0]

    ct = jnp.ones((gidx.shape[0], 9), jnp.float32)
    timeit('gather-vjp scatter (autodiff form, OLD)', rep(f_gather_vjp),
           pack9, gidx, ct)

    # the production reduction: owner sort + pallas window segsum
    from fastergs_tpu.ops.segreduce import reduce_by_gaussian

    def f_segreduce(rows_t, gidx):
        return reduce_by_gaussian(rows_t, gidx, cap).T

    rows_t9 = jnp.ones((9, gidx.shape[0]), jnp.float32)
    timeit('owner-sort + pallas segreduce', rep(f_segreduce), rows_t9, gidx)

    # image loss fwd+bwd
    target = data.rgb[0]
    settings = RasterizerSettings(camera=cam, bg_color=data.bg_color,
                                  active_sh_bases=16)

    def f_loss(img):
        def loss_fn(im):
            v, m = image_loss(im, target, statics.loss_weights)
            return v
        return jax.value_and_grad(loss_fn)(img)

    img = jnp.zeros((3, HEIGHT, WIDTH), jnp.float32)
    timeit('image loss fwd+grad (L1+DSSIM)', rep(f_loss), img)

    # preprocess backward
    def f_pre_vjp(params, f3d, ct_mean2d):
        def fn(p):
            pr = f_preprocess(p, f3d)
            return pr.mean2d, pr.conic, pr.opacity, pr.color, pr.depth
        out, vjp = jax.vjp(fn, params)
        cts = (ct_mean2d, jnp.ones((cap, 3)), jnp.ones((cap,)),
               jnp.ones((cap, 3)), jnp.ones((cap,)))
        return vjp(cts)[0]

    ctm = jnp.ones((cap, 2), jnp.float32)
    timeit('preprocess fwd+vjp', rep(f_pre_vjp),
           state.params, state.filter_3d, ctm)

    # adam
    from fastergs_tpu.ops.adam import AdamConfig, adam_step
    lrs = {k: jnp.float32(1e-3) for k in state.params}

    def f_adam(params, grads, adam):
        return adam_step(params, grads, adam, lrs, AdamConfig(), mask=active)

    grads = jax.tree_util.tree_map(jnp.ones_like, state.params)
    timeit('adam step', rep(f_adam), state.params, grads, state.adam)

    # full step
    def f_full(st):
        new_state, metrics = train_step_impl(
            st, data, jnp.int32(0), {k: jnp.float32(1e-3) for k in st.params},
            jnp.float32(0.0), jax.random.PRNGKey(0), statics)
        # return everything: consuming only the loss lets XLA DCE the
        # entire backward + optimizer
        return new_state.params, new_state.adam.mu, metrics['loss']

    timeit('FULL train step', rep(f_full), state)


if __name__ == '__main__':
    main()
