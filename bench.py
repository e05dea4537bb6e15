"""Benchmark: garden-scale training throughput + 1080p render FPS on TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Workload mirrors the reference's headline recipe (MipNeRF360 garden @ 1/4
resolution = 1297x840, SH degree 3, fastergs_garden.yaml:106-107) on a
synthetic scene of comparable Gaussian count, since no dataset ships in this
environment. Training steps are fused into single dispatches so the number
reflects device throughput, not host/tunnel dispatch latency.

vs_baseline: the reference publishes no numeric tables (BASELINE.md); we
normalize against an assumed 90 it/s RTX-class average for FasterGS on
garden (30k iterations in ~5.5 min, consistent with its "2-5x faster than
research codebases" claim, README.md:20-22).
"""

import json
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

ASSUMED_RTX_BASELINE_ITERS_PER_SEC = 90.0

# garden @ 1/4 resolution (fastergs_garden.yaml:106-107)
WIDTH, HEIGHT = 1297, 840
N_GAUSSIANS = 150_000   # garden-scale count; measured instance demand is
                        # ~7.9 touched tiles per Gaussian (~1.19M) at this
                        # resolution
# Optional scale overrides (endpoint-scale evidence runs, e.g. the graded
# 30k garden run ends near N=1M — VERDICT r4 ask #8). The driver's default
# invocation (no env) is unchanged.
N_GAUSSIANS = int(os.environ.get('FASTERGS_BENCH_N', N_GAUSSIANS))
INSTANCE_CAP = 1_245_184  # 19 * 2^16: must EXCEED measured demand
                        # (1,178,254 at this workload, 5.7% headroom) — a
                        # truncated workload silently drops blended
                        # instances and corrupts the gradients being timed
                        # (round-3 headline mistake). Aligned caps sort at
                        # their exact length (constants.CAP_ALIGN); the
                        # linear-in-I stages (fill/blend/segreduce) no
                        # longer pay pow2 padding. bench_training
                        # HARD-FAILS on overflow so a truncated number can
                        # never ship
INSTANCE_CAP = int(os.environ.get('FASTERGS_BENCH_CAP', INSTANCE_CAP))
CHUNK = 32
TRAIN_STEPS = 30
FPS_FRAMES = 20


def build_workload():
    from fastergs_tpu.data.synthetic import (
        make_synthetic_dataset, random_gaussian_scene)
    from fastergs_tpu.models.gaussians import FasterGSModel

    dataset, scene = make_synthetic_dataset(
        n_gaussians=N_GAUSSIANS, n_views=4, width=WIDTH, height=HEIGHT,
        focal=0.55 * WIDTH, seed=0, instance_cap=INSTANCE_CAP,
        test_step=10_000)
    data = dataset.to_device_dataset()

    model = FasterGSModel(sh_degree=3).build()
    # train at full ground-truth Gaussian count (garden-scale workload)
    model.gaussians.initialize_from_point_cloud(
        scene['means'], None, use_mcmc=False)
    return dataset, data, model


def bench_training(data, model):
    from fastergs_tpu.engine.loss import LossWeights
    from fastergs_tpu.engine.train_step import (
        TrainStepStatics, train_steps_fused)

    g = model.gaussians
    statics = TrainStepStatics(
        width=WIDTH, height=HEIGHT, active_sh_bases=16,
        proper_antialiasing=False, use_original_3d_filter=False,
        use_optimized_3d_filter=False, update_densification_info=True,
        inject_noise=False, use_random_background=False,
        instance_cap=INSTANCE_CAP, chunk=CHUNK,
        loss_weights=LossWeights())
    lrs = {k: jnp.float32(v) for k, v in {
        'means': 1.6e-4, 'sh_coefficients_0': 2.5e-3,
        'sh_coefficients_rest': 1.25e-4, 'opacities': 0.025,
        'scales': 5e-3, 'rotations': 1e-3}.items()}
    n_views = data.rgb.shape[0]
    rng = np.random.default_rng(0)

    # every run starts from the SAME state snapshot: the workload stays
    # fixed (no cumulative splat growth into instance-cap overflow) and the
    # timed segment is identical to the warmup
    state0 = jax.tree_util.tree_map(jnp.copy, g.state)
    idxs = jnp.asarray(rng.integers(0, n_views, TRAIN_STEPS), jnp.int32)
    means_lrs = jnp.full((TRAIN_STEPS,), 1.6e-4, jnp.float32)

    def run():
        state, metrics = train_steps_fused(
            jax.tree_util.tree_map(jnp.copy, state0), data, idxs, lrs,
            means_lrs, jax.random.PRNGKey(0), statics)
        # value fetch: block_until_ready is unreliable on the tunneled backend
        float(metrics['loss'][-1])
        return state, metrics

    # two warmup rounds: the first compiles; the second recompiles once more
    # because donated outputs come back with a different buffer layout
    run()
    run()
    t0 = time.perf_counter()
    g.state, stacked = run()
    dt = time.perf_counter() - t0
    # metrics leaves are stacked (n_steps,): counters report the max over
    # the window (overflow detection), floats the last step
    metrics = {k: (jnp.max(v)
                   if not jnp.issubdtype(v.dtype, jnp.floating) else v[-1])
               for k, v in stacked.items()}
    demand = int(metrics['n_rect_instances'])
    if demand > INSTANCE_CAP:
        # NEVER report a truncated headline (the timed gradients would be
        # corrupted): fail the training section instead
        raise RuntimeError(
            f'train instance demand {demand:,} exceeds cap '
            f'{INSTANCE_CAP:,} — resize the workload before benching')
    return TRAIN_STEPS / dt, metrics


RENDER_CAP = int(os.environ.get('FASTERGS_BENCH_RENDER_CAP', 1_966_080))
# default 30 * 2^16: the 1080p view of this scene demands
                        # 1,863,253 instances (measured, 5.5% headroom);
                        # an undersized cap silently drops the overflow
                        # and fakes the FPS number


def bench_render_fps(model):
    from fastergs_tpu.ops.projection import CameraParams
    from fastergs_tpu.ops.rasterize import (
        RasterizerSettings, diff_rasterize, rasterize)

    g = model.gaussians
    w, h = 1920, 1080
    w2c = np.eye(4, dtype=np.float32)[:3]
    w2c[2, 3] = 3.5
    cam = CameraParams(
        w2c=jnp.asarray(w2c), cam_position=jnp.asarray([0.0, 0.0, -3.5]),
        focal_x=jnp.float32(0.55 * w), focal_y=jnp.float32(0.55 * w),
        center_x=jnp.float32(w / 2), center_y=jnp.float32(h / 2),
        near_plane=jnp.float32(0.05), far_plane=jnp.float32(200.0),
        width=w, height=h)
    settings = RasterizerSettings(camera=cam, bg_color=jnp.zeros(3),
                                  active_sh_bases=16)
    args = (g.means, g.raw_scales, g.raw_rotations, g.raw_opacities,
            g.sh_coefficients_0, g.sh_coefficients_rest)

    @jax.jit
    def render_many(args, n_frames):
        # the dedicated inference pipeline (rasterize -> no-saved-state
        # forward), matching the reference's FPS benchmark which times
        # _C.inference, not the training forward (Renderer.py:99-112)
        # data dependency through the carry prevents loop-invariant hoisting
        def body(i, carry):
            acc, a = carry
            img = rasterize(*a, settings, instance_cap=RENDER_CAP, chunk=64)
            v = img[0, 0, 0]
            return acc + v, (a[0] + 0.0 * v,) + a[1:]
        out, _ = jax.lax.fori_loop(0, n_frames, body,
                                   (jnp.float32(0.0), args))
        return out

    # instance demand of this view: must fit RENDER_CAP or the FPS number
    # is rendering a silently truncated scene
    _, aux = jax.jit(lambda a: diff_rasterize(
        *a, settings, instance_cap=RENDER_CAP, chunk=64))(args)
    demand = int(aux.n_rect_instances)

    float(render_many(args, 1))  # compile
    t0 = time.perf_counter()
    float(render_many(args, FPS_FRAMES))
    dt = time.perf_counter() - t0
    return FPS_FRAMES / dt, demand


def algorithmic_flops_per_step(n_gaussians, n_instances, width, height):
    """Honest (hardware-agnostic) work estimate for one training step.

    Counts the ALGORITHM's useful flops — the work the reference's CUDA
    kernels do — not the MXU reformulation's actual flops (which trade
    extra flops for lane parallelism). Per blended instance: ~30 flops
    per covered pixel forward + ~2x backward over a 16x16 tile; per
    Gaussian: ~2k projection/SH flops fwd + ~2x bwd; per pixel: ~220
    flops of L1+SSIM loss (11-tap separable blurs, fwd+bwd) + Adam over
    ~60 params/Gaussian.
    """
    blend = n_instances * 256 * (30 + 60)
    prep = n_gaussians * (2_000 + 4_000)
    loss = width * height * 220
    adam = n_gaussians * 60 * 12
    return blend + prep + loss + adam


TPU_V5E_PEAK_FLOPS = 197e12  # bf16 MXU peak, one v5e chip


def main():
    from fastergs_tpu.utils.compilation_cache import enable_persistent_cache
    enable_persistent_cache()
    dataset, data, model = build_workload()
    # isolated sections: a crash in one must not lose the other's number
    its = metrics = None
    train_err = render_err = None
    try:
        # train on the full ground-truth-sized model (garden-scale workload)
        its, metrics = bench_training(data, model)
    except Exception as e:  # noqa: BLE001 - report, keep benching
        train_err = f'{type(e).__name__}: {e}'[:400]
    try:
        fps, render_demand = bench_render_fps(model)
    except Exception as e:  # noqa: BLE001
        fps, render_demand = None, None
        render_err = f'{type(e).__name__}: {e}'[:400]
    from fastergs_tpu.utils.memory import device_memory_stats
    hbm = device_memory_stats()
    result = {
        'metric': 'train_iters_per_sec_garden_scale',
        'value': round(its, 2) if its else 0.0,
        'unit': 'it/s',
        # normalization is against an ASSUMED 90 it/s RTX-class figure
        # (see module docstring) — the reference publishes no tables
        'vs_baseline': round(its / ASSUMED_RTX_BASELINE_ITERS_PER_SEC, 3)
        if its else 0.0,
        'baseline_assumed_its': ASSUMED_RTX_BASELINE_ITERS_PER_SEC,
        'render_fps_1080p': round(fps, 2) if fps else 0.0,
        'n_gaussians': N_GAUSSIANS,
        'image': f'{WIDTH}x{HEIGHT}',
        'device': str(jax.devices()[0]),
    }
    if train_err:
        result['train_error'] = train_err
    if render_err:
        result['render_error'] = render_err
    if metrics is not None:
        result.update(
            n_instances=int(metrics['n_instances']),
            train_demand=int(metrics['n_rect_instances']),
            train_cap=INSTANCE_CAP,
            loss=float(metrics['loss']))
        flops = algorithmic_flops_per_step(
            N_GAUSSIANS, int(metrics['n_rect_instances']), WIDTH, HEIGHT)
        result['mfu_estimate'] = round(its * flops / TPU_V5E_PEAK_FLOPS, 4)
    if render_demand is not None:
        result.update(render_demand=render_demand, render_cap=RENDER_CAP)
        if render_demand > RENDER_CAP:
            result['render_overflow'] = True
    if 'peak_bytes_in_use' in hbm:  # BASELINE config #4: HBM footprint
        result['hbm_peak_gib'] = round(hbm['peak_bytes_in_use'] / (1 << 30), 3)
    if 'bytes_in_use' in hbm:
        result['hbm_in_use_gib'] = round(hbm['bytes_in_use'] / (1 << 30), 3)
    else:
        # the tunneled backend exposes no allocator stats: report the
        # analytic resident footprint (params + Adam moments + dataset +
        # the dominant rasterizer streams) so BASELINE config #4 stays
        # measurable
        from fastergs_tpu.utils.memory import analytic_train_footprint
        result['hbm_model_gib'] = round(
            analytic_train_footprint(model.gaussians.state, data,
                                     INSTANCE_CAP) / (1 << 30), 3)
    print(json.dumps(result))


if __name__ == '__main__':
    main()
