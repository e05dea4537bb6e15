"""Training-step throughput across recipe variants on the real TPU.

Answers VERDICT r3 asks #5/#6 with measured numbers:
  plain        bench.py's headline statics (AA off, no MCMC noise, fixed bg)
  full-recipe  BASELINE config #3 semantics: proper antialiasing + MCMC
               noise injection + random background + optimized 3D filter
               (reference: fastergs_garden.yaml + Trainer.py:117-136)
  views2/4     VIEWS_PER_STEP batching (one Adam step per V rendered views)

Each section reuses bench.py's workload and fused-window timing. Numbers
are recorded in PLAN.md. Development tool — bench.py stays the official
single-line headline.

Usage: python tools/bench_variants.py [variant ...]   (default: all)
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

import bench
from fastergs_tpu.engine.loss import LossWeights
from fastergs_tpu.engine.train_step import TrainStepStatics, train_steps_fused

TRAIN_STEPS = 30


def make_statics(variant: str) -> TrainStepStatics:
    base = dict(
        width=bench.WIDTH, height=bench.HEIGHT, active_sh_bases=16,
        proper_antialiasing=False, use_original_3d_filter=False,
        use_optimized_3d_filter=False, update_densification_info=True,
        inject_noise=False, use_random_background=False,
        instance_cap=bench.INSTANCE_CAP, chunk=bench.CHUNK,
        loss_weights=LossWeights())
    if variant == 'plain':
        pass
    elif variant == 'full-recipe':
        base.update(proper_antialiasing=True, inject_noise=True,
                    use_random_background=True, use_optimized_3d_filter=True,
                    loss_weights=LossWeights(lambda_opacity_reg=0.01,
                                             lambda_scale_reg=0.01))
    elif variant.startswith('views'):
        base.update(views_per_step=int(variant[5:]))
    else:
        raise SystemExit(f'unknown variant {variant}')
    return TrainStepStatics(**base)


def run_variant(variant, dataset, data, model):
    g = model.gaussians
    statics = make_statics(variant)
    if statics.use_optimized_3d_filter or statics.use_original_3d_filter:
        # the scale clamp (engine/train_step.py post-optimizer step) uses
        # filter_3d as a log-space floor: it MUST be the computed per-Gaussian
        # filter, not initialize_from_point_cloud's zeros (log-scale 0 ==
        # world scale 1.0 would blow every splat up to screen size) — same
        # order as engine/trainer.py: setup_3d_filter BEFORE training
        from types import SimpleNamespace
        g.setup_3d_filter(
            SimpleNamespace(ORIGINAL_FORMULATION=statics.use_original_3d_filter,
                            FILTER_VARIANCE=0.2),
            dataset.train_views)
    lrs = {k: jnp.float32(v) for k, v in {
        'means': 1.6e-4, 'sh_coefficients_0': 2.5e-3,
        'sh_coefficients_rest': 1.25e-4, 'opacities': 0.025,
        'scales': 5e-3, 'rotations': 1e-3}.items()}
    n_views = data.rgb.shape[0]
    rng = np.random.default_rng(0)
    state0 = jax.tree_util.tree_map(jnp.copy, g.state)
    V = statics.views_per_step
    idxs = jnp.asarray(rng.integers(0, n_views, TRAIN_STEPS * V), jnp.int32)
    means_lrs = jnp.full((TRAIN_STEPS,), 1.6e-4, jnp.float32)

    def run():
        state, metrics = train_steps_fused(
            jax.tree_util.tree_map(jnp.copy, state0), data, idxs, lrs,
            means_lrs, jax.random.PRNGKey(0), statics)
        float(metrics['loss'][-1])
        return state, metrics

    t0 = time.perf_counter()
    run()
    run()   # second compile: donated-layout variant
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    _, stacked = run()
    dt = time.perf_counter() - t0
    demand = int(jnp.max(stacked['n_rect_instances']))
    overflow = demand > bench.INSTANCE_CAP
    its = TRAIN_STEPS / dt
    views_ps = its * V
    print(f'{variant:12s} {its:7.2f} steps/s  {views_ps:7.2f} views/s  '
          f'demand {demand:,}{"  OVERFLOW" if overflow else ""}  '
          f'(compile {compile_s:.0f}s)', flush=True)


def main():
    variants = sys.argv[1:] or ['plain', 'full-recipe', 'views2', 'views4']
    dataset, data, model = bench.build_workload()
    for v in variants:
        run_variant(v, dataset, data, model)


if __name__ == '__main__':
    main()
