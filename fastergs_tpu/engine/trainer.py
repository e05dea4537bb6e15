"""Training orchestrator: full 30k-iteration schedule as prioritized callbacks.

TPU-native equivalent of the reference FasterGSTrainer
(reference: Trainer.py:16-227). All hyperparameters and callback windows
mirror the reference defaults, including the documented quirks (densification
actually starting at 600, ending at 14,900 — Trainer.py:18-19). The hot
iteration dispatches ONE jitted device step (engine/train_step.py); the
maintenance callbacks call the jitted kernels in models/maintenance.py.

Instance-capacity management replaces the reference's dynamic allocations:
the trainer polls the rect-instance watermark every densification interval
and re-specializes the step when the buffer runs hot (SURVEY.md §8.3).
"""

from __future__ import annotations

import time
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from fastergs_tpu.config import Configurable, ConfigParameterList
from fastergs_tpu.engine.callbacks import (
    CallbackEngine, post_training_callback, pre_training_callback,
    training_callback)
from fastergs_tpu.engine.loss import LossWeights
from fastergs_tpu.engine.train_step import (
    DeviceDataset, TrainStepStatics, train_step)
from fastergs_tpu.utils.logging import log_info, log_warning


# Growth headroom: large enough that creeping demand does not re-trigger
# a growth (and its recompile) every poll — the trigger fires at
# 0.8 * cap, so headroom h re-triggers only after demand grows by
# 0.8*h - 1 (35%% -> +8%%). 1.5 was measured to leave ~33%% permanent
# padding on every linear-in-instances stage at the garden endpoint;
# 1.35 cuts that to ~21%% for one extra growth event per ~8%% demand
# creep. Post-densification the trim callback reclaims the rest.
GROWTH_HEADROOM = 1.35


def _grow_capacity(n: int) -> int:
    """Instance-capacity growth target: the demand (x a headroom factor,
    applied by callers) rounded up to the kernel alignment quantum — NOT
    the next power of two, which costs up to +100% padding on every
    linear-in-I stage (sorts, fill, blend, segreduce all run at the static
    cap; measured 44% padding at garden scale under pow2 caps)."""
    from fastergs_tpu.constants import round_up_capacity
    return round_up_capacity(n)


@Configurable.configure(
    NUM_ITERATIONS=30_000,
    LOAD_CHECKPOINT=None,               # resume path (host TRAINING.LOAD_CHECKPOINT)
    RUN_VALIDATION=False,
    VALIDATION_INTERVAL=1_000,
    BACKUP=ConfigParameterList(
        FINAL_CHECKPOINT=True,
        INTERVAL=-1,                    # >0: periodic checkpoints
    ),
    DENSIFICATION_START_ITERATION=600,   # Trainer.py:18
    DENSIFICATION_END_ITERATION=14_900,  # Trainer.py:19 (24_900 for MCMC)
    DENSIFICATION_INTERVAL=100,
    DENSIFICATION_GRAD_THRESHOLD=0.0002,
    DENSIFICATION_PERCENT_DENSE=0.01,
    SPEEDYSPLAT_PRUNING=ConfigParameterList(
        USE=False,
        START_ITERATION=6_000,
        END_ITERATION=30_000,
        INTERVAL=3_000,
        SOFT_PRUNING_RATIO=0.8,
        HARD_PRUNING_RATIO=0.3,
    ),
    USE_MCMC=False,
    MAX_PRIMITIVES=1_000_000,
    OPACITY_RESET_INTERVAL=3_000,
    EXTRA_OPACITY_RESET_ITERATION=500,
    MORTON_ORDERING_INTERVAL=5_000,
    MORTON_ORDERING_END_ITERATION=15_000,
    FILTER_3D=ConfigParameterList(
        USE=False,
        ORIGINAL_FORMULATION=False,
        FILTER_VARIANCE=0.2,
    ),
    USE_RANDOM_BACKGROUND_COLOR=False,
    MIN_OPACITY_AFTER_TRAINING=1 / 255,
    RANDOM_INITIALIZATION=ConfigParameterList(
        FORCE=False,
        N_POINTS=100_000,
        ENABLE_CARVING=True,
        CARVING_IN_ALL_FRUSTUMS=False,
        CARVING_ENFORCE_ALPHA=False,
    ),
    LOSS=ConfigParameterList(
        LAMBDA_L1=0.8,
        LAMBDA_DSSIM=0.2,
        LAMBDA_OPACITY_REGULARIZATION=0.0,
        LAMBDA_SCALE_REGULARIZATION=0.0,
    ),
    OPTIMIZER=ConfigParameterList(
        LEARNING_RATE_MEANS_INIT=0.00016,
        LEARNING_RATE_MEANS_FINAL=0.0000016,
        LEARNING_RATE_MEANS_MAX_STEPS=30_000,
        LEARNING_RATE_SH_COEFFICIENTS_0=0.0025,
        LEARNING_RATE_SH_COEFFICIENTS_REST=0.000125,
        LEARNING_RATE_OPACITIES=0.025,
        LEARNING_RATE_SCALES=0.005,
        LEARNING_RATE_ROTATIONS=0.001,
    ),
    WANDB=ConfigParameterList(
        ACTIVATE=False,
        ENTITY=None,
        PROJECT='fastergs_tpu',
        INTERVAL=500,
    ),
    SEED=0,
    INSTANCE_CAP=1 << 21,
    VIEWS_PER_STEP=1,           # >1: batched steps (mean grads, one Adam)
    BLEND_CHUNK=32,
    USE_PALLAS_BLEND=None,  # None = auto: Pallas kernels on real TPUs
    PARALLEL_MODE='none',   # 'none' | 'views' | 'gaussians' | 'hybrid'
    HYBRID_VIEW_ROWS=2,     # hybrid mesh: view rows x gaussian cols
    LOG_INTERVAL=100,
)
class FasterGSTrainer(Configurable):
    """Reference: Trainer.py:68-227."""

    def __init__(self, model, renderer, config_overrides: dict | None = None) -> None:
        self.apply_config(config_overrides)
        self.model = model
        self.renderer = renderer
        self.callbacks = CallbackEngine(self)
        self.key = jax.random.PRNGKey(self.SEED)
        self.train_sampler: Optional[np.random.Generator] = None
        self._view_order: np.ndarray | None = None
        self._view_cursor = 0
        self.device_data: Optional[DeviceDataset] = None
        self.metrics_history: list = []
        self._pending_metrics: list = []
        self._instance_watermark = 0
        self.iters_per_sec = 0.0
        self.output_directory = '.'
        self.start_iteration = 0

    # ------------------------------------------------------------------ #
    def _next_key(self) -> jax.Array:
        self.key, sub = jax.random.split(self.key)
        return sub

    def _sample_view(self) -> int:
        """Random without replacement per epoch (host DatasetSampler)."""
        if self._view_order is None or self._view_cursor >= len(self._view_order):
            self._view_order = self.train_sampler.permutation(
                self.device_data.rgb.shape[0])
            self._view_cursor = 0
        idx = int(self._view_order[self._view_cursor])
        self._view_cursor += 1
        return idx

    def _make_statics(self, update_densification: bool) -> TrainStepStatics:
        g = self.model.gaussians
        return TrainStepStatics(
            width=self.device_data.rgb.shape[3],
            height=self.device_data.rgb.shape[2],
            active_sh_bases=g.active_sh_bases,
            proper_antialiasing=self.renderer.PROPER_ANTIALIASING,
            use_original_3d_filter=g.use_original_3d_filter,
            use_optimized_3d_filter=g.use_optimized_3d_filter,
            update_densification_info=update_densification,
            inject_noise=self.USE_MCMC,
            use_random_background=self.USE_RANDOM_BACKGROUND_COLOR,
            instance_cap=self.INSTANCE_CAP,
            chunk=self.BLEND_CHUNK,
            views_per_step=max(int(self.VIEWS_PER_STEP), 1),
            loss_weights=LossWeights(
                lambda_l1=self.LOSS.LAMBDA_L1,
                lambda_dssim=self.LOSS.LAMBDA_DSSIM,
                lambda_opacity_reg=self.LOSS.LAMBDA_OPACITY_REGULARIZATION,
                lambda_scale_reg=self.LOSS.LAMBDA_SCALE_REGULARIZATION,
            ),
            temporal=getattr(g, 'is_temporal', False),
            use_pallas=self.USE_PALLAS_BLEND,
        )

    # ------------------------------------------------------------------ #
    # pre-training (reference: Trainer.py:81-109)
    # ------------------------------------------------------------------ #
    @pre_training_callback(priority=50)
    def create_sampler(self, _, dataset) -> None:
        self.train_sampler = np.random.default_rng(self.SEED)
        self.device_data = dataset.to_device_dataset()

    @pre_training_callback(priority=40)
    def setup_gaussians(self, _, dataset) -> None:
        if self.LOAD_CHECKPOINT:
            # resume: restore full state (params + Adam moments + counters);
            # the model is 'pretrained' — full SH degree active immediately
            # (reference Model.py:550-553)
            from fastergs_tpu.models.checkpoint import load_checkpoint
            load_checkpoint(self.LOAD_CHECKPOINT, self.model)
            g = self.model.gaussians
            views = dataset.train_views
            centers = np.stack([v.position for v in views])
            radius = float(1.1 * np.max(np.linalg.norm(
                centers - centers.mean(axis=0), axis=1)))
            g.training_setup(self.OPTIMIZER, self.DENSIFICATION_PERCENT_DENSE,
                             radius)
            self.start_iteration = self.model.num_iterations_trained
            log_info(f'resumed from {self.LOAD_CHECKPOINT} at iteration '
                     f'{self.start_iteration:,} with {g.n_active:,} Gaussians')
            if self.FILTER_3D.USE:
                g.setup_3d_filter(self.FILTER_3D, views)
            return
        views = dataset.train_views
        centers = np.stack([v.position for v in views])
        radius = float(1.1 * np.max(np.linalg.norm(
            centers - centers.mean(axis=0), axis=1)))
        log_info(f'training cameras extent: {radius:.2f}')

        if dataset.point_cloud is not None and not self.RANDOM_INITIALIZATION.FORCE:
            positions, colors = dataset.point_cloud
        else:
            from fastergs_tpu.utils.carving import carve
            rng = np.random.default_rng(self.SEED)
            bb_min, bb_size = dataset.bounding_box()
            samples = rng.random((self.RANDOM_INITIALIZATION.N_POINTS, 3),
                                 dtype=np.float32)
            positions = samples * bb_size + bb_min
            if self.RANDOM_INITIALIZATION.ENABLE_CARVING:
                positions = carve(
                    positions, views,
                    self.RANDOM_INITIALIZATION.CARVING_IN_ALL_FRUSTUMS,
                    self.RANDOM_INITIALIZATION.CARVING_ENFORCE_ALPHA)
            colors = None
        g = self.model.gaussians
        g.initialize_from_point_cloud(positions, colors, self.USE_MCMC)
        g.training_setup(self.OPTIMIZER, self.DENSIFICATION_PERCENT_DENSE, radius)
        if not self.USE_MCMC:
            g.reset_densification_info()
        if self.FILTER_3D.USE:
            g.setup_3d_filter(self.FILTER_3D, views)

    # ------------------------------------------------------------------ #
    # periodic maintenance (reference: Trainer.py:111-165)
    # ------------------------------------------------------------------ #
    @training_callback(priority=110, start_iteration=1000, iteration_stride=1000)
    def increase_sh_degree(self, *_) -> None:
        self.model.gaussians.increase_used_sh_degree()

    @training_callback(priority=100, start_iteration='DENSIFICATION_START_ITERATION',
                       end_iteration='DENSIFICATION_END_ITERATION',
                       iteration_stride='DENSIFICATION_INTERVAL')
    def densify(self, iteration: int, dataset) -> None:
        g = self.model.gaussians
        if self.USE_MCMC:
            g.mcmc_densification(self._next_key(), min_opacity=0.005,
                                 cap_max=self.MAX_PRIMITIVES)
        else:
            g.adaptive_density_control(
                self._next_key(), self.DENSIFICATION_GRAD_THRESHOLD, 0.005,
                iteration > self.OPACITY_RESET_INTERVAL)
            sp = self.SPEEDYSPLAT_PRUNING
            if (sp.USE and sp.START_ITERATION <= iteration < sp.END_ITERATION
                    and iteration % sp.INTERVAL == 0):
                scores = self.renderer.compute_pruning_scores(dataset)
                g.importance_pruning(scores, pruning_ratio=sp.SOFT_PRUNING_RATIO)
            if iteration < self.DENSIFICATION_END_ITERATION:
                g.reset_densification_info()
        if self.FILTER_3D.USE:
            g.compute_3d_filter(dataset.train_views)
        self._maybe_grow_instance_cap()

    @training_callback(priority=99, end_iteration='MORTON_ORDERING_END_ITERATION',
                       iteration_stride='MORTON_ORDERING_INTERVAL')
    def morton_ordering(self, iteration: int, *_) -> None:
        if iteration > 0:
            self.model.gaussians.apply_morton_ordering()

    @training_callback(active='FILTER_3D.USE', priority=95,
                       start_iteration='DENSIFICATION_END_ITERATION',
                       iteration_stride=100)
    def recompute_3d_filter(self, iteration: int, dataset) -> None:
        if (self.DENSIFICATION_END_ITERATION < iteration
                < self.NUM_ITERATIONS - 100):
            self.model.gaussians.compute_3d_filter(dataset.train_views)

    @training_callback(priority=90, start_iteration='OPACITY_RESET_INTERVAL',
                       end_iteration='DENSIFICATION_END_ITERATION',
                       iteration_stride='OPACITY_RESET_INTERVAL')
    def reset_opacities(self, *_) -> None:
        if not self.USE_MCMC:
            self.model.gaussians.reset_opacities()

    @training_callback(priority=90, start_iteration='EXTRA_OPACITY_RESET_ITERATION',
                       end_iteration='EXTRA_OPACITY_RESET_ITERATION')
    def reset_opacities_extra(self, _, dataset) -> None:
        if not self.USE_MCMC and float(np.sum(dataset.background_color)) != 0.0:
            log_info('resetting opacities one additional time because using '
                     'non-black background')
            self.model.gaussians.reset_opacities()

    # ------------------------------------------------------------------ #
    # hot loop (reference: Trainer.py:167-196)
    # ------------------------------------------------------------------ #
    @training_callback(priority=80)
    def training_iteration(self, iteration: int, dataset) -> None:
        g = self.model.gaussians
        g.update_learning_rate(iteration + 1)
        update_densify = (not self.USE_MCMC
                          and iteration < self.DENSIFICATION_END_ITERATION)
        statics = self._make_statics(update_densify)
        lrs = {k: jnp.float32(v) for k, v in g.lrs.items()}
        noise_lr = jnp.float32(5e5 * g.lr_means)
        mode = self.PARALLEL_MODE
        if mode == 'views':
            step, n_dev = self._parallel_step(statics)
            views = jnp.asarray([self._sample_view() for _ in range(n_dev)],
                                jnp.int32)
            g.state, metrics = step(g.state, self.device_data, views, lrs,
                                    noise_lr, self._next_key())
        elif mode == 'gaussians':
            step, _ = self._parallel_step(statics)
            g.state, metrics = step(g.state, self.device_data,
                                    jnp.int32(self._sample_view()), lrs,
                                    noise_lr, self._next_key())
        elif mode == 'hybrid':
            step, _ = self._parallel_step(statics)
            dv = self.HYBRID_VIEW_ROWS
            views = jnp.asarray([self._sample_view() for _ in range(dv)],
                                jnp.int32)
            g.state, metrics = step(g.state, self.device_data, views, lrs,
                                    noise_lr, self._next_key())
        else:
            V = statics.views_per_step
            idx = (jnp.asarray([self._sample_view() for _ in range(V)],
                               jnp.int32) if V > 1
                   else jnp.int32(self._sample_view()))
            g.state, metrics = train_step(
                g.state, self.device_data, idx,
                lrs, noise_lr, self._next_key(), statics)
        self._pending_metrics.append((iteration, metrics))
        if (iteration + 1) % self.LOG_INTERVAL == 0:
            self._flush_metrics()

    def _parallel_step(self, statics):
        """Builds (and caches per statics) the multi-chip step for
        PARALLEL_MODE. One view-parallel iteration consumes D views
        (effective batch = D, gradients psum-averaged)."""
        import jax as _jax
        n_dev = len(_jax.devices())
        cache = getattr(self, '_parallel_step_cache', None)
        if cache is None:
            cache = self._parallel_step_cache = {}
        key = (self.PARALLEL_MODE, statics)
        if key not in cache:
            if self.PARALLEL_MODE == 'views':
                from fastergs_tpu.parallel.data_parallel import (
                    make_mesh, make_view_parallel_train_step)
                cache[key] = make_view_parallel_train_step(
                    make_mesh(n_dev), statics)
            elif self.PARALLEL_MODE == 'hybrid':
                from fastergs_tpu.parallel.gaussian_parallel import (
                    make_hybrid_mesh, make_hybrid_parallel_train_step)
                dv = self.HYBRID_VIEW_ROWS
                if n_dev % dv:
                    raise ValueError(f'{n_dev} devices not divisible by '
                                     f'HYBRID_VIEW_ROWS={dv}')
                cache[key] = make_hybrid_parallel_train_step(
                    make_hybrid_mesh(dv, n_dev // dv),
                    statics)(self.model.gaussians.state)
            else:
                from fastergs_tpu.parallel.gaussian_parallel import (
                    make_gaussian_parallel_train_step, make_mesh)
                cache[key] = make_gaussian_parallel_train_step(
                    make_mesh(n_dev), statics)(self.model.gaussians.state)
        return cache[key], n_dev

    def _flush_metrics(self) -> None:
        if not self._pending_metrics:
            return
        # host pulls happen only here, LOG_INTERVAL-batched (keeps the device
        # queue deep; the reference pulls loss every iteration, Loss.py:19).
        # Fused windows carry STACKED (n_steps,) metric leaves — they unroll
        # to one metrics_history entry per iteration, matching the
        # reference's per-iteration PSNR granularity exactly
        new_rows = []
        recent = 0
        for it, m in self._pending_metrics:
            host = {k: np.asarray(v) for k, v in m.items()}
            n = max((v.shape[0] for v in host.values() if v.ndim), default=1)
            for i in range(n):
                rec = {k: float(v[i] if v.ndim else v)
                       for k, v in host.items()}
                self._instance_watermark = max(
                    self._instance_watermark, int(rec['n_rect_instances']))
                recent = max(recent, int(rec['n_rect_instances']))
                self.metrics_history.append((it + i, rec))
                new_rows.append((it + i, rec))
        if recent:
            # max demand over THIS flush batch only (≥ LOG_INTERVAL
            # iterations ≈ several epochs of views) — the cap-trim signal,
            # immune to stale pre-pruning peaks unlike the running watermark
            self._recent_demand = recent
        self._pending_metrics.clear()
        self._append_metrics_jsonl(new_rows)

    def _append_metrics_jsonl(self, rows) -> None:
        """Streams metric rows to disk incrementally: a killed/timed-out run
        keeps its curve up to the last flush (finalize rewrites the file
        once with the complete history)."""
        if not rows:
            return
        import json
        import os
        mpath = os.path.join(str(self.output_directory), 'metrics.jsonl')
        with open(mpath, 'a') as f:
            for it, rec in rows:
                f.write(json.dumps({'iteration': it, **rec}) + '\n')

    def _maybe_grow_instance_cap(self) -> None:
        self._flush_metrics()
        if self._instance_watermark > 0.8 * self.INSTANCE_CAP:
            self.INSTANCE_CAP = _grow_capacity(int(self._instance_watermark * GROWTH_HEADROOM))
            log_warning(f'instance buffer watermark '
                        f'{self._instance_watermark:,} — growing capacity to '
                        f'{self.INSTANCE_CAP:,}')

    @training_callback(priority=60, start_iteration=2000,
                       iteration_stride=1000)
    def trim_instance_cap(self, iteration: int, *_) -> None:
        """Cap trim: the growth-only watermark policy RATCHETS on transient
        demand spikes (measured in the garden run: an MCMC churn spike to
        7.2M instances held the cap at 10.8M while demand settled to 4.2M,
        taxing every later step ~1.9x — every linear-in-instances stage
        runs at the static cap). Re-tighten to recent demand whenever that
        frees >= 25% of the cap (hysteresis: one recompile must buy
        >= 1.33x step speed for >= 1000 iterations — clearly profitable,
        and thrash-proof since each trim requires a real demand drop).
        Trimming is safe: a later heavier view overflows the tighter cap
        and the fused-window replay grows it back losslessly."""
        self._flush_metrics()
        recent = getattr(self, '_recent_demand', 0)
        if not recent:
            return
        target = _grow_capacity(int(recent * 1.15))
        if target <= 0.75 * self.INSTANCE_CAP:
            log_info(f'instance demand settled at {recent:,} — trimming '
                     f'capacity {self.INSTANCE_CAP:,} -> {target:,}')
            self.INSTANCE_CAP = target
            self._instance_watermark = recent
        elif recent > self.INSTANCE_CAP:
            # post-densification drift upward (no densify callback polls
            # the watermark anymore): grow — in non-fused mode there is no
            # overflow replay, so this poll is the only guard
            self.INSTANCE_CAP = target
            log_warning(f'instance demand {recent:,} exceeds capacity — '
                        f'growing to {target:,}')

    @training_callback(active='RUN_VALIDATION', priority=8,
                       iteration_stride='VALIDATION_INTERVAL')
    def validate(self, iteration: int, dataset) -> None:
        if iteration == 0 or not dataset.test_views:
            return
        from fastergs_tpu.ops.ssim import psnr
        self._flush_metrics()
        vals = [float(psnr(self.renderer.render_image(
                    v, to_chw=True, benchmark=True)['rgb'],
                jnp.asarray(v.rgb))) for v in dataset.test_views]
        log_info(f'[it {iteration}] validation PSNR: '
                 f'{float(np.mean(vals)):.3f} dB over {len(vals)} views')
        row = (iteration, {'val_psnr': float(np.mean(vals))})
        self.metrics_history.append(row)
        self._append_metrics_jsonl([row])

    @training_callback(priority=5, iteration_stride='BACKUP.INTERVAL')
    def periodic_checkpoint(self, iteration: int, *_) -> None:
        if self.BACKUP.INTERVAL <= 0 or iteration == 0:
            return
        import os
        from fastergs_tpu.models.checkpoint import save_checkpoint
        self.model.num_iterations_trained = iteration
        path = os.path.join(str(self.output_directory),
                            f'checkpoint_{iteration:06d}.npz')
        save_checkpoint(path, self.model, self)
        log_info(f'checkpoint written to {path}')

    @training_callback(active='SPEEDYSPLAT_PRUNING.USE', priority=70,
                       start_iteration='SPEEDYSPLAT_PRUNING.START_ITERATION',
                       end_iteration='SPEEDYSPLAT_PRUNING.END_ITERATION',
                       iteration_stride='SPEEDYSPLAT_PRUNING.INTERVAL')
    def hard_pruning(self, iteration: int, dataset) -> None:
        if iteration >= (self.DENSIFICATION_END_ITERATION
                         + self.DENSIFICATION_INTERVAL):
            scores = self.renderer.compute_pruning_scores(dataset)
            self.model.gaussians.importance_pruning(
                scores, pruning_ratio=self.SPEEDYSPLAT_PRUNING.HARD_PRUNING_RATIO)

    @training_callback(active='WANDB.ACTIVATE', priority=10,
                       iteration_stride='WANDB.INTERVAL')
    def log_wandb(self, iteration: int, *_) -> None:
        """#Gaussians + latest loss metrics to W&B (reference:
        Trainer.py:206-214; JSONL fallback when wandb is unavailable)."""
        from fastergs_tpu.utils import wandb_facade
        if not getattr(self, '_wandb_started', False):
            wandb_facade.init(project=self.WANDB.PROJECT,
                              entity=self.WANDB.ENTITY,
                              output_dir=str(self.output_directory))
            self._wandb_started = True
        self._flush_metrics()
        record = {'#Gaussians': self.model.gaussians.n_active}
        if self.metrics_history:
            record.update(self.metrics_history[-1][1])
        wandb_facade.log(record, step=iteration)

    # ------------------------------------------------------------------ #
    @post_training_callback(priority=1000)
    def finalize(self, *_) -> None:
        self._flush_metrics()
        n = self.model.gaussians.training_cleanup(
            min_opacity=self.MIN_OPACITY_AFTER_TRAINING)
        log_info(f'final number of Gaussians: {n:,}')
        import os
        path = os.path.join(str(self.output_directory), 'n_gaussians.txt')
        with open(path, 'w') as f:
            f.write(f'Final number of Gaussians: {n:,}\n\n'
                    f'N_Gaussians:{n}')
        # persist the full per-iteration metric history (the reference
        # streams per-iteration loss/PSNR to wandb, Trainer.py:206-214;
        # here every run leaves the curve on disk regardless of wandb).
        # A RESUMED run must not rewrite: the file already holds the
        # pre-crash prefix that this process's in-memory history lacks —
        # the incremental appends are the record in that case
        if self.start_iteration == 0:
            import json
            mpath = os.path.join(str(self.output_directory), 'metrics.jsonl')
            with open(mpath, 'w') as f:
                for it, rec in self.metrics_history:
                    f.write(json.dumps({'iteration': it, **rec}) + '\n')

    # ------------------------------------------------------------------ #
    # fused execution: batch hot-loop iterations between maintenance events
    # into one device dispatch (amortizes tunneled-TPU dispatch latency)
    # ------------------------------------------------------------------ #
    def _non_hot_due(self, iteration: int) -> list:
        return [fn for fn in self.callbacks.due_training_callbacks(iteration)
                if fn.__name__ != 'training_iteration']

    def _fusable_window(self, iteration: int, max_window: int = 100) -> int:
        """Number of consecutive iterations from `iteration` during which only
        the hot loop runs (and the densification-info flag is constant)."""
        end = min(iteration + max_window, self.NUM_ITERATIONS)
        # don't cross the update_densification_info flag flip
        if iteration < self.DENSIFICATION_END_ITERATION:
            end = min(end, self.DENSIFICATION_END_ITERATION)
        n = 0
        for j in range(iteration, end):
            if j > iteration and self._non_hot_due(j):
                break
            n += 1
        return max(n, 1)

    def _run_fused_window(self, iteration: int, n_steps: int) -> None:
        from fastergs_tpu.engine.train_step import train_steps_fused
        g = self.model.gaussians
        update_densify = (not self.USE_MCMC
                          and iteration < self.DENSIFICATION_END_ITERATION)
        statics = self._make_statics(update_densify)
        view_indices = jnp.asarray(
            [self._sample_view()
             for _ in range(n_steps * statics.views_per_step)], jnp.int32)
        means_lrs = jnp.asarray(
            [float(g.lr_means_scheduler(iteration + 1 + j))
             for j in range(n_steps)], jnp.float32)
        g.update_learning_rate(iteration + n_steps)  # keep host lr in sync
        lrs = {k: jnp.float32(v) for k, v in g.lrs.items()}
        key = self._next_key()
        # snapshot: the dispatch donates g.state, and a mid-window instance
        # overflow silently drops splats (the reference instead sizes buffers
        # exactly every frame, forward.cu:99-102) — if the window's demand
        # exceeded the cap we grow it and REPLAY the window from this copy
        backup = jax.tree_util.tree_map(
            lambda x: x.copy() if hasattr(x, 'copy') else x, g.state)
        new_state, metrics = train_steps_fused(
            g.state, self.device_data, view_indices, lrs, means_lrs,
            key, statics)
        demand = int(jnp.max(metrics['n_rect_instances']))
        self._instance_watermark = max(self._instance_watermark, demand)
        if demand > self.INSTANCE_CAP:
            self.INSTANCE_CAP = _grow_capacity(int(demand * GROWTH_HEADROOM))
            log_warning(
                f'instance overflow inside fused window at iteration '
                f'{iteration:,} (demand {demand:,} > cap) — growing capacity '
                f'to {self.INSTANCE_CAP:,} and replaying the window')
            statics = self._make_statics(update_densify)
            new_state, metrics = train_steps_fused(
                backup, self.device_data, view_indices, lrs, means_lrs,
                key, statics)
        g.state = new_state
        # stacked (n_steps,) leaves: flush unrolls one entry per iteration
        self._pending_metrics.append((iteration, metrics))
        if (iteration + n_steps) % self.LOG_INTERVAL < n_steps:
            self._flush_metrics()

    # window sizes are quantized so each (size, statics) pair compiles once —
    # arbitrary sizes would blow up the jit cache (every scan length is a new
    # executable, and remote compiles cost minutes)
    _FUSE_SIZES = (64, 16, 4, 1)

    def run(self, dataset, fuse: bool = True) -> None:
        """The outer driver loop (host train.py equivalent)."""
        if self.PARALLEL_MODE != 'none':
            fuse = False  # multi-chip steps dispatch per iteration
        self.callbacks.run_pre(dataset)
        t0 = time.perf_counter()
        iteration = self.start_iteration
        while iteration < self.NUM_ITERATIONS:
            if fuse and not self._non_hot_due(iteration):
                n = self._fusable_window(iteration)
                size = next(s for s in self._FUSE_SIZES if s <= n)
                self._run_fused_window(iteration, size)
                iteration += size
            else:
                self.callbacks.run_training(iteration, dataset)
                iteration += 1
        # make sure all device work is done before timing
        jax.block_until_ready(self.model.gaussians.state.params['means'])
        elapsed = time.perf_counter() - t0
        n_done = self.NUM_ITERATIONS - self.start_iteration
        self.iters_per_sec = n_done / max(elapsed, 1e-9)
        self.model.num_iterations_trained = self.NUM_ITERATIONS
        log_info(f'training: {self.NUM_ITERATIONS} iterations in '
                 f'{elapsed:.1f}s ({self.iters_per_sec:.1f} it/s)')
        self.callbacks.run_post(self.NUM_ITERATIONS, dataset)
