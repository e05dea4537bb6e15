"""Probe: how clustered are OWNER ids along the tile-sorted stream?

Decides the FasterGSFused reduction design (VERDICT r4 ask #3). The
backward's per-instance gradient rows arrive in tile order; the current
reduction owner-sorts them first (ops/segreduce.py). A sort-free windowed
accumulation (accumulate into per-owner-window VMEM tiles while walking
the stream) is viable only if each STEP-instance chunk touches FEW
distinct W-wide owner windows — this script measures that distribution on
the bench workload, for the current id numbering AND for a Morton
renumbering of the Gaussians (the trainer Morton-sorts every 5k
iterations, so the Morton stats are what production would see).

Usage: python tools/measure_owner_clustering.py [n_gaussians]
CPU-friendly (numpy after a small jax preprocess).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ['JAX_PLATFORMS'] = 'cpu'   # force: the session env pins axon

import numpy as np
import jax
import jax.numpy as jnp

from bench import WIDTH, HEIGHT, INSTANCE_CAP, N_GAUSSIANS
from fastergs_tpu.ops.projection import CameraParams, preprocess
from fastergs_tpu.ops.tiles import build_tile_instances_compact
from fastergs_tpu.ops.morton import morton_encode


def window_stats(own: np.ndarray, n: int, step: int, w: int):
    """own: owner id per tile-sorted instance (sentinel == n dropped)."""
    live = own < n
    own = own[live]
    n_inst = own.shape[0]
    n_steps = n_inst // step
    own = own[:n_steps * step].reshape(n_steps, step)
    win = np.sort(own // w, axis=1)
    counts = 1 + (np.diff(win, axis=1) != 0).sum(axis=1)
    return dict(mean=float(counts.mean()), p50=float(np.percentile(counts, 50)),
                p90=float(np.percentile(counts, 90)),
                p99=float(np.percentile(counts, 99)),
                max=int(counts.max()), n_inst=n_inst,
                total_window_visits=int(counts.sum()), n_steps=n_steps)


def main():
    n_g = int(sys.argv[1]) if len(sys.argv) > 1 else N_GAUSSIANS
    # bench.py's scene + camera WITHOUT rendering GT views (the oracle blend
    # at garden res takes tens of minutes on CPU; only owners are needed)
    from fastergs_tpu.data.synthetic import random_gaussian_scene, ring_cameras
    from fastergs_tpu.models.gaussians import FasterGSModel
    scene = random_gaussian_scene(n_g, seed=0)
    model = FasterGSModel(sh_degree=3).build()
    model.gaussians.initialize_from_point_cloud(
        scene['means'], None, use_mcmc=False)
    g = model.gaussians
    view = ring_cameras(4, radius=4.6, width=WIDTH, height=HEIGHT,
                        focal=0.55 * WIDTH)[0]
    camp = CameraParams.from_view(view)  # view carries WIDTHxHEIGHT

    def owners_for(means, scales, rots, ops_, sh0, shr):
        prims = preprocess(
            means, scales, rots, ops_, sh0, shr, camp, active_sh_bases=16)
        inst = build_tile_instances_compact(
            prims, -(-WIDTH // 16), -(-HEIGHT // 16), INSTANCE_CAP)
        return inst.gaussian_idx

    own = np.asarray(owners_for(
        g.means, g.raw_scales, g.raw_rotations, g.raw_opacities,
        g.sh_coefficients_0, g.sh_coefficients_rest))
    n = g.means.shape[0]

    # Morton renumbering: owner id -> morton rank (what production ids look
    # like after the periodic morton_ordering callback)
    codes = np.asarray(morton_encode(g.means))
    rank = np.empty(n, np.int64)
    rank[np.argsort(codes, kind='stable')] = np.arange(n)
    own_m = np.where(own < n, rank[np.minimum(own, n - 1)], n).astype(np.int64)

    for step, w in ((512, 512), (512, 2048)):
        s_raw = window_stats(own.astype(np.int64), n, step, w)
        s_mor = window_stats(own_m, n, step, w)
        print(f'STEP={step} W={w}')
        print(f'  raw id   : {s_raw}')
        print(f'  morton id: {s_mor}')
    print(f'n_gaussians={n} (requested {n_g})')


if __name__ == '__main__':
    main()
