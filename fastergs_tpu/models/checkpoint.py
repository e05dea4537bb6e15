"""Checkpoint save/load.

The reference delegates checkpointing to the NeRFICG host (BACKUP config
keys, BaseModel.num_iterations_trained — SURVEY.md §6). This standalone
equivalent serializes the full padded ModelState (params + Adam moments +
densification info + 3D filter + n_active) plus trainer metadata to a
single .npz, and restores a model marked `pretrained` (full SH degree
active immediately, reference Model.py:550-553).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from fastergs_tpu.models.maintenance import ModelState
from fastergs_tpu.ops.adam import AdamState


def save_checkpoint(path: str, model, trainer=None) -> None:
    g = model.gaussians
    st = g.state
    arrays = {}
    for k, v in st.params.items():
        arrays[f'params/{k}'] = np.asarray(v)
    for k, v in st.adam.mu.items():
        arrays[f'adam_mu/{k}'] = np.asarray(v)
    for k, v in st.adam.nu.items():
        arrays[f'adam_nu/{k}'] = np.asarray(v)
    arrays['adam_step'] = np.asarray(st.adam.step)
    arrays['densification_info'] = np.asarray(st.densification_info)
    arrays['filter_3d'] = np.asarray(st.filter_3d)
    arrays['n_active'] = np.asarray(st.n_active)
    arrays['meta'] = np.asarray([
        g.max_sh_degree, g.active_sh_degree,
        int(g.use_original_3d_filter), int(g.use_optimized_3d_filter),
        getattr(model, 'num_iterations_trained', 0),
    ])
    arrays['meta_f'] = np.asarray([
        g.percent_dense, g.training_cameras_extent, g.distance2filter,
        g.lr_means,
    ], np.float64)
    np.savez_compressed(path, **arrays)


def load_checkpoint(path: str, model) -> None:
    data = np.load(path)
    g = model.gaussians
    names = sorted({k.split('/', 1)[1] for k in data.files
                    if k.startswith('params/')})
    params = {k: jnp.asarray(data[f'params/{k}']) for k in names}
    adam = AdamState(
        mu={k: jnp.asarray(data[f'adam_mu/{k}']) for k in names},
        nu={k: jnp.asarray(data[f'adam_nu/{k}']) for k in names},
        step=jnp.asarray(data['adam_step']))
    g.state = ModelState(
        params=params, adam=adam,
        densification_info=jnp.asarray(data['densification_info']),
        filter_3d=jnp.asarray(data['filter_3d']),
        n_active=jnp.asarray(data['n_active']))
    meta = data['meta']
    g.max_sh_degree = int(meta[0])
    g.active_sh_degree = int(meta[1])
    g.active_sh_bases = (g.active_sh_degree + 1) ** 2
    g.use_original_3d_filter = bool(meta[2])
    g.use_optimized_3d_filter = bool(meta[3])
    model.num_iterations_trained = int(meta[4])
    meta_f = data['meta_f']
    g.percent_dense = float(meta_f[0])
    g.training_cameras_extent = float(meta_f[1])
    g.distance2filter = float(meta_f[2])
    g.lr_means = float(meta_f[3])
    g._sync_n_active()
