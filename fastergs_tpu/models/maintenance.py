"""Jitted maintenance kernels over padded-capacity Gaussian state.

TPU-native redesign of the reference's dynamic-shape model surgery
(reference: Model.py:258-473 + host Optim.adam_utils). The reference
resizes parameter tensors and surgically rebuilds torch.optim.Adam state on
every densify/prune/sort (replace/prune/extend/sort_param_groups,
Model.py:269,274,290,336). Here all state lives at a fixed capacity CAP with
the first `n_active` rows valid, and every operation is a static-shaped
gather/scatter applied to parameters AND Adam moments together — no
recompilation, no reallocation, fully jittable.

Layout invariant: active rows are always compacted to the front
(active mask == arange(CAP) < n_active). Pruning preserves relative order
(like boolean-mask indexing in the reference); extension appends.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from fastergs_tpu.ops.adam import AdamState
from fastergs_tpu.ops.math import logit, sigmoid, quaternion_to_rotation_matrix
from fastergs_tpu.ops.mcmc import relocation_adjustment
from fastergs_tpu.ops.morton import morton_encode

PARAM_NAMES = ('means', 'sh_coefficients_0', 'sh_coefficients_rest',
               'opacities', 'scales', 'rotations')


class ModelState(NamedTuple):
    """Full trainable state at padded capacity (a pytree)."""
    params: dict                  # name -> (CAP, ...) arrays
    adam: AdamState
    densification_info: jnp.ndarray  # (2, CAP): [visibility count, grad-norm sum]
    filter_3d: jnp.ndarray           # (CAP,) interpretation depends on filter mode
    n_active: jnp.ndarray            # () int32


def active_mask(state: ModelState) -> jnp.ndarray:
    cap = state.params['means'].shape[0]
    return jnp.arange(cap, dtype=jnp.int32) < state.n_active


def _map_rows(fn, state: ModelState) -> ModelState:
    """Applies a row-wise array transform to params, moments and aux buffers."""
    params = {k: fn(v) for k, v in state.params.items()}
    mu = {k: fn(v) for k, v in state.adam.mu.items()}
    nu = {k: fn(v) for k, v in state.adam.nu.items()}
    info = jax.vmap(fn)(state.densification_info)
    filt = fn(state.filter_3d)
    return state._replace(params=params,
                          adam=state.adam._replace(mu=mu, nu=nu),
                          densification_info=info, filter_3d=filt)


def apply_ordering(state: ModelState, order: jnp.ndarray) -> ModelState:
    """Permutes all row-indexed state (reference: sort_param_groups usage,
    Model.py:288-302)."""
    return _map_rows(lambda a: a[order], state)


def compact(state: ModelState, keep: jnp.ndarray) -> ModelState:
    """Removes rows where ~keep among the active set, preserving order
    (reference: prune_param_groups usage, Model.py:271-286)."""
    keep = keep & active_mask(state)
    order = jnp.argsort(jnp.logical_not(keep), stable=True)
    state = apply_ordering(state, order)
    return state._replace(n_active=jnp.sum(keep).astype(jnp.int32))


def morton_sort(state: ModelState) -> ModelState:
    """Morton-orders the active Gaussians (reference: Model.py:454-458)."""
    codes = morton_encode(state.params['means'], active_mask(state))
    order = jnp.argsort(codes, stable=True)
    return apply_ordering(state, order)


def reset_densification_info(state: ModelState) -> ModelState:
    return state._replace(
        densification_info=jnp.zeros_like(state.densification_info))


def reset_opacities(state: ModelState, use_original_3d_filter: bool) -> ModelState:
    """Clamps opacities to <= logit(0.01), compensating for the original
    3D-filter folding if active (reference: Model.py:258-269). The host's
    replace_param_group_data resets the group's Adam moments."""
    op = state.params['opacities']
    new_op = jnp.minimum(op, -4.595119953155518)  # logit(0.01), Model.py:260
    if use_original_3d_filter:
        var = jnp.exp(2.0 * state.params['scales'])
        var_f = var + state.filter_3d[:, None]
        coef = jnp.sqrt(jnp.prod(var, axis=1) / jnp.prod(var_f, axis=1))
        new_op = logit(sigmoid(new_op) / jnp.maximum(coef[:, None], 1e-12),
                       eps=1e-6)
    params = dict(state.params, opacities=new_op)
    mu = dict(state.adam.mu, opacities=jnp.zeros_like(new_op))
    nu = dict(state.adam.nu, opacities=jnp.zeros_like(new_op))
    return state._replace(params=params,
                          adam=state.adam._replace(mu=mu, nu=nu))


def _scatter_rows(state: ModelState, src_rows: dict, dst: jnp.ndarray,
                  zero_moments_at_dst: bool = True) -> ModelState:
    """Writes rows (dict of (CAP, ...) source-aligned arrays) to dst slots.

    dst entries >= CAP are dropped (the standard overflow/sentinel pattern).
    Newly written rows get zero Adam moments — matching extend_param_groups
    appending zero state in the reference host.
    """
    params = {k: v.at[dst].set(src_rows[k], mode='drop')
              for k, v in state.params.items()}
    adam = state.adam
    if zero_moments_at_dst:
        mu = {k: v.at[dst].set(jnp.zeros_like(src_rows[k]), mode='drop')
              for k, v in adam.mu.items()}
        nu = {k: v.at[dst].set(jnp.zeros_like(src_rows[k]), mode='drop')
              for k, v in adam.nu.items()}
        adam = adam._replace(mu=mu, nu=nu)
    return state._replace(params=params, adam=adam)


def adaptive_density_control(
    state: ModelState,
    key: jax.Array,
    grad_threshold: float,
    min_opacity: float,
    prune_large_gaussians: jnp.ndarray,   # () bool
    percent_dense: float,
    cameras_extent: float,
) -> tuple[ModelState, jnp.ndarray]:
    """3DGS adaptive density control: duplicate small / split large / prune
    (reference: Model.py:307-361). Returns (new state, requested row count —
    if it exceeds CAP the caller should grow capacity and the overflowing
    clones were dropped this round).
    """
    cap = state.params['means'].shape[0]
    act = active_mask(state)
    info = state.densification_info
    densify = (info[1] >= grad_threshold * jnp.maximum(info[0], 1.0)) & act
    is_small = (jnp.max(state.params['scales'], axis=1)
                <= jnp.log(percent_dense * cameras_extent))
    dup = densify & is_small
    split = densify & ~is_small

    n_act = state.n_active
    # --- duplicate small (Model.py:313-320): straight copies appended ---
    dup_rank = jnp.cumsum(dup) - 1
    dup_dst = jnp.where(dup, n_act + dup_rank, cap).astype(jnp.int32)
    state1 = _scatter_rows(state, state.params, dup_dst)
    n_dup = jnp.sum(dup).astype(jnp.int32)

    # --- split large (Model.py:323-332): two offset copies, scales/1.6 ---
    scales_lin = jnp.exp(state.params['scales'])
    R = quaternion_to_rotation_matrix(state.params['rotations'])
    k1, k2 = jax.random.split(key)
    split_rank = jnp.cumsum(split) - 1
    base = n_act + n_dup
    new_scales = state.params['scales'] + jnp.log(0.625)  # 1/1.6, Model.py:329
    for copy_idx, kk in enumerate((k1, k2)):
        eps = jax.random.normal(kk, scales_lin.shape)
        offset = jnp.einsum('nij,nj->ni', R, scales_lin * eps)
        rows = dict(state.params)
        rows['means'] = state.params['means'] + offset
        rows['scales'] = new_scales
        dst = jnp.where(split, base + 2 * split_rank + copy_idx, cap).astype(jnp.int32)
        state1 = _scatter_rows(state1, rows, dst)
    n_split = jnp.sum(split).astype(jnp.int32)

    n_requested = n_act + n_dup + 2 * n_split
    n_new_active = jnp.minimum(n_requested, cap)
    state1 = state1._replace(n_active=n_new_active.astype(jnp.int32))

    # --- prune (Model.py:356-361): split originals, transparent, degenerate,
    # optionally oversized ---
    p = state1.params
    prune = split  # originals of split Gaussians (new rows have split=False)
    prune |= p['opacities'][:, 0] < jnp.log(min_opacity / (1.0 - min_opacity))
    prune |= jnp.sum(p['rotations'] ** 2, axis=1) < 1e-8
    prune |= (prune_large_gaussians
              & (jnp.max(p['scales'], axis=1)
                 > jnp.log(0.1 * cameras_extent)))
    state2 = compact(state1, ~prune)
    # densification info / 3D filter are invalid now (Model.py:351-353)
    state2 = reset_densification_info(state2)
    return state2, n_requested


def _sample_categorical_by_opacity(key, opacities, eligible, cap):
    logits = jnp.where(eligible, jnp.log(jnp.maximum(opacities, 1e-12)), -jnp.inf)
    return jax.random.categorical(key, logits, shape=(cap,)).astype(jnp.int32)


def mcmc_densification(
    state: ModelState,
    key: jax.Array,
    min_opacity: float,
    cap_max: jnp.ndarray,  # () int32 — MAX_PRIMITIVES
) -> tuple[ModelState, jnp.ndarray]:
    """MCMC relocation + capped growth (reference: Model.py:363-452).

    Returns (new state, requested count). Relocation: dead (transparent or
    degenerate) Gaussians are replaced by copies of alive ones sampled with
    probability ∝ opacity, with Eq.-9 opacity/scale adjustment applied to
    both the source and the copy; Adam moments of the sampled sources are
    reset (Model.py:400-401). Growth: +5% per call up to the cap.
    """
    cap = state.params['means'].shape[0]
    k_dead, k_grow = jax.random.split(key)
    min_logit = jnp.log(min_opacity / (1.0 - min_opacity))
    eps32 = jnp.float32(1.1920929e-07)  # torch.finfo(float32).eps

    def relocate_phase(st: ModelState, kk, dead, dst_slots, n_moved):
        """Shared machinery: copy sampled→dst with Eq.-9 adjustment."""
        act = active_mask(st)
        p = st.params
        op_act = sigmoid(p['opacities'][:, 0])
        alive = act & ~dead
        samples = _sample_categorical_by_opacity(kk, op_act, alive, cap)
        # counts: times each source was sampled among the moved slots, +1
        moved = jnp.arange(cap, dtype=jnp.int32) < n_moved
        sampled_slot = jnp.where(moved, samples, cap)
        hist = jnp.zeros(cap, jnp.int32).at[sampled_slot].add(1, mode='drop')
        counts = hist[samples] + 1
        new_op, new_scales = relocation_adjustment(
            op_act[samples], jnp.exp(p['scales'][samples]), counts)
        new_op_raw = logit(jnp.clip(new_op, min_opacity, 1.0 - eps32))[:, None]
        new_scales_raw = jnp.log(jnp.maximum(new_scales, 1e-20))

        # adjust the sampled sources in place (Model.py:388-390, 427-429)
        src_write = jnp.where(moved, samples, cap)
        params = dict(p)
        params['opacities'] = p['opacities'].at[src_write].set(
            new_op_raw, mode='drop')
        params['scales'] = p['scales'].at[src_write].set(
            new_scales_raw, mode='drop')

        # copy sampled rows (with adjusted values) into the destination slots
        rows = {k: v[samples] for k, v in p.items()}
        rows['opacities'] = new_op_raw
        rows['scales'] = new_scales_raw
        st = st._replace(params=params)
        st = _scatter_rows(st, rows, jnp.where(moved, dst_slots, cap))

        # reset Adam moments of the sampled sources (Model.py:400-401)
        mu = {k: v.at[src_write].set(jnp.zeros_like(v[samples]), mode='drop')
              for k, v in st.adam.mu.items()}
        nu = {k: v.at[src_write].set(jnp.zeros_like(v[samples]), mode='drop')
              for k, v in st.adam.nu.items()}
        return st._replace(adam=st.adam._replace(mu=mu, nu=nu))

    # --- phase 1: relocate dead Gaussians (Model.py:366-405) ---
    act = active_mask(state)
    p = state.params
    dead = act & ((p['opacities'][:, 0] <= min_logit)
                  | (jnp.sum(p['rotations'] ** 2, axis=1) < 1e-8))
    n_dead = jnp.sum(dead).astype(jnp.int32)
    dead_rank = jnp.cumsum(dead) - 1
    # dst slot for the i-th moved row = i-th dead slot
    dead_slots = jnp.nonzero(dead, size=cap, fill_value=cap)[0].astype(jnp.int32)
    state = jax.lax.cond(
        n_dead > 0,
        lambda st: relocate_phase(st, k_dead, dead, dead_slots, n_dead),
        lambda st: st, state)
    del dead_rank

    # --- phase 2: grow 5% up to the cap (Model.py:407-452) ---
    n_act = state.n_active
    n_target = jnp.minimum(cap_max, (1.05 * n_act.astype(jnp.float32)).astype(jnp.int32))
    n_target = jnp.minimum(n_target, cap)
    n_add = jnp.maximum(0, n_target - n_act)
    grow_slots = n_act + jnp.arange(cap, dtype=jnp.int32)
    no_dead = jnp.zeros(cap, bool)
    state = jax.lax.cond(
        n_add > 0,
        lambda st: relocate_phase(st, k_grow, no_dead, grow_slots, n_add),
        lambda st: st, state)
    state = state._replace(n_active=(n_act + n_add).astype(jnp.int32))
    n_requested = n_act + n_add
    return state, n_requested


def importance_pruning(state: ModelState, scores: jnp.ndarray,
                       pruning_ratio: float) -> ModelState:
    """Prunes the lowest-scoring fraction (reference: Model.py:460-465,
    torch.kthvalue semantics: k-th smallest, prune scores <= threshold)."""
    act = active_mask(state)
    n = state.n_active
    k = (pruning_ratio * (n - 1).astype(jnp.float32)).astype(jnp.int32) + 1
    sorted_scores = jnp.sort(jnp.where(act, scores, jnp.inf))
    threshold = sorted_scores[jnp.maximum(k - 1, 0)]
    prune = act & (scores <= threshold)
    return compact(state, ~prune)


def training_cleanup_prune(state: ModelState, min_opacity: float,
                           opacities_activated: jnp.ndarray) -> ModelState:
    """Post-training prune of transparent/degenerate Gaussians
    (reference: Model.py:492-495) followed by Morton ordering."""
    p = state.params
    prune = opacities_activated < min_opacity
    prune |= jnp.sum(p['rotations'] ** 2, axis=1) < 1e-8
    state = compact(state, ~prune)
    return morton_sort(state)
