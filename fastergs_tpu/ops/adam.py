"""Fused Adam optimizer, functional form.

TPU-native equivalent of the reference's FusedAdam
(reference: torch_bindings/adam.py:10-36, adam/src/adam.cu:10-71). The CUDA
version fuses the whole update into one kernel with host-precomputed bias
corrections; here the update is a single jnp expression per parameter group —
XLA fuses it into one kernel per array, and the bias-correction scalars are
computed in-graph (they're cheap scalars, not a host sync).

The moment arrays live at padded capacity alongside the parameters so the
optimizer-state "surgery" (prune/extend/sort, reference Optim.adam_utils
usage at Model.py:269-448) becomes plain pytree gathers/scatters applied to
params and moments together — see models/gaussians.py.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class AdamConfig(NamedTuple):
    beta1: float = 0.9
    beta2: float = 0.999
    eps: float = 1e-15  # reference: Model.py:243 (FusedAdam(..., eps=1e-15))


class AdamState(NamedTuple):
    mu: dict            # first moments, same pytree structure as params
    nu: dict            # second moments
    step: jnp.ndarray   # () int32 — shared step count (all groups step together)


def init_adam_state(params: dict) -> AdamState:
    zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
    return AdamState(mu=zeros,
                     nu=jax.tree_util.tree_map(jnp.zeros_like, params),
                     step=jnp.int32(0))


def adam_step(
    params: dict,
    grads: dict,
    state: AdamState,
    lrs: dict,
    config: AdamConfig = AdamConfig(),
    mask: jnp.ndarray | None = None,
) -> tuple[dict, AdamState]:
    """One fused Adam step over a dict-of-arrays parameter pytree.

    Math mirrors adam_step_cu (adam/src/adam.cu:22-34):
      m   <- b1*m + (1-b1)*g          (fmaf(beta1, m - g, g))
      v   <- b2*v + (1-b2)*g^2
      p   -= lr/bc1 * m / (sqrt(v)/sqrt(bc2) + eps)

    Args:
        lrs: per-group learning-rate dict (scalars, traced — the means group
            lr changes every iteration via LRDecayPolicy).
        mask: optional (CAP,) active mask; inactive rows are left untouched
            (their grads are zero anyway, but masking also freezes moments).
    """
    step = state.step + 1
    b1, b2 = config.beta1, config.beta2
    sf = step.astype(jnp.float32)
    bias_correction1_rcp = 1.0 / (1.0 - b1 ** sf)
    bias_correction2_sqrt_rcp = 1.0 / jnp.sqrt(1.0 - b2 ** sf)

    new_params, new_mu, new_nu = {}, {}, {}
    for name, p in params.items():
        g = grads[name]
        m = state.mu[name]
        v = state.nu[name]
        m_new = b1 * m + (1.0 - b1) * g
        v_new = b2 * v + (1.0 - b2) * (g * g)
        denom = jnp.sqrt(v_new) * bias_correction2_sqrt_rcp + config.eps
        step_size = lrs[name] * bias_correction1_rcp
        p_new = p - step_size * m_new / denom
        if mask is not None:
            mk = mask.reshape(mask.shape + (1,) * (p.ndim - 1))
            p_new = jnp.where(mk, p_new, p)
            m_new = jnp.where(mk, m_new, m)
            v_new = jnp.where(mk, v_new, v)
        new_params[name] = p_new
        new_mu[name] = m_new
        new_nu[name] = v_new

    return new_params, AdamState(mu=new_mu, nu=new_nu, step=step)


def lr_decay_policy(lr_init: float, lr_final: float, max_steps: int):
    """3DGS log-lerp exponential decay (host Optim.lr_utils.LRDecayPolicy,
    used at reference Model.py:245-249): lr(t) = exp(lerp(ln i, ln f, t))."""
    log_i, log_f = jnp.log(lr_init), jnp.log(lr_final)

    def schedule(iteration):
        t = jnp.clip(jnp.asarray(iteration, jnp.float32) / max_steps, 0.0, 1.0)
        return jnp.exp(log_i * (1.0 - t) + log_f * t)

    return schedule
