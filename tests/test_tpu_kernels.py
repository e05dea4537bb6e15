"""On-device kernel regression tier (`FASTERGS_TPU_TESTS=1 pytest -m tpu`).

Every other test runs the Pallas kernels in interpret mode on CPU, so a
Mosaic-compile regression (layout, DMA, roll semantics) could pass the whole
suite and only surface in bench. This tier compiles the streaming kernels on
the real chip and asserts parity against the XLA blend path (ops/blend.py),
fulfilling the reference's cross-implementation parity role
(reference: README.md:56-57, the FasterGSBasis quality-check branch).
"""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

pytestmark = pytest.mark.tpu

requires_tpu = pytest.mark.skipif(
    os.environ.get('FASTERGS_TPU_TESTS', '') != '1'
    or jax.default_backend() not in ('tpu', 'axon'),
    reason='needs FASTERGS_TPU_TESTS=1 and a real TPU backend')


def _scene(n=20_000, w=512, h=384, seed=0):
    from fastergs_tpu.constants import DEFAULT_CONSTANTS
    from fastergs_tpu.data.synthetic import random_gaussian_scene
    from fastergs_tpu.ops.projection import CameraParams, preprocess, grid_size

    s = random_gaussian_scene(n, seed=seed)
    w2c = np.eye(4, dtype=np.float32)[:3]
    w2c[2, 3] = 3.0
    cam = CameraParams(
        w2c=jnp.asarray(w2c), cam_position=jnp.asarray([0.0, 0.0, -3.0]),
        focal_x=jnp.float32(0.7 * w), focal_y=jnp.float32(0.7 * w),
        center_x=jnp.float32(w / 2), center_y=jnp.float32(h / 2),
        near_plane=jnp.float32(0.05), far_plane=jnp.float32(100.0),
        width=w, height=h)
    args = (jnp.asarray(s['means']), jnp.asarray(s['scales']),
            jnp.asarray(s['rotations']), jnp.asarray(s['opacities']),
            jnp.asarray(s['sh_coefficients_0']),
            jnp.asarray(s['sh_coefficients_rest']))
    prims = jax.jit(lambda a: preprocess(
        *a, cam, active_sh_bases=16, consts=DEFAULT_CONSTANTS))(args)
    gw, gh = grid_size(w, h, DEFAULT_CONSTANTS)
    return prims, cam, gw, gh, args


@requires_tpu
def test_mosaic_blend_matches_xla_forward_and_backward():
    """Mosaic-compiled streaming fwd/bwd vs the XLA composition on the same
    instance stream (tolerances from tests/test_blend_stream.py)."""
    from fastergs_tpu.constants import DEFAULT_CONSTANTS
    from fastergs_tpu.ops.rasterize import (
        RasterizerSettings, render_from_primitives)

    prims, cam, gw, gh, _ = _scene()
    settings = RasterizerSettings(camera=cam, bg_color=jnp.zeros(3),
                                  active_sh_bases=16)
    cap = 1 << 17

    def render(use_pallas):
        def f(pr):
            img, aux = render_from_primitives(
                pr, settings, cap, chunk=32, consts=DEFAULT_CONSTANTS,
                use_pallas=use_pallas)
            return img, aux
        return jax.jit(f)

    img_p, aux_p = render(True)(prims)
    img_x, aux_x = render(False)(prims)
    assert int(aux_p.n_instances) == int(aux_x.n_instances)
    np.testing.assert_allclose(np.asarray(img_p), np.asarray(img_x),
                               atol=5e-4, rtol=0)

    # backward parity: cotangent of a scalar image functional w.r.t. the
    # differentiable primitive fields
    tgt = jnp.asarray(
        np.random.default_rng(1).random(np.asarray(img_x).shape, np.float32))

    names = ('mean2d', 'conic', 'opacity', 'color')

    def loss(fields, use_pallas):
        # differentiate only the real-valued blend fields: prims also
        # carries bool/int culling state that jax.grad rejects
        pr = prims._replace(**dict(zip(names, fields)))
        img, _ = render_from_primitives(
            pr, settings, cap, chunk=32, consts=DEFAULT_CONSTANTS,
            use_pallas=use_pallas)
        return jnp.mean(jnp.abs(img - tgt))

    fields0 = tuple(getattr(prims, n) for n in names)
    g_p = jax.jit(jax.grad(lambda f: loss(f, True)))(fields0)
    g_x = jax.jit(jax.grad(lambda f: loss(f, False)))(fields0)
    for name, a, b in zip(names, g_p, g_x):
        a = np.asarray(a)
        b = np.asarray(b)
        scale = max(np.abs(b).max(), 1e-8)
        d = np.abs(a / scale - b / scale)
        # the streaming kernel computes transmittance as exp(cumsum(log1p))
        # while the XLA path multiplies sequentially; instances landing
        # within float eps of the 1e-4 early-termination threshold can flip
        # inclusion between the two, perturbing a handful of gradient
        # entries. Allow isolated flips, still catch systemic errors.
        frac_over = float(np.mean(d > 2e-3))
        assert d.max() < 5e-3 and frac_over < 1e-3, (
            f'grad mismatch in {name}: max {d.max():.2e}, '
            f'{frac_over:.2%} elements over 2e-3')


@requires_tpu
def test_mosaic_pruning_scores_match_xla():
    from fastergs_tpu.constants import DEFAULT_CONSTANTS
    from fastergs_tpu.ops.pruning import update_pruning_scores

    prims, cam, gw, gh, args = _scene(n=8_000)
    from fastergs_tpu.ops.rasterize import RasterizerSettings
    settings = RasterizerSettings(camera=cam, bg_color=jnp.zeros(3),
                                  active_sh_bases=16)
    n = args[0].shape[0]
    s_p = jax.jit(lambda a: update_pruning_scores(
        jnp.zeros((n,)), *a, settings, instance_cap=1 << 16,
        consts=DEFAULT_CONSTANTS, use_pallas=True))(args)
    s_x = jax.jit(lambda a: update_pruning_scores(
        jnp.zeros((n,)), *a, settings, instance_cap=1 << 16,
        consts=DEFAULT_CONSTANTS, use_pallas=False))(args)
    a, b = np.asarray(s_p), np.asarray(s_x)
    scale = max(b.max(), 1e-8)
    np.testing.assert_allclose(a / scale, b / scale, atol=2e-3, rtol=0)
