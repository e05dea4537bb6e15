"""Pallas blend kernels vs the XLA-composed blend (interpret mode on CPU).

Kept small — interpret-mode Pallas is slow; the production path on real TPUs
is compile-checked and benchmarked separately.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow
import jax
import jax.numpy as jnp

from fastergs_tpu.ops.rasterize import diff_rasterize
from tests.helpers import make_camera, make_scene, make_settings


def test_pallas_blend_matches_xla_fwd_bwd():
    cam = make_camera(width=48, height=33)  # odd height: partial tiles
    scene = make_scene(n=250, seed=21)
    settings = make_settings(cam, bg=(0.2, 0.4, 0.6), proper_antialiasing=True)

    img_x, aux_x = diff_rasterize(*scene, settings, instance_cap=1 << 12,
                                  use_pallas=False)
    img_p, aux_p = diff_rasterize(*scene, settings, instance_cap=1 << 12,
                                  use_pallas=True)
    np.testing.assert_allclose(np.asarray(img_p), np.asarray(img_x),
                               rtol=1e-5, atol=1e-6)
    assert int(aux_p.n_instances) == int(aux_x.n_instances)

    key_pix = jnp.asarray(
        np.random.default_rng(3).normal(0, 1, img_x.shape), jnp.float32)

    def loss(use_pallas):
        def f(means, scales, ops):
            img, _ = diff_rasterize(means, scales, scene[2], ops, *scene[4:],
                                    settings, instance_cap=1 << 12,
                                    use_pallas=use_pallas)
            return jnp.sum(img * key_pix)
        return f

    gx = jax.grad(loss(False), argnums=(0, 1, 2))(scene[0], scene[1], scene[3])
    gp = jax.grad(loss(True), argnums=(0, 1, 2))(scene[0], scene[1], scene[3])
    for a, b, name in zip(gp, gx, ('means', 'scales', 'opacities')):
        scale = max(float(jnp.abs(b).max()), 1e-6)
        # atol covers the stream kernel's quadratic-form expansion vs the
        # XLA path's direct dx/dy evaluation (fp reassociation only)
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale, atol=2e-5,
                                   err_msg=name)
