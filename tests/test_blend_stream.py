"""Edge cases for the chunk-major streaming blend kernels (interpret mode).

The main fwd/bwd parity check vs the XLA blend runs in test_blend_pallas.py
(which drives the production diff_rasterize path)
(diff_rasterize with use_pallas=True now routes through ops/blend_stream.py).
Here: boundary conditions the stream design is sensitive to — empty tiles,
early termination, the sentinel tail, and tiles ending exactly at chunk
boundaries.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from fastergs_tpu.ops.rasterize import diff_rasterize
from tests.helpers import make_camera, make_scene, make_settings


def _compare(scene, cam, cap, bg=(0.0, 0.0, 0.0)):
    settings = make_settings(cam, bg=bg)
    img_x, aux_x = diff_rasterize(*scene, settings, instance_cap=cap,
                                  use_pallas=False)
    img_p, aux_p = diff_rasterize(*scene, settings, instance_cap=cap,
                                  use_pallas=True)
    np.testing.assert_allclose(np.asarray(img_p), np.asarray(img_x),
                               rtol=1e-5, atol=1e-6)
    assert int(aux_p.n_instances) == int(aux_x.n_instances)
    return img_p


@pytest.mark.slow
def test_stream_sparse_scene_empty_tiles():
    """A few tiny Gaussians: most tiles are empty (tile-skip writes)."""
    cam = make_camera(width=64, height=64)  # 4x4 tiles
    scene = make_scene(n=3, seed=5, spread=0.08)  # clustered center
    _compare(scene, cam, cap=1 << 9)


@pytest.mark.slow
def test_stream_no_instances():
    """All Gaussians behind the camera: pure-background image."""
    cam = make_camera(width=48, height=32)
    scene = list(make_scene(n=16, seed=7))
    means = np.array(scene[0])
    means[:, 2] = -5.0  # behind near plane
    scene[0] = jnp.asarray(means)
    img = _compare(tuple(scene), cam, cap=1 << 9, bg=(0.3, 0.5, 0.7))
    np.testing.assert_allclose(np.asarray(img[0]), 0.3, atol=1e-6)


@pytest.mark.slow
def test_stream_opaque_early_termination():
    """High-opacity stacked Gaussians: transmittance freezes mid-stream."""
    cam = make_camera(width=32, height=32)
    scene = list(make_scene(n=400, seed=11, spread=0.05))
    # crank raw opacities -> sigmoid ~ 0.999
    scene[3] = jnp.full_like(scene[3], 7.0)
    settings = make_settings(cam)
    img_x, _ = diff_rasterize(*scene, settings, instance_cap=1 << 11,
                              use_pallas=False)
    img_p, _ = diff_rasterize(*scene, settings, instance_cap=1 << 11,
                              use_pallas=True)
    # tolerance accommodates the expanded quadratic-form power (basis
    # matmul) vs the direct dx/dy evaluation of the XLA path; 400 stacked
    # near-opaque Gaussians amplify reassociation differences
    np.testing.assert_allclose(np.asarray(img_p), np.asarray(img_x),
                               rtol=2e-4, atol=1e-5)

    # gradients under early termination
    key_pix = jnp.asarray(
        np.random.default_rng(0).normal(0, 1, img_x.shape), jnp.float32)

    def loss(use_pallas):
        def f(means, ops):
            img, _ = diff_rasterize(means, scene[1], scene[2], ops,
                                    *scene[4:], settings,
                                    instance_cap=1 << 11,
                                    use_pallas=use_pallas)
            return jnp.sum(img * key_pix)
        return f

    gx = jax.grad(loss(False), argnums=(0, 1))(scene[0], scene[3])
    gp = jax.grad(loss(True), argnums=(0, 1))(scene[0], scene[3])
    # near the early-termination threshold the blend weight is discontinuous;
    # fp ordering differences between the kernel (tile-center quadratic-form
    # expansion + MXU moment reductions) and the XLA composition can
    # legitimately flip borderline fragments, and this scene (400 stacked
    # near-opaque Gaussians) maximizes such crossings. Correctness of the
    # gradient math is covered by the finite-difference and oracle tests in
    # test_rasterize.py; here require 96% element agreement.
    for a, b in zip(gp, gx):
        a, b = np.asarray(a), np.asarray(b)
        d = np.abs(a - b)
        ok = (d <= 2e-6) | (d <= 2e-4 * np.abs(b))
        assert ok.mean() >= 0.96, f'{ok.mean()=}'


@pytest.mark.slow
def test_stream_edge_tile_done_mask():
    """Partial edge tiles + opaque full coverage: the done flag must ignore
    out-of-image pixels (they never receive alpha and would otherwise pin
    T at 1), and skipping trailing chunks must not change the image or the
    gradients vs the XLA path."""
    cam = make_camera(width=40, height=24)  # right/bottom tiles partial
    scene = list(make_scene(n=300, seed=23, spread=0.4))
    # large opaque splats -> every in-image pixel saturates early
    scene[1] = jnp.full_like(scene[1], -1.2)   # raw log-scales
    scene[3] = jnp.full_like(scene[3], 9.0)    # sigmoid ~ 0.9999
    scene = tuple(scene)
    _compare(scene, cam, cap=1 << 11)

    settings = make_settings(cam)
    key_pix = jnp.asarray(
        np.random.default_rng(3).normal(0, 1, (3, 24, 40)), jnp.float32)

    def loss(use_pallas):
        def f(means):
            img, _ = diff_rasterize(means, *scene[1:], settings,
                                    instance_cap=1 << 11,
                                    use_pallas=use_pallas)
            return jnp.sum(img * key_pix)
        return f

    gx = jax.grad(loss(False))(scene[0])
    gp = jax.grad(loss(True))(scene[0])
    a, b = np.asarray(gp), np.asarray(gx)
    d = np.abs(a - b)
    ok = (d <= 2e-6) | (d <= 2e-4 * np.abs(b))
    assert ok.mean() >= 0.96, f'{ok.mean()=}'


@pytest.mark.slow
def test_stream_tiny_cap_exact_chunks():
    """Instance count filling the capacity exactly (no sentinel tail)."""
    cam = make_camera(width=48, height=48)
    scene = make_scene(n=60, seed=13, spread=0.6)
    settings = make_settings(cam)
    # find the real instance count, then use the smallest multiple of 128
    _, aux = diff_rasterize(*scene, settings, instance_cap=1 << 11,
                            use_pallas=False)
    n = int(aux.n_instances)
    cap = max(128, ((n + 127) // 128) * 128)
    _compare(scene, cam, cap=cap)


@pytest.mark.slow
def test_stream_pruning_scores_match_xla_sweep():
    """The streaming Speedy-Splat score kernel must reproduce the XLA
    two-pass sweep (same preprocess, binning, and score math)."""
    from fastergs_tpu.ops.pruning import update_pruning_scores

    cam = make_camera(width=48, height=33)  # partial tiles: inside-mask path
    scene = make_scene(n=120, seed=17)
    settings = make_settings(cam, bg=(0.2, 0.3, 0.4))
    n = scene[0].shape[0]
    z = jnp.zeros((n,), jnp.float32)
    s_xla = update_pruning_scores(z, *scene, settings, instance_cap=1 << 11,
                                  use_pallas=False)
    s_str = update_pruning_scores(z, *scene, settings, instance_cap=1 << 11,
                                  use_pallas=True)
    scale = max(float(jnp.max(s_xla)), 1e-9)
    np.testing.assert_allclose(np.asarray(s_str) / scale,
                               np.asarray(s_xla) / scale,
                               atol=5e-5)
    assert float(jnp.max(s_xla)) > 0.0
