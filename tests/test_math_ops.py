"""Unit tests for quaternion/covariance/SH math against independent NumPy."""

import numpy as np
import jax.numpy as jnp

from fastergs_tpu.ops.math import (
    quaternion_to_rotation_matrix, covariance_from_scale_rotation,
    float32_ordered_bits, logit, sigmoid)
from fastergs_tpu.ops.sh import eval_sh_color
from fastergs_tpu.ops.projection import will_primitive_contribute
from fastergs_tpu.constants import SH_C0


def _np_quat_to_R(q):
    """Independent formulation: normalize then standard Hamilton matrix."""
    q = q / np.linalg.norm(q)
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def test_quaternion_rotation_matches_normalized_form():
    rng = np.random.default_rng(0)
    q = rng.normal(0, 1, (32, 4)).astype(np.float32)
    R = np.asarray(quaternion_to_rotation_matrix(jnp.asarray(q)))
    for i in range(32):
        np.testing.assert_allclose(R[i], _np_quat_to_R(q[i]), atol=1e-5)
        # proper rotation
        np.testing.assert_allclose(R[i] @ R[i].T, np.eye(3), atol=1e-5)
        assert np.linalg.det(R[i]) > 0.99


def test_covariance_psd_and_eigenvalues():
    rng = np.random.default_rng(1)
    raw_scales = rng.uniform(-3, 0, (16, 3)).astype(np.float32)
    q = rng.normal(0, 1, (16, 4)).astype(np.float32)
    cov = np.asarray(covariance_from_scale_rotation(
        jnp.asarray(raw_scales), jnp.asarray(q)))
    for i in range(16):
        np.testing.assert_allclose(cov[i], cov[i].T, atol=1e-6)
        eig = np.sort(np.linalg.eigvalsh(cov[i]))
        expected = np.sort(np.exp(2 * raw_scales[i]))
        np.testing.assert_allclose(eig, expected, rtol=1e-4)


def test_float32_ordered_bits_monotone():
    vals = np.array([0.0, 1e-30, 0.2, 1.0, 5.5, 1e10], dtype=np.float32)
    bits = np.asarray(float32_ordered_bits(jnp.asarray(vals)))
    assert np.all(np.diff(bits) > 0)


def test_logit_sigmoid_roundtrip():
    p = jnp.asarray(np.linspace(0.01, 0.99, 50, dtype=np.float32))
    np.testing.assert_allclose(np.asarray(sigmoid(logit(p))), np.asarray(p),
                               atol=1e-6)


def test_sh_degree0_is_affine_offset():
    rng = np.random.default_rng(2)
    sh0 = rng.normal(0, 1, (8, 1, 3)).astype(np.float32)
    sh_rest = np.zeros((8, 15, 3), np.float32)
    means = rng.normal(0, 1, (8, 3)).astype(np.float32)
    out = np.asarray(eval_sh_color(jnp.asarray(sh0), jnp.asarray(sh_rest),
                                   jnp.asarray(means), jnp.zeros(3), 1))
    np.testing.assert_allclose(out, 0.5 + SH_C0 * sh0[:, 0], atol=1e-6)


def test_sh_rotation_equivariance_sanity():
    """Degree-1 SH along +z direction picks out coefficient 1 with +C1 sign."""
    sh0 = np.zeros((1, 1, 3), np.float32)
    sh_rest = np.zeros((1, 15, 3), np.float32)
    sh_rest[0, 1] = [1.0, 2.0, 3.0]  # the z basis
    means = np.array([[0.0, 0.0, 5.0]], np.float32)  # dir = +z from origin
    out = np.asarray(eval_sh_color(jnp.asarray(sh0), jnp.asarray(sh_rest),
                                   jnp.asarray(means), jnp.zeros(3), 4))
    C1 = 0.48860251190291987
    np.testing.assert_allclose(out[0], 0.5 + C1 * np.array([1.0, 2.0, 3.0]),
                               atol=1e-6)


def test_will_contribute_no_false_negatives():
    """If any pixel center in the tile clears the power threshold, the exact
    tile test must keep the (gaussian, tile) instance."""
    rng = np.random.default_rng(3)
    tw = th = 16
    for trial in range(300):
        mean = rng.uniform(-20, 36, 2).astype(np.float32)
        # random PSD conic
        a = np.exp(rng.uniform(-4, 0))
        c = np.exp(rng.uniform(-4, 0))
        b = rng.uniform(-1, 1) * np.sqrt(a * c) * 0.9
        conic = np.array([a, b, c], np.float32)
        thr = np.float32(np.exp(rng.uniform(0, np.log(5.54))))
        tile_x, tile_y = 0, 0
        # brute force over the tile's pixels (power at pixel centers)
        ys, xs = np.meshgrid(np.arange(th), np.arange(tw), indexing='ij')
        dx = mean[0] - (xs + 0.5)
        dy = mean[1] - (ys + 0.5)
        power = 0.5 * (a * dx * dx + c * dy * dy) + b * dx * dy
        any_pixel = np.any(power <= thr)
        got = bool(will_primitive_contribute(
            jnp.asarray(mean - 0.5), jnp.asarray(conic),
            jnp.asarray(tile_x), jnp.asarray(tile_y), jnp.asarray(thr)))
        if any_pixel:
            assert got, (trial, mean, conic, thr)
