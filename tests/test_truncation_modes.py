"""Truncation presets + revised opacity interpretation
(reference: rasterization_config.h:18-44, compile-time TRUNCATION_MODE)."""

import numpy as np
import jax.numpy as jnp
import pytest

from fastergs_tpu.constants import RasterizerConstants
from fastergs_tpu.ops.rasterize import diff_rasterize
from fastergs_tpu.ops.oracle import render_dense_oracle
from tests.helpers import make_camera, make_scene, make_settings


def test_static_asserts():
    """Modes 1-3 require the revised opacity interpretation
    (rasterization_config.h:24,29,34)."""
    for mode in (1, 2, 3):
        with pytest.raises(ValueError):
            RasterizerConstants(truncation_mode=mode)
        RasterizerConstants(truncation_mode=mode,
                            original_opacity_interpretation=False)
    RasterizerConstants(truncation_mode=0)
    RasterizerConstants(truncation_mode=4)
    with pytest.raises(ValueError):
        RasterizerConstants(truncation_mode=5)


def test_preset_values():
    c1 = RasterizerConstants(truncation_mode=1,
                             original_opacity_interpretation=False)
    assert abs(c1.max_power_threshold - 1.0) < 1e-12
    assert abs(c1.min_alpha_threshold - np.exp(-1.0)) < 1e-9
    c0 = RasterizerConstants()
    assert abs(c0.min_alpha_threshold - 1 / 255) < 1e-9
    assert abs(c0.max_power_threshold - np.log(255.0)) < 1e-9


@pytest.mark.parametrize('mode', [1, 2, 4])
def test_truncation_modes_match_oracle(mode):
    """The tiled path matches the oracle under every truncation preset."""
    consts = RasterizerConstants(
        truncation_mode=mode,
        original_opacity_interpretation=(mode == 4))
    cam = make_camera(width=48, height=32)
    scene = make_scene(n=250, seed=13)
    settings = make_settings(cam, bg=(0.1, 0.2, 0.3))
    img, _ = diff_rasterize(*scene, settings, instance_cap=1 << 13,
                            consts=consts)
    ref, _ = render_dense_oracle(*scene, settings, consts=consts)
    np.testing.assert_allclose(np.asarray(img), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_tighter_truncation_renders_less():
    """1-sigma truncation must remove splatted mass vs 4-sigma."""
    cam = make_camera(width=48, height=32)
    scene = make_scene(n=250, seed=13)
    settings = make_settings(cam)
    c1 = RasterizerConstants(truncation_mode=1,
                             original_opacity_interpretation=False)
    c4 = RasterizerConstants(truncation_mode=4,
                             original_opacity_interpretation=False)
    img1, aux1 = diff_rasterize(*scene, settings, instance_cap=1 << 13,
                                consts=c1)
    img4, aux4 = diff_rasterize(*scene, settings, instance_cap=1 << 13,
                                consts=c4)
    assert int(aux1.n_instances) < int(aux4.n_instances)
    assert float(jnp.sum(img1)) < float(jnp.sum(img4))
