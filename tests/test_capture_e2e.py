"""End-to-end training from an ON-DISK capture (images + COLMAP model).

The closest stand-in for a real MipNeRF360 capture this environment can
hold: ground-truth renders written to PNG files plus a binary COLMAP
sparse model (cameras.bin/images.bin/points3D.bin), loaded through the
production `load_colmap_dataset` path (image decoding, scale factors,
camera conversion, SfM point cloud) and trained with the full Trainer —
the driver's garden parity procedure (README: "real-data parity") runs the
exact same pipeline on a real capture directory.
"""

import numpy as np
import pytest
import jax.numpy as jnp

pytestmark = pytest.mark.slow

from fastergs_tpu.data.capture_io import write_colmap_capture  # noqa: E402
from fastergs_tpu.data.colmap import load_colmap_dataset  # noqa: E402
from fastergs_tpu.data.synthetic import (  # noqa: E402
    random_gaussian_scene, ring_cameras)
from fastergs_tpu.engine.renderer import FasterGSRenderer  # noqa: E402
from fastergs_tpu.engine.trainer import FasterGSTrainer  # noqa: E402
from fastergs_tpu.models.gaussians import FasterGSModel  # noqa: E402
from fastergs_tpu.ops.projection import CameraParams  # noqa: E402
from fastergs_tpu.ops.rasterize import (  # noqa: E402
    RasterizerSettings, rasterize)
from fastergs_tpu.ops.ssim import psnr  # noqa: E402


@pytest.fixture(scope='module')
def capture(tmp_path_factory):
    root = tmp_path_factory.mktemp('capture')
    scene = random_gaussian_scene(500, seed=7)
    views = ring_cameras(10, radius=3.2, width=96, height=64, focal=80.0)
    gt_args = tuple(jnp.asarray(scene[k]) for k in
                    ('means', 'scales', 'rotations', 'opacities',
                     'sh_coefficients_0', 'sh_coefficients_rest'))
    images = []
    for v in views:
        settings = RasterizerSettings(camera=CameraParams.from_view(v),
                                      bg_color=jnp.zeros(3),
                                      active_sh_bases=16)
        images.append(np.asarray(rasterize(*gt_args, settings, to_chw=True,
                                           instance_cap=1 << 15)))
    # noisy SfM-like subset of the true means
    rng = np.random.default_rng(1)
    keep = rng.random(500) < 0.6
    pts = scene['means'][keep] + rng.normal(0, 0.02, (keep.sum(), 3))
    C0 = 0.28209479177387814
    cols = np.clip(0.5 + C0 * scene['sh_coefficients_0'][keep, 0], 0, 1)
    write_colmap_capture(root, views, images, pts, cols)
    return root, views, images


def test_load_capture_from_disk(capture):
    root, views, images = capture
    ds = load_colmap_dataset(str(root), test_step=5)
    assert len(ds.train_views) + len(ds.test_views) == len(views)
    v0 = sorted(ds.train_views + ds.test_views, key=lambda v: v.name)[0]
    # poses and pixels survive the COLMAP round-trip
    np.testing.assert_allclose(v0.w2c34, views[0].w2c34, atol=1e-5)
    np.testing.assert_allclose(v0.rgb, images[0], atol=2e-2)
    assert ds.point_cloud is not None and len(ds.point_cloud[0]) > 100


def test_dry_run_layout_validation(capture, tmp_path):
    """validate_colmap_layout (cli.train --dry-run): accepts the real
    capture, pinpoints structural problems without decoding images."""
    from fastergs_tpu.data.colmap import validate_colmap_layout
    from fastergs_tpu.utils.errors import DatasetError

    root, views, _ = capture
    rep = validate_colmap_layout(str(root))
    assert rep['n_views'] == len(views)
    assert rep['n_points'] > 100
    assert rep['format'] == 'bin' and not rep['pre_scaled']

    with pytest.raises(DatasetError, match='does not exist'):
        validate_colmap_layout(str(tmp_path / 'nope'))
    bad = tmp_path / 'bad'
    (bad / 'sparse' / '0').mkdir(parents=True)
    with pytest.raises(DatasetError, match='missing'):
        validate_colmap_layout(str(bad))

    # registered image file missing from images/
    import shutil
    broken = tmp_path / 'broken'
    shutil.copytree(root, broken)
    victim = next((broken / 'images').iterdir())
    victim.unlink()
    with pytest.raises(DatasetError, match='missing from'):
        validate_colmap_layout(str(broken))


def test_image_scale_factor(capture):
    root, views, _ = capture
    ds = load_colmap_dataset(str(root), image_scale_factor=0.5, test_step=5)
    v = ds.train_views[0]
    assert v.rgb.shape == (3, 32, 48)
    assert v.camera.width == 48 and v.camera.height == 32


def test_train_from_disk_capture(capture):
    """The full garden-procedure pipeline on the on-disk capture."""
    root, _, _ = capture
    ds = load_colmap_dataset(str(root), test_step=5)
    model = FasterGSModel(sh_degree=3).build()
    renderer = FasterGSRenderer(model, {'INSTANCE_CAP': 1 << 15})
    trainer = FasterGSTrainer(model, renderer, {
        'NUM_ITERATIONS': 150,
        'DENSIFICATION_START_ITERATION': 50,
        'DENSIFICATION_END_ITERATION': 120,
        'DENSIFICATION_INTERVAL': 50,
        'OPACITY_RESET_INTERVAL': 10_000,
        'MORTON_ORDERING_INTERVAL': 10_000,
        'INSTANCE_CAP': 1 << 15,
        'LOG_INTERVAL': 50,
    })
    trainer.callbacks.run_pre(ds)

    def test_psnr():
        vals = [float(psnr(renderer.render_image(v, to_chw=True,
                                                 benchmark=True)['rgb'],
                           jnp.asarray(v.rgb))) for v in ds.test_views]
        return float(np.mean(vals))

    before = test_psnr()
    for it in range(trainer.NUM_ITERATIONS):
        trainer.callbacks.run_training(it, ds)
    after = test_psnr()
    trainer.callbacks.run_post(trainer.NUM_ITERATIONS, ds)
    assert after > before + 2.0, (before, after)
