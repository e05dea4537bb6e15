"""COLMAP parsers: Python vs native C++ on synthetic binary fixtures."""

import struct

import numpy as np
import pytest

from fastergs_tpu.data import colmap


def _write_points3d_bin(path, xyz, rgb, track_lens):
    with open(path, 'wb') as f:
        f.write(struct.pack('<Q', len(xyz)))
        for i in range(len(xyz)):
            f.write(struct.pack('<i', i + 1) + struct.pack('<i', 0))  # u64 id
            f.write(struct.pack('<3d', *xyz[i]))
            f.write(struct.pack('<3B', *rgb[i]))
            f.write(struct.pack('<d', 0.5))
            f.write(struct.pack('<Q', track_lens[i]))
            for j in range(track_lens[i]):
                f.write(struct.pack('<ii', j, j))


def _write_images_bin(path, qvecs, tvecs, cam_ids, names, n2d):
    with open(path, 'wb') as f:
        f.write(struct.pack('<Q', len(qvecs)))
        for i in range(len(qvecs)):
            f.write(struct.pack('<i', i + 1))
            f.write(struct.pack('<4d', *qvecs[i]))
            f.write(struct.pack('<3d', *tvecs[i]))
            f.write(struct.pack('<i', cam_ids[i]))
            f.write(names[i].encode() + b'\x00')
            f.write(struct.pack('<Q', n2d[i]))
            for j in range(n2d[i]):
                f.write(struct.pack('<ddq', 1.0, 2.0, -1))


@pytest.fixture
def fixtures(tmp_path):
    rng = np.random.default_rng(0)
    n = 50
    xyz = rng.normal(0, 2, (n, 3))
    rgb = rng.integers(0, 256, (n, 3))
    tracks = rng.integers(0, 7, n)
    p3d = str(tmp_path / 'points3D.bin')
    _write_points3d_bin(p3d, xyz, rgb, tracks)

    m = 6
    qv = rng.normal(0, 1, (m, 4))
    tv = rng.normal(0, 1, (m, 3))
    cams = rng.integers(1, 3, m)
    names = [f'img_{i:03d}.jpg' for i in range(m)]
    n2d = rng.integers(0, 5, m)
    ibin = str(tmp_path / 'images.bin')
    _write_images_bin(ibin, qv, tv, cams, names, n2d)
    return p3d, ibin, xyz, rgb, qv, tv, cams, names


def test_python_parser(fixtures):
    p3d, ibin, xyz, rgb, qv, tv, cams, names = fixtures
    x, c = colmap.read_points3d_bin(p3d)
    np.testing.assert_allclose(x, xyz.astype(np.float32), rtol=1e-6)
    np.testing.assert_allclose(c, rgb / 255.0, atol=1e-6)
    images = colmap.read_images_bin(ibin)
    assert len(images) == len(names)
    got = sorted(images.values(), key=lambda d: d['name'])
    for g, i in zip(got, range(len(names))):
        assert g['name'] == names[i]
        np.testing.assert_allclose(g['qvec'], qv[i])
        np.testing.assert_allclose(g['tvec'], tv[i])
        assert g['camera_id'] == cams[i]


def test_native_parser_matches_python(fixtures):
    from fastergs_tpu import native
    if not native.available():
        pytest.skip('native toolchain unavailable')
    p3d, ibin, xyz, rgb, qv, tv, cams, names = fixtures
    out = native.read_points3d_bin(p3d)
    assert out is not None
    np.testing.assert_allclose(out[0], xyz.astype(np.float32), rtol=1e-6)
    np.testing.assert_allclose(out[1], rgb / 255.0, atol=1e-6)
    images = native.read_images_bin(ibin)
    assert images is not None and len(images) == len(names)
    for i in range(len(names)):
        assert images[i]['name'] == names[i]
        np.testing.assert_allclose(images[i]['qvec'], qv[i])
        np.testing.assert_allclose(images[i]['tvec'], tv[i])
        assert images[i]['camera_id'] == cams[i]
