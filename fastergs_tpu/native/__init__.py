"""Native (C++) runtime components with on-demand build + ctypes bindings.

Currently: the fast COLMAP binary parser (colmap_native.cpp). The library is
built lazily with `make` on first use; every entry point has a pure-Python
fallback (fastergs_tpu/data/colmap.py), so the framework works without a
toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

from fastergs_tpu.utils.logging import log_info, log_warning

_NATIVE_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_NATIVE_DIR, 'libfastergs_native.so')
_lib: Optional[ctypes.CDLL] = None
_build_attempted = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_attempted
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        if _build_attempted:
            return None
        _build_attempted = True
        try:
            subprocess.run(['make', '-C', _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
            log_info('built native library libfastergs_native.so')
        except Exception as exc:  # no toolchain / build error → fallback
            log_warning(f'native build unavailable ({exc}); using Python '
                        'fallbacks')
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError as exc:
        log_warning(f'failed to load native library: {exc}')
        return None
    lib.colmap_count_points.restype = ctypes.c_longlong
    lib.colmap_count_points.argtypes = [ctypes.c_char_p]
    lib.colmap_read_points.restype = ctypes.c_int
    lib.colmap_read_points.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.c_longlong]
    lib.colmap_count_images.restype = ctypes.c_longlong
    lib.colmap_count_images.argtypes = [ctypes.c_char_p]
    lib.colmap_read_images.restype = ctypes.c_int
    lib.colmap_read_images.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int),
        ctypes.c_char_p, ctypes.c_int, ctypes.c_longlong]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def read_points3d_bin(path: str):
    """Returns (xyz (N,3) f32, rgb (N,3) f32) or None if native unavailable."""
    lib = _load()
    if lib is None:
        return None
    n = lib.colmap_count_points(path.encode())
    if n < 0:
        return None
    xyz = np.empty((n, 3), np.float32)
    rgb = np.empty((n, 3), np.float32)
    rc = lib.colmap_read_points(
        path.encode(),
        xyz.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n)
    if rc != 0:
        log_warning(f'native points3D parse failed (rc={rc})')
        return None
    return xyz, rgb


def read_images_bin(path: str):
    """Returns dict image_index -> {qvec, tvec, camera_id, name} or None."""
    lib = _load()
    if lib is None:
        return None
    n = lib.colmap_count_images(path.encode())
    if n < 0:
        return None
    name_stride = 256
    qvecs = np.empty((n, 4), np.float64)
    tvecs = np.empty((n, 3), np.float64)
    camera_ids = np.empty((n,), np.int32)
    names = np.zeros((n, name_stride), np.uint8)
    rc = lib.colmap_read_images(
        path.encode(),
        qvecs.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        tvecs.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        camera_ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        names.ctypes.data_as(ctypes.c_char_p), name_stride, n)
    if rc != 0:
        log_warning(f'native images parse failed (rc={rc})')
        return None
    out = {}
    for i in range(n):
        name = bytes(names[i]).split(b'\0', 1)[0].decode('utf-8')
        out[i] = dict(qvec=qvecs[i], tvec=tvecs[i],
                      camera_id=int(camera_ids[i]), name=name)
    return out
