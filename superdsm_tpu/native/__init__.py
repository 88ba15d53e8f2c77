"""Native (C++) runtime ops, loaded via ctypes.

The shared library is built on demand with ``g++`` the first time it is
needed and cached next to this file. Every entry point has a pure-Python
fallback in the :mod:`superdsm_tpu.ops` modules, so the framework works even
without a C++ toolchain.
"""

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, 'watershed.cpp')
_LIB = os.path.join(_HERE, '_sdsm_native.so')

_lock = threading.Lock()
_lib = None
_load_failed = False


def _build():
    cmd = ['g++', '-O3', '-march=native', '-shared', '-fPIC', '-std=c++17',
           '-o', _LIB, _SRC]
    subprocess.run(cmd, check=True, capture_output=True)


def get_lib():
    """Returns the loaded native library, or ``None`` if unavailable."""
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    with _lock:
        if _lib is not None or _load_failed:
            return _lib
        try:
            if (not os.path.exists(_LIB)) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
                _build()
            lib = ctypes.CDLL(_LIB)
            lib.sdsm_watershed.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int32, ctypes.c_int32,
                ctypes.c_int32, ctypes.POINTER(ctypes.c_int32)]
            lib.sdsm_watershed.restype = None
            lib.sdsm_chessboard_edt.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int32, ctypes.c_int32,
                ctypes.POINTER(ctypes.c_int32)]
            lib.sdsm_chessboard_edt.restype = None
            lib.sdsm_subsample_grid.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int32, ctypes.c_int32,
                ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
                ctypes.POINTER(ctypes.c_uint8)]
            lib.sdsm_subsample_grid.restype = ctypes.c_int32
            lib.sdsm_edt.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int32, ctypes.c_int32,
                ctypes.POINTER(ctypes.c_double)]
            lib.sdsm_edt.restype = None
            lib.sdsm_maxfilt3.argtypes = [
                ctypes.POINTER(ctypes.c_double), ctypes.c_int32, ctypes.c_int32,
                ctypes.c_int32, ctypes.POINTER(ctypes.c_double)]
            lib.sdsm_maxfilt3.restype = None
            _lib = lib
        except Exception:
            _load_failed = True
    return _lib


def _ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def watershed_native(image, markers, mask=None, connectivity=4):
    """Native watershed; returns ``None`` if the library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    image = np.ascontiguousarray(image, dtype=np.float32)
    markers = np.ascontiguousarray(markers, dtype=np.int32)
    H, W = image.shape
    out = np.zeros((H, W), dtype=np.int32)
    mask_arr = None
    mask_ptr = ctypes.POINTER(ctypes.c_uint8)()
    if mask is not None:
        mask_arr = np.ascontiguousarray(mask, dtype=np.uint8)
        mask_ptr = _ptr(mask_arr, ctypes.c_uint8)
    lib.sdsm_watershed(_ptr(image, ctypes.c_float), _ptr(markers, ctypes.c_int32),
                       mask_ptr, H, W, int(connectivity), _ptr(out, ctypes.c_int32))
    return out


def chessboard_edt_native(sources):
    lib = get_lib()
    if lib is None:
        return None
    sources = np.ascontiguousarray(sources, dtype=np.uint8)
    H, W = sources.shape
    out = np.zeros((H, W), dtype=np.int32)
    lib.sdsm_chessboard_edt(_ptr(sources, ctypes.c_uint8), H, W, _ptr(out, ctypes.c_int32))
    return out


def edt_native(mask):
    """Exact euclidean distance transform (distances of nonzero pixels to
    the nearest zero pixel); scipy-identical. ``None`` if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    mask = np.ascontiguousarray(mask, dtype=np.uint8)
    H, W = mask.shape
    out = np.zeros((H, W), dtype=np.float64)
    lib.sdsm_edt(_ptr(mask, ctypes.c_uint8), H, W, _ptr(out, ctypes.c_double))
    return out


def maxfilt3_native(img, connectivity=8):
    """3x3 maximum filter (cross for connectivity 4, full square for 8),
    reflect borders; scipy-identical. ``None`` if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    img = np.ascontiguousarray(img, dtype=np.float64)
    H, W = img.shape
    out = np.empty((H, W), dtype=np.float64)
    lib.sdsm_maxfilt3(_ptr(img, ctypes.c_double), H, W, int(connectivity),
                      _ptr(out, ctypes.c_double))
    return out


def subsample_grid_native(mask, stride, offset=(0, 0)):
    lib = get_lib()
    if lib is None:
        return None
    mask = np.ascontiguousarray(mask, dtype=np.uint8)
    H, W = mask.shape
    grid = np.zeros((H, W), dtype=np.uint8)
    lib.sdsm_subsample_grid(_ptr(mask, ctypes.c_uint8), H, W, int(stride),
                            int(offset[0]) % int(stride), int(offset[1]) % int(stride),
                            _ptr(grid, ctypes.c_uint8))
    return grid.astype(bool)
