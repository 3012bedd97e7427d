"""ctypes bindings for the native measurement core (lazy-built).

Builds `libsemtpu_native.so` from `measure_core.cpp` with g++ on first use
(cached next to the source). Every entry point has a pure-numpy/JAX
fallback, so the framework works without a compiler; the native path is the
fast host-side engine for per-particle filtering at pipeline scale.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "measure_core.cpp")
_LIB = os.path.join(_HERE, "libsemtpu_native.so")
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if (not os.path.isfile(_LIB)
                or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _LIB],
                check=True, capture_output=True)
        lib = ctypes.CDLL(_LIB)
        i32p = ctypes.POINTER(ctypes.c_int32)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i64p = ctypes.POINTER(ctypes.c_int64)
        f64p = ctypes.POINTER(ctypes.c_double)
        lib.semtpu_cc_label.restype = ctypes.c_int32
        lib.semtpu_cc_label.argtypes = [u8p, ctypes.c_int32, ctypes.c_int32,
                                        ctypes.c_int32, i32p]
        lib.semtpu_cc_stats.restype = None
        lib.semtpu_cc_stats.argtypes = [i32p, u8p, ctypes.c_int32, ctypes.c_int32,
                                        ctypes.c_int32, i64p, f64p, i32p]
        lib.semtpu_cc_filter.restype = None
        lib.semtpu_cc_filter.argtypes = [i32p, ctypes.c_int32, ctypes.c_int32,
                                         u8p, u8p]
        lib.semtpu_eight_to_four.restype = None
        lib.semtpu_eight_to_four.argtypes = [u8p, ctypes.c_int32, ctypes.c_int32]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def _u8p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _i32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def cc_label(mask: np.ndarray, connectivity: int = 1) -> tuple[np.ndarray, int]:
    """Label connected components (native; falls back to the device op)."""
    lib = _load()
    m = np.ascontiguousarray(np.asarray(mask) != 0, dtype=np.uint8)
    h, w = m.shape
    if lib is None:
        from semtpu.ops import label as jlabel
        lab, n = jlabel(m > 0, connectivity=connectivity)
        return np.asarray(lab), int(n)
    labels = np.empty((h, w), np.int32)
    n = lib.semtpu_cc_label(_u8p(m), h, w, connectivity, _i32p(labels))
    return labels, int(n)


def cc_stats(labels: np.ndarray, n: int, gray: np.ndarray | None = None):
    """(areas int64[n], mean_intensities float64[n] | None, bbox int32[n,4])."""
    lib = _load()
    labels = np.ascontiguousarray(labels, np.int32)
    h, w = labels.shape
    if lib is None:
        flat = labels.ravel()
        areas = np.bincount(flat, minlength=n + 1)[1:].astype(np.int64)
        means = None
        if gray is not None:
            sums = np.bincount(flat, weights=np.asarray(gray, np.float64).ravel(),
                               minlength=n + 1)[1:]
            means = sums / np.maximum(areas, 1)
        ys, xs = np.mgrid[:h, :w]
        bbox = np.zeros((n, 4), np.int32)
        for k in range(1, n + 1):
            sel = flat == k
            if sel.any():
                yy, xx = ys.ravel()[sel], xs.ravel()[sel]
                bbox[k - 1] = (yy.min(), xx.min(), yy.max(), xx.max())
        return areas, means, bbox
    areas = np.empty(n, np.int64)
    sums = np.empty(n, np.float64)
    bbox = np.empty((n, 4), np.int32)
    g = None
    if gray is not None:
        g = np.ascontiguousarray(gray, np.uint8)
    lib.semtpu_cc_stats(
        _i32p(labels), _u8p(g) if g is not None else None, h, w, n,
        areas.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        sums.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        _i32p(bbox))
    means = sums / np.maximum(areas, 1) if gray is not None else None
    return areas, means, bbox


def cc_filter(labels: np.ndarray, n: int, keep: np.ndarray) -> np.ndarray:
    """Binary mask of components whose keep[label-1] is truthy."""
    lib = _load()
    labels = np.ascontiguousarray(labels, np.int32)
    h, w = labels.shape
    keep_tab = np.zeros(n + 1, np.uint8)
    keep_tab[1:] = np.asarray(keep, bool).astype(np.uint8)
    if lib is None:
        return np.where(keep_tab[labels] > 0, 255, 0).astype(np.uint8)
    out = np.empty((h, w), np.uint8)
    lib.semtpu_cc_filter(_i32p(labels), h, w, _u8p(keep_tab), _u8p(out))
    return out


def eight_to_four(img: np.ndarray) -> np.ndarray:
    """Exact sequential 8->4 fixer on host (native; device-op fallback)."""
    lib = _load()
    out = np.ascontiguousarray(img, np.uint8).copy()
    if lib is None:
        from semtpu.ops import eight_to_four_connected
        return np.asarray(eight_to_four_connected(out))
    lib.semtpu_eight_to_four(_u8p(out), out.shape[0], out.shape[1])
    return out
