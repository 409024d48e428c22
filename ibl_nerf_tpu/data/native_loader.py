"""ctypes bindings for the native data-loading runtime (native/ibl_data.cc).

Provides threaded batch PNG decode + area resize straight into a
pre-allocated float32 array — the native replacement for the
reference's DataLoader-worker startup loading. Auto-builds the shared
library with `make` on first use; falls back to cv2 when unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libibl_data.so")

_lib = None
_build_failed = False


def _get_lib():
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    try:
        if not os.path.exists(_SO_PATH):
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True)
        lib = ctypes.CDLL(_SO_PATH)
        lib.ibl_probe_png.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
        lib.ibl_probe_png.restype = ctypes.c_int
        lib.ibl_load_png_rgb.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float)]
        lib.ibl_load_png_rgb.restype = ctypes.c_int
        lib.ibl_batch_load_png_rgb.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int), ctypes.c_int]
        lib.ibl_batch_load_png_rgb.restype = ctypes.c_int
        _lib = lib
    except Exception:
        _build_failed = True
    return _lib


def native_available() -> bool:
    return _get_lib() is not None


def probe_png(path: str):
    """Returns (h, w, c) or None on failure."""
    lib = _get_lib()
    if lib is None:
        return None
    h = ctypes.c_int()
    w = ctypes.c_int()
    c = ctypes.c_int()
    rc = lib.ibl_probe_png(path.encode(), ctypes.byref(h), ctypes.byref(w),
                           ctypes.byref(c))
    if rc != 0:
        return None
    return h.value, w.value, c.value


def batch_load_png_rgb(paths: list[str], out_h: int, out_w: int,
                       n_threads: int = 0) -> np.ndarray | None:
    """Decode `paths` in parallel into (N, out_h, out_w, 3) float32 [0,1].

    Returns None if the native library is unavailable or any file fails
    (caller falls back to cv2).
    """
    lib = _get_lib()
    if lib is None:
        return None
    n = len(paths)
    out = np.empty((n, out_h, out_w, 3), dtype=np.float32)
    status = np.zeros((n,), dtype=np.int32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    failures = lib.ibl_batch_load_png_rgb(
        arr, n, out_h, out_w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        n_threads)
    if failures:
        return None
    return out
