"""ctypes bindings for the native (C++) data-plane library.

Wraps ``native/pfm_stats.cpp``: multithreaded PFM decoding and
disparity-statistics scanning. The shared library is built on demand with
``g++`` (no packaging dependency) and cached next to the sources; every
entry point falls back to the pure-numpy implementation when the toolchain
or library is unavailable, so the framework never hard-depends on it.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SOURCE = os.path.join(_REPO_ROOT, "native", "pfm_stats.cpp")
_LIBRARY = os.path.join(_REPO_ROOT, "native", "libpds_pfm_stats.so")

_lock = threading.Lock()
_library = None
_load_failed = False

CUMULATIVE_BINS = 512


def _build_library() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
             _SOURCE, "-o", _LIBRARY],
            check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, FileNotFoundError, OSError):
        return False


def load_library():
    """Returns the loaded CDLL or None (builds the .so on first use)."""
    global _library, _load_failed
    with _lock:
        if _library is not None or _load_failed:
            return _library
        if not os.path.isfile(_LIBRARY) or (
                os.path.isfile(_SOURCE) and
                os.path.getmtime(_SOURCE) > os.path.getmtime(_LIBRARY)):
            if not os.path.isfile(_SOURCE) or not _build_library():
                _load_failed = True
                return None
        try:
            library = ctypes.CDLL(_LIBRARY)
        except OSError:
            _load_failed = True
            return None
        library.pds_read_pfm.restype = ctypes.c_int
        library.pds_read_pfm.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
        library.pds_scan_disparity_statistics.restype = ctypes.c_int
        library.pds_scan_disparity_statistics.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int)]
        _library = library
        return _library


def available() -> bool:
    return load_library() is not None


def read_pfm(path: str, max_pixels: int = 8192 * 8192):
    """Native PFM read; returns [H, W] or [H, W, 3] float32, or None if the
    library is unavailable (caller falls back to the Python reader)."""
    library = load_library()
    if library is None:
        return None
    buffer = np.empty(max_pixels, dtype=np.float32)
    height = ctypes.c_int()
    width = ctypes.c_int()
    channels = ctypes.c_int()
    status = library.pds_read_pfm(
        path.encode("utf-8"),
        buffer.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        buffer.size, ctypes.byref(height), ctypes.byref(width),
        ctypes.byref(channels))
    if status != 0:
        raise ValueError(f"native PFM read failed ({status}): {path}")
    shape = ((height.value, width.value) if channels.value == 1 else
             (height.value, width.value, channels.value))
    count = int(np.prod(shape))
    return buffer[:count].reshape(shape).copy()


def scan_disparity_statistics(paths: list[str], threads: int | None = None):
    """Multithreaded scan: returns (minimums, maximums, cumulatives, status)
    arrays, or None when the native library is unavailable."""
    library = load_library()
    if library is None:
        return None
    if threads is None:
        threads = min(16, (os.cpu_count() or 2) * 2)
    count = len(paths)
    encoded = [path.encode("utf-8") for path in paths]
    path_array = (ctypes.c_char_p * count)(*encoded)
    minimums = np.empty(count, np.float32)
    maximums = np.empty(count, np.float32)
    cumulatives = np.empty((count, CUMULATIVE_BINS), np.float32)
    status = np.empty(count, np.int32)
    library.pds_scan_disparity_statistics(
        path_array, count, threads,
        minimums.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        maximums.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        cumulatives.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
    return minimums, maximums, cumulatives, status
