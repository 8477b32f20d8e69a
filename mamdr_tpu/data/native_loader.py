"""ctypes bridge to the native C++ CSV loader (native/csv_loader.cc).

Builds the shared library on first use (g++, cached next to the source) and
falls back to the numpy parser transparently if the toolchain or library is
unavailable. Loading the reference CSV layout this way is ~100x faster than
numpy.genfromtxt on large domain files.
"""

from __future__ import annotations

import ctypes
import os
import os.path as osp
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = osp.join(osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__)))), "native")
_LIB_PATH = osp.join(_NATIVE_DIR, "libcsvloader.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_lib_failed = False


def _build() -> bool:
    src = osp.join(_NATIVE_DIR, "csv_loader.cc")
    if not osp.exists(src):
        return False
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR, "-s"],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return osp.exists(_LIB_PATH)
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        if not osp.exists(_LIB_PATH) and not _build():
            _lib_failed = True
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
            lib.csv_count_rows.argtypes = [ctypes.c_char_p]
            lib.csv_count_rows.restype = ctypes.c_int64
            lib.csv_load.argtypes = [
                ctypes.c_char_p,
                np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
                np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
                np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
                np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
                ctypes.c_int64,
            ]
            lib.csv_load.restype = ctypes.c_int64
            _lib = lib
        except OSError:
            _lib_failed = True
    return _lib


def load_csv_native(path: str) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]]:
    """-> (uid, pid, domain, label) or None if the native path is unavailable
    or the file is malformed (callers fall back to the numpy parser)."""
    lib = get_lib()
    if lib is None:
        return None
    n = lib.csv_count_rows(path.encode())
    if n < 0:
        return None
    uid = np.empty(n, np.int32)
    pid = np.empty(n, np.int32)
    domain = np.empty(n, np.int32)
    label = np.empty(n, np.float32)
    got = lib.csv_load(path.encode(), uid, pid, domain, label, n)
    if got != n:
        return None
    return uid, pid, domain, label
