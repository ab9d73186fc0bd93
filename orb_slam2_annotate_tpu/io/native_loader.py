"""ctypes binding for the native prefetching image loader (native/loader.cpp).

A C++ worker pool decodes PNG/PGM frames ahead of the SLAM loop into a
bounded window, keeping file IO and inflate off the Python thread that
drives device dispatch — the runtime-native analog of the reference's
synchronous cv::imread in its driver loops.  Falls back transparently to
OpenCV if the shared library is not built.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB_PATH = os.path.join(
    os.path.dirname(__file__), "..", "..", "native", "liborbtpu_loader.so"
)

_lib = None


def _load_lib():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        raise FileNotFoundError(
            f"{_LIB_PATH} not built — run native/build.sh"
        )
    lib = ctypes.CDLL(_LIB_PATH)
    lib.loader_create.restype = ctypes.c_void_p
    lib.loader_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.loader_destroy.argtypes = [ctypes.c_void_p]
    lib.loader_get_info.argtypes = [
        ctypes.c_void_p, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    lib.loader_copy.argtypes = [
        ctypes.c_void_p, ctypes.c_int,
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
    ]
    lib.loader_error.restype = ctypes.c_char_p
    lib.loader_error.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.decode_image.argtypes = [
        ctypes.c_char_p,
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    _lib = lib
    return lib


def available() -> bool:
    try:
        _load_lib()
        return True
    except (FileNotFoundError, OSError):
        return False


def decode(path: str) -> np.ndarray:
    """Synchronously decode one PNG/PGM to grayscale float32 [H, W]."""
    lib = _load_lib()
    buf = np.empty(1 << 24, np.float32)  # up to 16 Mpx
    w = ctypes.c_int()
    h = ctypes.c_int()
    rc = lib.decode_image(path.encode(), buf, buf.size,
                          ctypes.byref(w), ctypes.byref(h))
    if rc != 0:
        raise IOError(f"native decode failed ({rc}): {path}")
    return buf[: w.value * h.value].reshape(h.value, w.value).copy()


class PrefetchLoader:
    """Iterate decoded grayscale frames with background decode-ahead.

    loader = PrefetchLoader(paths, n_threads=2, ahead=8)
    for i in range(len(loader)):
        img = loader[i]   # blocks only if the pipeline is behind
    """

    def __init__(self, paths: list[str], n_threads: int = 2, ahead: int = 8):
        self._lib = _load_lib()
        self._paths = list(paths)
        arr = (ctypes.c_char_p * len(paths))(*[p.encode() for p in paths])
        self._h = self._lib.loader_create(arr, len(paths), n_threads, ahead)
        if not self._h:
            raise RuntimeError("loader_create failed")

    def __len__(self):
        return len(self._paths)

    def __getitem__(self, idx: int) -> np.ndarray:
        w = ctypes.c_int()
        h = ctypes.c_int()
        if self._lib.loader_get_info(self._h, idx, ctypes.byref(w),
                                     ctypes.byref(h)) != 0:
            err = self._lib.loader_error(self._h, idx).decode()
            raise IOError(f"decode failed for {self._paths[idx]}: {err}")
        out = np.empty((h.value, w.value), np.float32)
        if self._lib.loader_copy(self._h, idx, out) != 0:
            raise IOError(f"copy failed for {self._paths[idx]}")
        return out

    def close(self):
        if getattr(self, "_h", None):
            self._lib.loader_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
