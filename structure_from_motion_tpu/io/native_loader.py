"""ctypes bindings for the native C++ image loader (``native/sfm_loader.cpp``).

Provides the decode + background-prefetch runtime so the Python orchestrator
overlaps frame IO with TPU compute. Builds the shared library on demand with
``make`` (toolchain is in the image) and degrades gracefully to the pure
Python decoders in :mod:`structure_from_motion_tpu.io.datasets` when the
native library is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libsfm_loader.so"))
_lock = threading.Lock()
_lib = None
_build_failed = False


def _load_library():
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if not os.path.exists(_LIB_PATH):
            try:
                subprocess.run(
                    ["make", "-C", os.path.abspath(_NATIVE_DIR)],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            except Exception:
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            _build_failed = True
            return None
        lib.sfm_decode.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.sfm_decode.restype = ctypes.c_int
        lib.sfm_copy_gray.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_long,
        ]
        lib.sfm_copy_gray.restype = ctypes.c_int
        lib.sfm_loader_open.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_long,
            ctypes.c_int,
        ]
        lib.sfm_loader_open.restype = ctypes.c_void_p
        lib.sfm_loader_get.argtypes = [
            ctypes.c_void_p,
            ctypes.c_long,
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.sfm_loader_get.restype = ctypes.c_int
        lib.sfm_loader_copy.argtypes = [
            ctypes.c_void_p,
            ctypes.c_long,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_long,
        ]
        lib.sfm_loader_copy.restype = ctypes.c_int
        lib.sfm_loader_close.argtypes = [ctypes.c_void_p]
        lib.sfm_loader_close.restype = None
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load_library() is not None


def decode_grayscale(path: str) -> np.ndarray | None:
    """Decode one image natively -> float32 (H, W), or None if unsupported."""
    lib = _load_library()
    if lib is None:
        return None
    w = ctypes.c_int()
    h = ctypes.c_int()
    if lib.sfm_decode(path.encode(), ctypes.byref(w), ctypes.byref(h)) != 0:
        return None
    out = np.empty((h.value, w.value), dtype=np.float32)
    rc = lib.sfm_copy_gray(
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), out.size
    )
    return out if rc == 0 else None


class PrefetchingLoader:
    """Background-threaded sequence loader: decode of frame k+1 overlaps
    compute of frame k. Iterate to get float32 (H, W) grayscale arrays."""

    def __init__(self, paths: list[str], n_threads: int = 2):
        self._paths = list(paths)
        self._lib = _load_library()
        self._handle = None
        if self._lib is not None:
            arr = (ctypes.c_char_p * len(paths))(
                *[p.encode() for p in self._paths]
            )
            self._handle = self._lib.sfm_loader_open(arr, len(paths), n_threads)

    def __len__(self):
        return len(self._paths)

    def get(self, index: int) -> np.ndarray:
        if self._handle:
            w = ctypes.c_int()
            h = ctypes.c_int()
            rc = self._lib.sfm_loader_get(
                self._handle, index, ctypes.byref(w), ctypes.byref(h)
            )
            if rc == 0:
                out = np.empty((h.value, w.value), dtype=np.float32)
                rc = self._lib.sfm_loader_copy(
                    self._handle,
                    index,
                    out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                    out.size,
                )
                if rc == 0:
                    return out
        from structure_from_motion_tpu.io.datasets import load_image_grayscale

        return load_image_grayscale(self._paths[index])

    def __iter__(self):
        for i in range(len(self._paths)):
            yield self.get(i)

    def close(self):
        if self._handle and self._lib:
            self._lib.sfm_loader_close(self._handle)
            self._handle = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass
