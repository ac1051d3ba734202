"""ctypes bindings for the native (C++) FGID data loader.

Builds native/libfgid_loader.so on first use (g++, libjpeg, libpng, pthread)
and exposes:
  - NativeImageLoader: threaded prefetching batch loader
    (the reference's torch-DataLoader-worker equivalent, train.py:201-207)
  - decode_resize_normalize: single-image fast path

Falls back cleanly (HAS_NATIVE=False) where the toolchain or libs are absent.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, NamedTuple, Optional

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "fgid_loader.cpp")
_SO = os.path.join(_REPO_ROOT, "native", "libfgid_loader.so")

_lib = None
HAS_NATIVE: Optional[bool] = None


def _build() -> bool:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _SO,
           "-ljpeg", "-lpng", "-lpthread"]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return True
    except Exception:
        return False


def get_lib():
    global _lib, HAS_NATIVE
    if _lib is not None or HAS_NATIVE is False:
        return _lib
    if not os.path.exists(_SO) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_SO)):
        if not _build():
            HAS_NATIVE = False
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        HAS_NATIVE = False
        return None
    lib.fgid_loader_create.restype = ctypes.c_void_p
    lib.fgid_loader_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int]
    lib.fgid_loader_next.restype = ctypes.c_int
    lib.fgid_loader_next.argtypes = [ctypes.c_void_p,
                                     ctypes.POINTER(ctypes.c_float),
                                     ctypes.POINTER(ctypes.c_longlong),
                                     ctypes.POINTER(ctypes.c_uint8)]
    lib.fgid_loader_destroy.argtypes = [ctypes.c_void_p]
    lib.fgid_decode_resize.restype = ctypes.c_int
    lib.fgid_decode_resize.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int, ctypes.POINTER(ctypes.c_float)]
    _lib = lib
    HAS_NATIVE = True
    return _lib


def _fvec3(v) -> ctypes.Array:
    return (ctypes.c_float * 3)(*[float(x) for x in v])


def decode_resize_normalize(path: str, height: int, width: int,
                            mean=(0.0, 0.0, 0.0), std=(1.0, 1.0, 1.0),
                            center_crop: bool = False
                            ) -> Optional[np.ndarray]:
    """JPEG/PNG -> (H, W, 3) fp32 normalized; None on decode failure."""
    lib = get_lib()
    if lib is None:
        return None
    out = np.empty((height, width, 3), np.float32)
    rc = lib.fgid_decode_resize(
        path.encode(), height, width, _fvec3(mean), _fvec3(std),
        int(center_crop),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out if rc == 0 else None


class LoaderBatch(NamedTuple):
    """One decoded batch, delivered strictly in path order.

    start:  index into the constructor's path list of images[0]
    images: (batch, H, W, 3) fp32; failed/padded slots are all-zero
    ok:     (batch,) bool decode-success flags for safe label pairing
    """
    start: int
    images: np.ndarray
    ok: np.ndarray


class NativeImageLoader:
    """Iterate LoaderBatch tuples decoded by the C++ worker pool.

    Batches arrive in path order regardless of worker completion order, so
    labels/captions paired by position on the Python side can never mispair
    (the C++ side reorders; see native/fgid_loader.cpp fgid_loader_next)."""

    def __init__(self, paths: List[str], height: int, width: int,
                 batch: int, threads: int = 4,
                 mean=(0.0, 0.0, 0.0), std=(1.0, 1.0, 1.0),
                 center_crop: bool = False):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native loader unavailable")
        self._lib = lib
        self.batch, self.height, self.width = batch, height, width
        c_paths = (ctypes.c_char_p * len(paths))(
            *[p.encode() for p in paths])
        self._handle = lib.fgid_loader_create(
            c_paths, len(paths), height, width, batch, threads,
            _fvec3(mean), _fvec3(std), int(center_crop))
        self._exhausted = False

    def __iter__(self):
        return self

    def __next__(self) -> LoaderBatch:
        if self._exhausted:
            raise StopIteration
        out = np.empty((self.batch, self.height, self.width, 3), np.float32)
        start = ctypes.c_longlong(-1)
        ok = np.zeros((self.batch,), np.uint8)
        rc = self._lib.fgid_loader_next(
            self._handle, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ctypes.byref(start), ok.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        if rc < 0:
            self._exhausted = True
            raise StopIteration
        if rc == 0:
            self._exhausted = True
        return LoaderBatch(int(start.value), out, ok.astype(bool))

    def close(self):
        if self._handle:
            self._lib.fgid_loader_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
