"""ctypes bindings for the native C++ dataset loader.

The reference's data path is C++ (OpenCV imread inside the Examples mains,
e.g. Examples/RGB-D/rgbd_tum.cc); `native/dataset_loader.cpp` is the TPU
build's native equivalent — zlib-PNG + PNM decode and a std::thread
prefetch pool — consumed here via ctypes (pybind11 is not available in
this environment). Builds on first use with g++ and caches the .so; all
entry points degrade gracefully to the pure-Python loaders in utils/io.py
when a toolchain is unavailable.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libdataset_loader.so")
_SRC_PATH = os.path.join(_NATIVE_DIR, "dataset_loader.cpp")

_lib = None
_lib_lock = threading.Lock()
_build_failed = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC_PATH,
           "-lz", "-lpthread", "-o", _SO_PATH]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib():
    """The loaded shared library, building it on first use; None if the
    native path is unavailable (no g++/zlib)."""
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _lib_lock:
        if _lib is not None or _build_failed:
            return _lib
        if not os.path.exists(_SO_PATH) or (
                os.path.exists(_SRC_PATH) and
                os.path.getmtime(_SRC_PATH) > os.path.getmtime(_SO_PATH)):
            if not os.path.exists(_SRC_PATH) or not _build():
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
        except OSError:
            _build_failed = True
            return None
        lib.dsl_decode.restype = ctypes.c_int
        lib.dsl_decode.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64, ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32)]
        lib.dsl_probe.restype = ctypes.c_int
        lib.dsl_probe.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32)]
        lib.dsl_prefetcher_create.restype = ctypes.c_void_p
        lib.dsl_prefetcher_create.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int]
        lib.dsl_prefetcher_get.restype = ctypes.c_int
        lib.dsl_prefetcher_get.argtypes = [
            ctypes.c_void_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32)]
        lib.dsl_prefetcher_destroy.restype = None
        lib.dsl_prefetcher_destroy.argtypes = [ctypes.c_void_p]
        _lib = lib
    return _lib


def _wrap(buf, w, h, c, bps):
    dt = np.uint16 if bps.value == 2 else np.uint8
    arr = np.frombuffer(buf, dtype=dt,
                        count=w.value * h.value * c.value)
    arr = arr.reshape(h.value, w.value, c.value)
    return arr[..., 0] if c.value == 1 else arr


def load_image_native(path: str):
    """Decode one image with the native library; None on any failure."""
    lib = get_lib()
    if lib is None:
        return None
    w = ctypes.c_int32()
    h = ctypes.c_int32()
    c = ctypes.c_int32()
    bps = ctypes.c_int32()
    if lib.dsl_probe(path.encode(), ctypes.byref(w), ctypes.byref(h),
                     ctypes.byref(c), ctypes.byref(bps)) != 0:
        return None
    cap = w.value * h.value * c.value * bps.value
    buf = (ctypes.c_uint8 * cap)()
    rc = lib.dsl_decode(path.encode(), buf, cap, ctypes.byref(w),
                        ctypes.byref(h), ctypes.byref(c), ctypes.byref(bps))
    if rc != 0:
        return None
    return _wrap(buf, w, h, c, bps).copy()


class ImagePrefetcher:
    """Sequential dataset reader with native threaded read-ahead.

    for img in ImagePrefetcher(paths): ...  — images arrive decoded while
    the previous frame is on the device (reference analogue: the Examples
    mains' synchronous cv::imread loop, which the OS page cache pipelines).
    Falls back to synchronous io.load_image when the native lib is absent.
    """

    def __init__(self, paths, n_threads: int = 2, window: int = 8):
        self.paths = list(paths)
        self._handle = None
        lib = get_lib()
        if lib is not None and self.paths:
            arr = (ctypes.c_char_p * len(self.paths))(
                *[p.encode() for p in self.paths])
            self._arr = arr          # keep alive
            self._handle = lib.dsl_prefetcher_create(
                arr, len(self.paths), n_threads, window)
            self._lib = lib

    def __len__(self):
        return len(self.paths)

    def __iter__(self):
        for i in range(len(self.paths)):
            yield self.get(i)

    def get(self, i: int):
        if self._handle is None:
            from dani_slam_tpu.utils.io import load_image
            return load_image(self.paths[i])
        w = ctypes.c_int32()
        h = ctypes.c_int32()
        c = ctypes.c_int32()
        bps = ctypes.c_int32()
        cap = 4 * 4096 * 4096
        buf = (ctypes.c_uint8 * cap)()
        rc = self._lib.dsl_prefetcher_get(
            self._handle, i, buf, cap, ctypes.byref(w), ctypes.byref(h),
            ctypes.byref(c), ctypes.byref(bps))
        if rc != 0:
            from dani_slam_tpu.utils.io import load_image
            return load_image(self.paths[i])
        return _wrap(buf, w, h, c, bps).copy()

    def close(self):
        if self._handle is not None:
            self._lib.dsl_prefetcher_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
