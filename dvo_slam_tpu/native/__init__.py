"""ctypes bindings for the native host runtime (PNG decode + prefetch).

Builds lazily with `make` on first use if the shared library is missing;
falls back to the pure-Python (cv2) path in utils/tum.py when no compiler
is available. See loader.cpp for the C ABI.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libdvo_native.so")
_lib = None
_build_failed = False  # a failed `make` is cached: callers probe per frame


class NativeUnavailable(RuntimeError):
    pass


def _build() -> bool:
    global _build_failed
    try:
        subprocess.run(
            ["make", "-C", _DIR, "libdvo_native.so"],
            check=True, capture_output=True, timeout=240,
        )
        if os.path.exists(_LIB_PATH):
            return True
    except Exception:
        pass
    _build_failed = True
    return False


def load_library(auto_build: bool = True):
    """Load (building if needed) the native library; raises NativeUnavailable."""
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        # The failure latch only skips re-running a failing `make` once
        # per frame (available() is probed inside per-frame loaders) — a
        # library that appeared on disk since is still loaded.
        if _build_failed:
            raise NativeUnavailable("libdvo_native.so build failed earlier")
        if auto_build:
            _build()
    if not os.path.exists(_LIB_PATH):
        raise NativeUnavailable("libdvo_native.so missing and build failed")
    lib = ctypes.CDLL(_LIB_PATH)
    lib.dvo_decode_intensity.restype = ctypes.c_int
    lib.dvo_decode_intensity.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
    ]
    lib.dvo_decode_depth.restype = ctypes.c_int
    lib.dvo_decode_depth.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.c_int, ctypes.c_float,
    ]
    lib.dvo_png_size.restype = ctypes.c_int
    lib.dvo_png_size.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    lib.dvo_loader_create.restype = ctypes.c_void_p
    lib.dvo_loader_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_float, ctypes.c_int,
    ]
    lib.dvo_loader_next.restype = ctypes.c_int
    lib.dvo_loader_next.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.dvo_loader_destroy.restype = None
    lib.dvo_loader_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def available() -> bool:
    try:
        load_library()
        return True
    except NativeUnavailable:
        return False


def png_size(path: str):
    lib = load_library()
    w = ctypes.c_int()
    h = ctypes.c_int()
    if lib.dvo_png_size(path.encode(), ctypes.byref(w), ctypes.byref(h)) != 0:
        raise IOError(f"cannot probe {path}")
    # The C side validates the IHDR too (signature + dimension caps), but
    # a stale prebuilt library must not let a corrupt header turn into a
    # negative-dimension ValueError or a multi-GB np.empty in the callers
    # below — those bypass the IOError-driven OpenCV fallback.
    if not (0 < w.value <= (1 << 20) and 0 < h.value <= (1 << 20)
            and w.value * h.value <= (1 << 30)):
        raise IOError(f"implausible PNG header dims {w.value}x{h.value}: {path}")
    return w.value, h.value


def decode_intensity(path: str, width: int, height: int) -> np.ndarray:
    lib = load_library()
    out = np.empty((height, width), np.float32)
    ret = lib.dvo_decode_intensity(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        width, height,
    )
    if ret != 0:
        raise IOError(f"decode failed: {path}")
    return out


def decode_depth(path: str, width: int, height: int, scale: float = 5000.0) -> np.ndarray:
    lib = load_library()
    out = np.empty((height, width), np.float32)
    ret = lib.dvo_decode_depth(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        width, height, scale,
    )
    if ret != 0:
        raise IOError(f"decode failed: {path}")
    return out


class PrefetchLoader:
    """Background-thread RGB-D frame loader (decode overlaps device compute).

    Usage:
        with PrefetchLoader(rgb_paths, depth_paths, W, H) as loader:
            for idx, intensity, depth in loader:
                ...
    """

    def __init__(self, rgb_paths, depth_paths, width, height,
                 depth_scale: float = 5000.0, prefetch: int = 4):
        assert len(rgb_paths) == len(depth_paths)
        self.lib = load_library()
        self.width, self.height = width, height
        self.count = len(rgb_paths)
        self._rgb = (ctypes.c_char_p * self.count)(
            *[p.encode() for p in rgb_paths]
        )
        self._depth = (ctypes.c_char_p * self.count)(
            *[p.encode() for p in depth_paths]
        )
        self.handle = self.lib.dvo_loader_create(
            self._rgb, self._depth, self.count, width, height,
            depth_scale, prefetch,
        )
        if not self.handle:
            raise NativeUnavailable("loader creation failed")

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __iter__(self):
        while True:
            if not self.handle:
                # close() already ran (e.g. the with-block exited while a
                # paused iterator survives) — passing NULL into the C ABI
                # would dereference null in the loader thread.
                raise RuntimeError("PrefetchLoader is closed")
            intensity = np.empty((self.height, self.width), np.float32)
            depth = np.empty((self.height, self.width), np.float32)
            idx = self.lib.dvo_loader_next(
                self.handle,
                intensity.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                depth.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            )
            if idx == -1:
                return
            if idx == -2:
                continue  # decode error: skip frame (reference drops bad msgs)
            yield idx, intensity, depth

    def close(self):
        if self.handle:
            self.lib.dvo_loader_destroy(self.handle)
            self.handle = None

    def __del__(self):
        # Last-resort cleanup for loaders used without the context manager:
        # the C++ decode thread would otherwise outlive the object.
        try:
            self.close()
        except Exception:
            pass
