"""ctypes bindings for the native IO runtime (native/surfio.cpp).

The shared library is built on demand with g++ (cached next to the
source); every entry point falls back to the pure-Python codecs when the
toolchain or library is unavailable, so the framework stays importable
everywhere.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native", "surfio.cpp")
_LIB_PATH = os.path.join(os.path.dirname(_SRC), "libsurfio.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> str | None:
    if os.path.exists(_LIB_PATH) and (
            os.path.getmtime(_LIB_PATH) >= os.path.getmtime(_SRC)):
        return _LIB_PATH
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", "-pthread",
             _SRC, "-o", _LIB_PATH],
            check=True, capture_output=True, timeout=120)
        return _LIB_PATH
    except (OSError, subprocess.SubprocessError):
        return None


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        path = _build()
        if path is None:
            return None
        try:
            lib = ctypes.CDLL(path)
        except OSError:
            return None
        u8p = ctypes.POINTER(ctypes.c_uint8)
        ip = ctypes.POINTER(ctypes.c_int)
        lib.surfio_read_gray.argtypes = [ctypes.c_char_p, ip, ip, u8p,
                                         ctypes.c_long]
        lib.surfio_read_gray.restype = ctypes.c_int
        lib.surfio_write_pgm.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                         ctypes.c_int, u8p]
        lib.surfio_write_pgm.restype = ctypes.c_int
        lib.surfio_write_ppm.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                         ctypes.c_int, u8p]
        lib.surfio_write_ppm.restype = ctypes.c_int
        lib.surfio_loader_open.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                           ctypes.c_int]
        lib.surfio_loader_open.restype = ctypes.c_void_p
        lib.surfio_loader_next.argtypes = [ctypes.c_void_p, ip, ip, u8p,
                                           ctypes.c_long]
        lib.surfio_loader_next.restype = ctypes.c_int
        lib.surfio_loader_close.argtypes = [ctypes.c_void_p]
        lib.surfio_loader_close.restype = None
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


_PNM_EXTS = (".pgm", ".ppm", ".pnm")


def _is_pnm(path: str) -> bool:
    return os.path.splitext(path)[1].lower() in _PNM_EXTS


def read_gray(path: str) -> np.ndarray:
    """Decode an image to uint8 (H, W).  PGM/PPM go through the native
    codec when available; other formats (e.g. PNG) and any native decode
    failure fall back to the pure-Python loader."""
    lib = _load()
    if lib is None or not _is_pnm(path):
        from .image import imread_gray
        return imread_gray(path)
    w = ctypes.c_int()
    h = ctypes.c_int()
    null = ctypes.cast(None, ctypes.POINTER(ctypes.c_uint8))
    if lib.surfio_read_gray(path.encode(), ctypes.byref(w),
                            ctypes.byref(h), null, 0) != 0:
        from .image import imread_gray
        return imread_gray(path)
    out = np.empty((h.value, w.value), np.uint8)
    ah, aw = out.shape
    rc = lib.surfio_read_gray(
        path.encode(), ctypes.byref(w), ctypes.byref(h),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), out.nbytes)
    # rc != 0 catches the grow case; the shape check catches the file
    # shrinking between the size query and the fill (the copy succeeds
    # but row stride / tail would be stale garbage)
    if rc != 0 or (h.value, w.value) != (ah, aw):
        from .image import imread_gray
        return imread_gray(path)
    return out


class FrameLoader:
    """Background-threaded prefetching frame loader over an image
    sequence — the host->device IO pipeline for SLAM/demo loops (the
    native analogue of the reference's per-frame imread+upload,
    main.cpp:173-226, overlapped ahead of the accelerator).

    Iterates uint8 (H, W) frames.  Falls back to synchronous Python
    decoding when the native library is unavailable.
    """

    def __init__(self, paths, depth: int = 4):
        self._paths = [str(p) for p in paths]
        self._lib = _load()
        self._handle = None
        self._pos = 0
        # The native codec only speaks PNM; route mixed/PNG sequences to
        # the Python decoder up front rather than failing mid-sequence.
        if (self._lib is not None and self._paths
                and all(_is_pnm(p) for p in self._paths)):
            blob = b"\x00".join(p.encode() for p in self._paths) + b"\x00"
            self._handle = self._lib.surfio_loader_open(
                blob, len(self._paths), depth)

    def __iter__(self):
        return self

    def __next__(self) -> np.ndarray:
        if self._handle is not None:
            w = ctypes.c_int()
            h = ctypes.c_int()
            null = ctypes.cast(None, ctypes.POINTER(ctypes.c_uint8))
            rc = self._lib.surfio_loader_next(
                self._handle, ctypes.byref(w), ctypes.byref(h), null, 0)
            if rc == -2:
                raise StopIteration
            pos = self._pos
            self._pos += 1
            if rc != 0:
                # native decode failure (error return consumed the
                # frame): fall back to the Python decoder for this frame
                from .image import imread_gray
                return imread_gray(self._paths[pos])
            out = np.empty((h.value, w.value), np.uint8)
            rc = self._lib.surfio_loader_next(
                self._handle, ctypes.byref(w), ctypes.byref(h),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                out.nbytes)
            if rc != 0:
                from .image import imread_gray
                return imread_gray(self._paths[pos])
            return out
        if self._pos >= len(self._paths):
            raise StopIteration
        from .image import imread_gray
        img = imread_gray(self._paths[self._pos])
        self._pos += 1
        return img

    def close(self):
        if self._handle is not None:
            self._lib.surfio_loader_close(self._handle)
            self._handle = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
