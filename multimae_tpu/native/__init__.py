"""ctypes bindings for the native fast-image library (fastimage.cpp).

Auto-builds libfastimage.so with g++ on first import (cached next to the
source). Falls back cleanly: `available()` is False if the toolchain or
libjpeg are missing, and callers use the PIL path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "fastimage.cpp")
_SO = os.path.join(_DIR, "libfastimage.so")

_lib = None
_tried = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        _SRC, "-o", _SO, "-ljpeg", "-lpng16",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=240)
        return True
    except Exception as e:  # toolchain/libjpeg missing -> PIL fallback
        print(f"[fastimage] build failed, falling back to PIL: {e}")
        return False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError as e:
        print(f"[fastimage] load failed: {e}")
        return None
    lib.mm_decode_jpeg.restype = ctypes.c_int
    lib.mm_decode_jpeg.argtypes = [
        ctypes.c_char_p, ctypes.c_long, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    lib.mm_crop_resize_normalize.restype = ctypes.c_int
    lib.mm_crop_resize_normalize.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int, ctypes.c_int,
    ]
    lib.mm_decode_png.restype = ctypes.c_int
    lib.mm_decode_png.argtypes = [
        ctypes.c_char_p, ctypes.c_long, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    lib.mm_crop_resize_u8.restype = ctypes.c_int
    lib.mm_crop_resize_u8.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int,
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


# Per-THREAD scratch for decode_jpeg/decode_png: grown on demand,
# reused — a fresh worst-case allocation per image costs page faults at
# 25 MB+. Grain workers are processes (one buffer each), but a
# thread-based prefetcher may decode concurrently within one process,
# so the buffer is thread-local rather than module-global.
_DECODE_TLS = threading.local()


def _decode_buf() -> np.ndarray:
    buf = getattr(_DECODE_TLS, "buf", None)
    if buf is None:
        buf = _DECODE_TLS.buf = np.empty(8 * 1024 * 1024 * 3, np.uint8)
    return buf


def decode_jpeg(data: bytes, min_size: int = 0) -> Optional[np.ndarray]:
    """Decode JPEG bytes to (H, W, 3) uint8. min_size > 0 enables DCT-domain
    downscaling: decodes at the largest 1/2^k scale whose short side still
    >= min_size. Returns None on failure (caller falls back to PIL)."""
    lib = _load()
    if lib is None:
        return None
    h = ctypes.c_int()
    w = ctypes.c_int()
    while True:
        out = _decode_buf()
        rc = lib.mm_decode_jpeg(
            data, len(data), min_size,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), out.size,
            ctypes.byref(h), ctypes.byref(w),
        )
        if rc == -3 and out.size < 64 * 1024 * 1024 * 3:  # too small: grow
            _DECODE_TLS.buf = np.empty(out.size * 4, np.uint8)
            continue
        break
    if rc != 0:
        return None
    return out[: h.value * w.value * 3].reshape(h.value, w.value, 3).copy()


def decode_png(data: bytes, want_rgb: bool = False) -> Optional[np.ndarray]:
    """Decode PNG bytes via libpng16.

    want_rgb: (H, W, 3) uint8 (palette/gray expanded, 16-bit stripped).
    Otherwise the raw representation: palette -> (H, W) uint8 indices,
    16-bit gray -> (H, W) uint16 (native endian), 8-bit gray -> (H, W)
    uint8, RGB stays (H, W, 3) uint8. Alpha is stripped. Returns None on
    failure (caller falls back to PIL)."""
    lib = _load()
    if lib is None:
        return None
    h = ctypes.c_int()
    w = ctypes.c_int()
    c = ctypes.c_int()
    depth = ctypes.c_int()
    while True:
        out = _decode_buf()
        rc = lib.mm_decode_png(
            data, len(data), int(want_rgb),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), out.size,
            ctypes.byref(h), ctypes.byref(w), ctypes.byref(c),
            ctypes.byref(depth),
        )
        if rc == -3 and out.size < 64 * 1024 * 1024 * 3:
            _DECODE_TLS.buf = np.empty(out.size * 4, np.uint8)
            continue
        break
    if rc != 0:
        return None
    nbytes = h.value * w.value * c.value * (depth.value // 8)
    arr = out[:nbytes]
    if depth.value == 16:
        arr = arr.view(np.uint16)
    if c.value > 1:
        return arr.reshape(h.value, w.value, c.value).copy()
    return arr.reshape(h.value, w.value).copy()


def crop_resize_normalize(
    src: np.ndarray,
    crop: Tuple[int, int, int, int],
    size: Tuple[int, int],
    mean: Sequence[float],
    std: Sequence[float],
    bicubic: bool = True,
    hflip: bool = False,
) -> Optional[np.ndarray]:
    """Fused crop (i, j, h, w) + PIL-antialiased resize + flip + normalize.

    src: (H, W, C) uint8 -> (dh, dw, C) float32.
    """
    lib = _load()
    if lib is None:
        return None
    src = np.ascontiguousarray(src, np.uint8)
    sh, sw, c = src.shape
    i, j, h, w = crop
    dh, dw = size
    dst = np.empty((dh, dw, c), np.float32)
    mean_arr = np.ascontiguousarray(mean, np.float32)
    std_arr = np.ascontiguousarray(std, np.float32)
    rc = lib.mm_crop_resize_normalize(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), sh, sw, c,
        i, j, h, w,
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), dh, dw,
        mean_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        std_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        int(bicubic), int(hflip),
    )
    return dst if rc == 0 else None


def crop_resize_u8(
    src: np.ndarray,
    crop: Tuple[int, int, int, int],
    size: Tuple[int, int],
    bicubic: bool = True,
    hflip: bool = False,
) -> Optional[np.ndarray]:
    """Fused crop + PIL-antialiased resize, uint8 -> uint8."""
    lib = _load()
    if lib is None:
        return None
    src = np.ascontiguousarray(src, np.uint8)
    sh, sw, c = src.shape
    i, j, h, w = crop
    dh, dw = size
    dst = np.empty((dh, dw, c), np.uint8)
    rc = lib.mm_crop_resize_u8(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), sh, sw, c,
        i, j, h, w,
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), dh, dw,
        int(bicubic), int(hflip),
    )
    return dst if rc == 0 else None
