"""Native (C++) host-runtime components, loaded via ctypes.

The reference is pure Python with no native layer (SURVEY.md §2); here the
TPU compute path is XLA/Pallas, and the *host* hot paths that sit outside
the jit boundary — currently PNG response encoding in serve.py — are C++.
ctypes keeps the binding layer dependency-free (no pybind11 in this image)
and releases the GIL for the duration of each call, so encodes from the
HTTP worker threads overlap with Python request handling.

The shared library is compiled on first import if a toolchain is present
(g++, libpng, zlib — stock on TPU-VM images); every entry point has a pure
PIL/numpy fallback so the package works without it.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "fast_png.cpp")
_LIB = os.path.join(_DIR, "libfastpng.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-shared", "-fPIC", _SRC, "-lpng", "-lz",
           "-o", _LIB]
    try:
        r = subprocess.run(cmd, capture_output=True, timeout=120)
        return r.returncode == 0
    except (OSError, subprocess.TimeoutExpired):
        return False


def _load():
    """Return the ctypes lib, building it if needed; None when unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        fresh = (os.path.exists(_LIB)
                 and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC))
        if not fresh and not _build():
            return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None
        lib.fastpng_encode_rgb8.restype = ctypes.c_long
        lib.fastpng_encode_rgb8.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_char_p, ctypes.c_long,
        ]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


def encode_png_rgb8(arr: np.ndarray, level: int = 1) -> bytes:
    """uint8 HxWx3 -> PNG bytes. C++ fast path (fixed SUB filter, ~2x PIL
    at zlib level 1 with comparable file size), PIL fallback."""
    if arr.dtype != np.uint8 or arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"expected uint8 HxWx3, got {arr.dtype} {arr.shape}")
    lib = _load()
    if lib is not None:
        h, w = arr.shape[:2]
        arr = np.ascontiguousarray(arr)
        # worst case: incompressible rows + zlib expansion + headers
        cap = arr.nbytes + (arr.nbytes >> 6) + (h + 1) * 16 + 4096
        out = ctypes.create_string_buffer(cap)
        n = lib.fastpng_encode_rgb8(
            arr.ctypes.data_as(ctypes.c_char_p), w, h, int(level), 0,
            out, cap)
        if n > 0:
            return out.raw[:n]
    # fallback: PIL
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG", compress_level=level)
    return buf.getvalue()
