"""Native (C++) host-runtime components, loaded via ctypes.

The reference is pure Python with no native layer (SURVEY.md §2); here the
TPU compute path is XLA/Pallas, and the *host* hot paths that sit outside
the jit boundary are C++:

- ``fast_png.cpp``  — PNG response encoding for serve.py
- ``fast_jpeg.cpp`` — JPEG decode (full + fused region decode) for the
  training input pipeline's random-crop loading

ctypes keeps the binding layer dependency-free (no pybind11 in this image)
and releases the GIL for the duration of each call, so native work from
worker threads overlaps with Python. Each shared library is compiled on
first use if a toolchain is present (g++, libpng, libjpeg, zlib — stock on
TPU-VM images); every entry point has a pure PIL/numpy fallback so the
package works without it.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_lock = threading.Lock()
_libs: dict = {}


def _load(stem: str, link: tuple, register) -> Optional[ctypes.CDLL]:
    """Build (if stale) + load native/<stem>.so; None when unavailable."""
    with _lock:
        if stem in _libs:
            return _libs[stem]
        src = os.path.join(_DIR, f"{stem}.cpp")
        so = os.path.join(_DIR, f"lib{stem}.so")
        lib = None
        try:
            fresh = (os.path.exists(so)
                     and os.path.getmtime(so) >= os.path.getmtime(src))
            if not fresh:
                cmd = ["g++", "-O3", "-shared", "-fPIC", src,
                       *link, "-o", so]
                fresh = subprocess.run(
                    cmd, capture_output=True, timeout=120).returncode == 0
            if fresh:
                lib = ctypes.CDLL(so)
                register(lib)
        except (OSError, subprocess.TimeoutExpired):
            lib = None
        _libs[stem] = lib
        return lib


# ---------------------------------------------------------------------------
# fast_png — serving-path PNG encode
# ---------------------------------------------------------------------------

def _register_png(lib):
    lib.fastpng_encode_rgb8.restype = ctypes.c_long
    lib.fastpng_encode_rgb8.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_char_p, ctypes.c_long,
    ]


def _png_lib():
    return _load("fast_png", ("-lpng", "-lz"), _register_png)


def native_available() -> bool:
    return _png_lib() is not None


def encode_png_rgb8(arr: np.ndarray, level: int = 1) -> bytes:
    """uint8 HxWx3 -> PNG bytes. C++ fast path (fixed SUB filter, ~2x PIL
    at zlib level 1 with comparable file size), PIL fallback."""
    if arr.dtype != np.uint8 or arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"expected uint8 HxWx3, got {arr.dtype} {arr.shape}")
    lib = _png_lib()
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


# ---------------------------------------------------------------------------
# fast_jpeg — input-pipeline JPEG decode (full + fused region decode)
# ---------------------------------------------------------------------------

def _register_jpeg(lib):
    lib.fastjpeg_dims.restype = ctypes.c_int
    lib.fastjpeg_dims.argtypes = [
        ctypes.c_char_p, ctypes.c_long,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    lib.fastjpeg_decode_rgb8.restype = ctypes.c_int
    lib.fastjpeg_decode_rgb8.argtypes = [
        ctypes.c_char_p, ctypes.c_long, ctypes.c_char_p, ctypes.c_long,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    lib.fastjpeg_decode_crop_rgb8.restype = ctypes.c_int
    lib.fastjpeg_decode_crop_rgb8.argtypes = [
        ctypes.c_char_p, ctypes.c_long,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_char_p, ctypes.c_long,
    ]
    lib.fastjpeg_encode_rgb8.restype = ctypes.c_long
    lib.fastjpeg_encode_rgb8.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_char_p, ctypes.c_long,
    ]


def _jpeg_lib():
    return _load("fast_jpeg", ("-ljpeg",), _register_jpeg)


def jpeg_available() -> bool:
    return _jpeg_lib() is not None


def jpeg_dims(data: bytes) -> Optional[tuple]:
    """(width, height) from the JPEG header only; None if not decodable
    natively (caller falls back to PIL)."""
    lib = _jpeg_lib()
    if lib is None:
        return None
    w, h = ctypes.c_int(), ctypes.c_int()
    if lib.fastjpeg_dims(data, len(data), ctypes.byref(w),
                         ctypes.byref(h)) != 0:
        return None
    return w.value, h.value


def decode_jpeg_rgb8(data: bytes) -> np.ndarray:
    """JPEG bytes -> uint8 HxWx3. C++ fast path, PIL fallback."""
    lib = _jpeg_lib()
    if lib is not None:
        dims = jpeg_dims(data)
        if dims is not None:
            w, h = dims
            out = np.empty((h, w, 3), np.uint8)
            w2, h2 = ctypes.c_int(), ctypes.c_int()
            if lib.fastjpeg_decode_rgb8(
                    data, len(data), out.ctypes.data_as(ctypes.c_char_p),
                    out.nbytes, ctypes.byref(w2), ctypes.byref(h2)) == 0:
                return out
    import io

    from PIL import Image

    return np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))


def encode_jpeg_rgb8(arr: np.ndarray, quality: int = 90) -> bytes:
    """uint8 HxWx3 -> JPEG bytes. C++ fast path, PIL fallback. For
    photographic SR serving output a quality-90 JPEG is ~10x smaller than
    a fast PNG and encodes faster."""
    if arr.dtype != np.uint8 or arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"expected uint8 HxWx3, got {arr.dtype} {arr.shape}")
    lib = _jpeg_lib()
    if lib is not None:
        h, w = arr.shape[:2]
        arr = np.ascontiguousarray(arr)
        cap = arr.nbytes + 65536  # JPEG can't exceed raw + headers in practice
        out = ctypes.create_string_buffer(cap)
        n = lib.fastjpeg_encode_rgb8(
            arr.ctypes.data_as(ctypes.c_char_p), w, h, int(quality), out, cap)
        if n > 0:
            return out.raw[:n]
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG", quality=int(quality))
    return buf.getvalue()


def decode_jpeg_crop_rgb8(data: bytes, x0: int, y0: int, cw: int,
                          ch: int) -> Optional[np.ndarray]:
    """Decode exactly the [y0:y0+ch, x0:x0+cw] region of a JPEG.

    Pays only for the scanlines (jpeg_skip_scanlines) and iMCU columns
    (jpeg_crop_scanline) the crop touches — ~4-6x cheaper than a full
    decode for a 200px training crop of a 512px Food-101 image. Pixels are
    identical to full-decode-then-crop. Returns None when the native
    library is unavailable or the region/stream is unsupported (caller
    falls back to full decode)."""
    lib = _jpeg_lib()
    if lib is None:
        return None
    out = np.empty((ch, cw, 3), np.uint8)
    ok = lib.fastjpeg_decode_crop_rgb8(
        data, len(data), int(x0), int(y0), int(cw), int(ch),
        out.ctypes.data_as(ctypes.c_char_p), out.nbytes)
    return out if ok == 0 else None
