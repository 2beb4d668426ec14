"""Native C++ host components (food101_sr_tpu.native).

The reference has no native layer (SURVEY.md §2: pure Python); these cover
the serving-path PNG encoder: lossless round-trip through an independent
decoder (PIL), the pure-Python fallback, and input validation.
"""
import io

import numpy as np
import pytest
from PIL import Image

from food101_sr_tpu import native


def _decode(data: bytes) -> np.ndarray:
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    return np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))


@pytest.mark.parametrize("shape", [(1, 1, 3), (40, 56, 3), (257, 123, 3)])
def test_encode_roundtrip_lossless(shape):
    arr = np.random.default_rng(hash(shape) % 2**32).integers(
        0, 256, shape, dtype=np.uint8)
    for level in (0, 1, 6):
        assert np.array_equal(_decode(native.encode_png_rgb8(arr, level)), arr)


def test_encode_noncontiguous_input():
    big = np.random.default_rng(7).integers(0, 256, (64, 64, 4), dtype=np.uint8)
    view = big[5:37, 3:51, :3]  # non-contiguous slice
    assert np.array_equal(_decode(native.encode_png_rgb8(view)), view)


def test_encode_rejects_bad_input():
    with pytest.raises(ValueError):
        native.encode_png_rgb8(np.zeros((4, 4, 3), np.float32))
    with pytest.raises(ValueError):
        native.encode_png_rgb8(np.zeros((4, 4), np.uint8))


def test_fallback_matches_when_native_disabled(monkeypatch):
    arr = np.random.default_rng(3).integers(0, 256, (30, 20, 3), dtype=np.uint8)
    monkeypatch.setattr(native, "_load", lambda: None)
    assert np.array_equal(_decode(native.encode_png_rgb8(arr)), arr)


def test_native_is_used_in_this_image():
    # the toolchain (g++, libpng, zlib) is part of the TPU-VM image this
    # framework targets; if this fails the serving path silently lost its
    # fast encoder
    assert native.native_available()
