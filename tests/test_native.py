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
    monkeypatch.setattr(native, "_png_lib", lambda: None)
    assert np.array_equal(_decode(native.encode_png_rgb8(arr)), arr)


def test_native_is_used_in_this_image():
    # the toolchain (g++, libpng, zlib) is part of the TPU-VM image this
    # framework targets; if this fails the serving path silently lost its
    # fast encoder
    assert native.native_available()
    assert native.jpeg_available()


# ---------------------------------------------------------------------------
# fast_jpeg
# ---------------------------------------------------------------------------

def _photo_jpeg(h, w, seed, subsampling=-1, mode="RGB"):
    """Photo-like JPEG bytes (smoothed noise; random noise is a degenerate
    JPEG case)."""
    rng = np.random.default_rng(seed)
    x = rng.integers(0, 255, (h, w, 3)).astype(np.float32)
    for _ in range(2):
        x = (x + np.roll(x, 1, 0) + np.roll(x, 1, 1)) / 3
    img = Image.fromarray(np.clip(x, 0, 255).astype(np.uint8)).convert(mode)
    buf = io.BytesIO()
    img.save(buf, format="JPEG", quality=85, subsampling=subsampling)
    return buf.getvalue()


def test_jpeg_dims_and_full_decode_match_pil():
    data = _photo_jpeg(120, 88, seed=1)
    assert native.jpeg_dims(data) == (88, 120)
    pil = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    assert np.array_equal(native.decode_jpeg_rgb8(data), pil)


@pytest.mark.parametrize("subsampling", [0, 1, 2])  # 4:4:4, 4:2:2, 4:2:0
def test_jpeg_crop_decode_identical_to_full(subsampling):
    """Region decode must be pixel-identical to full-decode-then-crop for
    arbitrary (including iMCU-unaligned and image-edge) regions."""
    h, w = 167, 211
    data = _photo_jpeg(h, w, seed=2 + subsampling, subsampling=subsampling)
    full = native.decode_jpeg_rgb8(data)
    rng = np.random.default_rng(subsampling)
    regions = [(0, 0, w, h), (0, 0, 50, 50), (w - 50, h - 50, 50, 50),
               (3, 5, 1, 1)]
    regions += [
        (int(rng.integers(0, w - cw + 1)), int(rng.integers(0, h - ch + 1)),
         cw, ch)
        for cw, ch in ((64, 64), (100, 37), (199, 150))
    ]
    for x0, y0, cw, ch in regions:
        crop = native.decode_jpeg_crop_rgb8(data, x0, y0, cw, ch)
        assert crop is not None
        assert np.array_equal(crop, full[y0:y0 + ch, x0:x0 + cw]), \
            (x0, y0, cw, ch)


def test_jpeg_grayscale_decodes_as_rgb():
    data = _photo_jpeg(96, 96, seed=9, mode="L")
    pil = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    assert np.array_equal(native.decode_jpeg_rgb8(data), pil)
    crop = native.decode_jpeg_crop_rgb8(data, 10, 20, 30, 40)
    assert np.array_equal(crop, pil[20:60, 10:40])


def test_jpeg_bad_input_falls_back_or_none():
    assert native.jpeg_dims(b"not a jpeg") is None
    assert native.decode_jpeg_crop_rgb8(b"not a jpeg", 0, 0, 4, 4) is None
    data = _photo_jpeg(32, 32, seed=3)
    # out-of-bounds region
    assert native.decode_jpeg_crop_rgb8(data, 20, 20, 32, 32) is None


def test_jpeg_encode_roundtrip_and_fallback(monkeypatch):
    rng = np.random.default_rng(11)
    x = rng.integers(0, 255, (96, 128, 3)).astype(np.float32)
    for _ in range(2):
        x = (x + np.roll(x, 1, 0) + np.roll(x, 1, 1)) / 3
    arr = np.clip(x, 0, 255).astype(np.uint8)

    data = native.encode_jpeg_rgb8(arr, quality=95)
    assert data[:2] == b"\xff\xd8"  # JPEG SOI
    # Compare against PIL's encode at the same quality via DECODED pixels:
    # when both link the same libjpeg the streams are byte-identical, but
    # a different system libjpeg than PIL's bundled one emits a
    # different-but-valid stream, so pixel closeness is the real contract.
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG", quality=95)
    pil_px = np.asarray(Image.open(buf).convert("RGB"), np.int16)
    nat_px = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"), np.int16)
    assert np.abs(nat_px - pil_px).mean() < 1.0
    assert 0.7 < len(data) / buf.getbuffer().nbytes < 1.4
    # smaller than the PNG of the same content
    assert len(data) < len(native.encode_png_rgb8(arr, 1)) // 2

    monkeypatch.setattr(native, "_jpeg_lib", lambda: None)
    fb = native.encode_jpeg_rgb8(arr, quality=95)  # PIL fallback
    fb_px = np.asarray(Image.open(io.BytesIO(fb)).convert("RGB"), np.int16)
    assert np.abs(fb_px - pil_px).mean() < 1.0
    with pytest.raises(ValueError):
        native.encode_jpeg_rgb8(np.zeros((4, 4), np.uint8))
