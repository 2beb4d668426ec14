"""PixelShuffle (depth-to-space) in NHWC.

Matches torch ``nn.PixelShuffle`` channel semantics translated to NHWC:
``out[b, h*r+i, w*r+j, c] = x[b, h, w, c*r*r + i*r + j]``
(reference uses it in both upsample tails, src/models.py:116-123,160-167).

Two formulations, chosen by (static) spatial size — both bit-identical,
golden-tested vs torch:

* small tiles (the 50-200px training/serving geometry): one 6-D
  reshape+transpose — XLA fuses it best there (the two-step form measured
  6% slower end-to-end at batch 512 x 50px);
* wide tiles: two single-axis interleaves — the 6-D form materializes a
  (..., r, ..., r, C) copy whose tiny minor dims tile badly (measured 2x
  padded HBM expansion at 8x288x288x256; that padded copy is what OOMed
  large tiled-inference windows).
"""
from __future__ import annotations

import jax.numpy as jnp

# spatial-area threshold between the two formulations (static at trace time)
_WIDE_AREA = 128 * 128


def pixel_shuffle(x: jnp.ndarray, r: int) -> jnp.ndarray:
    n, h, w, crr = x.shape
    if crr % (r * r) != 0:
        raise ValueError(f"channels {crr} not divisible by r^2={r * r}")
    c = crr // (r * r)
    if h * w < _WIDE_AREA:
        x = x.reshape(n, h, w, c, r, r)
        x = x.transpose(0, 1, 4, 2, 5, 3)  # N, H, i, W, j, C
        return x.reshape(n, h * r, w * r, c)
    # channel index factorizes as (c, i, j), j fastest
    # step 1: interleave j into W  -> [b, h, w*r, c*r] (channel = (c, i))
    x = x.reshape(n, h, w, c * r, r)
    x = x.transpose(0, 1, 2, 4, 3).reshape(n, h, w * r, c * r)
    # step 2: interleave i into H  -> [b, h*r, w*r, c]
    x = x.reshape(n, h, w * r, c, r)
    x = x.transpose(0, 1, 4, 2, 3).reshape(n, h * r, w * r, c)
    return x


def pixel_unshuffle(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """Exact inverse of :func:`pixel_shuffle` (space-to-depth into the same
    ``c*r*r + i*r + j`` channel layout): ``pixel_unshuffle(pixel_shuffle(z,
    r), r) == z``. Used to move images into phase space for the fused
    phase-space SR tail (ops/subpixel_conv.py) and in its exactness tests."""
    n, h, w, c = x.shape
    if h % r or w % r:
        raise ValueError(f"spatial dims {h}x{w} not divisible by r={r}")
    x = x.reshape(n, h // r, r, w // r, r, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # N, H, W, c, i, j
    return x.reshape(n, h // r, w // r, c * r * r)
