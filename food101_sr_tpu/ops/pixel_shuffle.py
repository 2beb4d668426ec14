"""PixelShuffle (depth-to-space) in NHWC.

Matches torch ``nn.PixelShuffle`` channel semantics translated to NHWC:
``out[b, h*r+i, w*r+j, c] = x[b, h, w, c*r*r + i*r + j]``
(reference uses it in both upsample tails, src/models.py:116-123,160-167).

Implemented as TWO single-axis interleaves instead of one 6-D transpose:
the 6-D form materializes a (..., r, ..., r, C) copy whose tiny minor dims
tile badly on TPU (measured 2x padded HBM expansion and 10% slower at
8x288x288x256; the padded copy is what OOMed large tiled-inference
windows). Each step here keeps a wide trailing dim. Numerics are
bit-identical (golden-tested vs torch).
"""
from __future__ import annotations

import jax.numpy as jnp


def pixel_shuffle(x: jnp.ndarray, r: int) -> jnp.ndarray:
    n, h, w, crr = x.shape
    if crr % (r * r) != 0:
        raise ValueError(f"channels {crr} not divisible by r^2={r * r}")
    c = crr // (r * r)
    # channel index factorizes as (c, i, j), j fastest
    # step 1: interleave j into W  -> [b, h, w*r, c*r] (channel = (c, i))
    x = x.reshape(n, h, w, c * r, r)
    x = x.transpose(0, 1, 2, 4, 3).reshape(n, h, w * r, c * r)
    # step 2: interleave i into H  -> [b, h*r, w*r, c]
    x = x.reshape(n, h, w * r, c, r)
    x = x.transpose(0, 1, 4, 2, 3).reshape(n, h * r, w * r, c)
    return x
