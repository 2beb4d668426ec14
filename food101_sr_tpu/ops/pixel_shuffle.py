"""PixelShuffle (depth-to-space) in NHWC.

Matches torch ``nn.PixelShuffle`` channel semantics translated to NHWC:
``out[b, h*r+i, w*r+j, c] = x[b, h, w, c*r*r + i*r + j]``
(reference uses it in both upsample tails, src/models.py:116-123,160-167).
Implemented as reshape+transpose, which XLA lowers to a pure layout change.
"""
from __future__ import annotations

import jax.numpy as jnp


def pixel_shuffle(x: jnp.ndarray, r: int) -> jnp.ndarray:
    n, h, w, crr = x.shape
    if crr % (r * r) != 0:
        raise ValueError(f"channels {crr} not divisible by r^2={r * r}")
    c = crr // (r * r)
    x = x.reshape(n, h, w, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # N, H, i, W, j, C
    return x.reshape(n, h * r, w * r, c)
