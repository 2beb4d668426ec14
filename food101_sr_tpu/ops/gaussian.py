"""Gaussian blur primitives for the NLPD Laplacian pyramid.

The reference builds a 5x5 sigma=1 Gaussian (normalized, so its approximate
pi constant cancels; reference src/loss.py:42-55) and applies it as a
depthwise zero-padded conv (reference src/loss.py:61). We express the
depthwise conv with ``lax.conv_general_dilated`` using feature_group_count,
NHWC/HWIO layouts that XLA tiles well on TPU.
"""
from __future__ import annotations

import functools

import jax.lax as lax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=8)
def gaussian_kernel_2d(size: int = 5, sigma: float = 1.0) -> np.ndarray:
    """Normalized 2-D Gaussian, float32 ``[size, size]``."""
    coords = np.arange(size, dtype=np.float64)
    mean = (size - 1) / 2.0
    g = np.exp(-((coords - mean) ** 2) / (2.0 * sigma**2))
    k2d = np.outer(g, g)
    k2d /= k2d.sum()
    return k2d.astype(np.float32)


def depthwise_blur(x: jnp.ndarray, size: int = 5, sigma: float = 1.0) -> jnp.ndarray:
    """Depthwise Gaussian blur with zero 'SAME'-style padding of (size-1)//2,
    matching torch ``F.conv2d(..., padding=2, groups=C)`` semantics."""
    n, h, w, c = x.shape
    k = jnp.asarray(gaussian_kernel_2d(size, sigma))
    # HWIO with feature_group_count=c: [size, size, 1, c]
    kernel = jnp.tile(k[:, :, None, None], (1, 1, 1, c))
    pad = (size - 1) // 2
    return lax.conv_general_dilated(
        x.astype(jnp.float32),
        kernel,
        window_strides=(1, 1),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
        # fp32 conv precision on TPU (default would downcast to bf16 and
        # break torch-parity of NLPD pyramid levels)
        precision=lax.Precision.HIGHEST,
    ).astype(x.dtype)
