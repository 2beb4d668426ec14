"""Jitted image-quality metrics: PSNR, SSIM, LPIPS(AlexNet), NLPD.

TPU-native replacement of the reference's MetricsCalculator
(reference src/metrics.py:6-31), which wraps torchmetrics PSNR/SSIM, the
``lpips`` package, and reuses NLPDLoss. Semantics preserved:

* inputs are clamped to [0,1] first (reference src/metrics.py:16-17)
* PSNR: data_range 1.0, single global MSE over the whole batch
  (torchmetrics ``dim=None`` reduction)
* SSIM: gaussian kernel 11x11 sigma 1.5, k1=0.01 k2=0.03, *valid* windows
  (no padding), mean over map/channels/batch (torchmetrics defaults)
* LPIPS: AlexNet taps, unit-normalized channels, 1x1 non-negative heads,
  spatial mean, sum over taps; inputs rescaled to [-1,1]
  (reference src/metrics.py:22)
* NLPD: the loss reused as a metric (reference src/metrics.py:12,24)
"""
from __future__ import annotations

import functools
from typing import Any

import jax
import jax.lax as lax
import jax.numpy as jnp
import numpy as np

from ..losses.nlpd import nlpd_loss
from ..models.feature_nets import (
    LPIPS_SCALE,
    LPIPS_SHIFT,
    AlexNetFeatures,
    load_feature_params,
    load_lpips_heads,
)


def psnr(pred: jnp.ndarray, target: jnp.ndarray, data_range: float = 1.0) -> jnp.ndarray:
    mse = jnp.mean((pred - target) ** 2)
    return 10.0 * jnp.log10(data_range**2 / mse)


@functools.lru_cache(maxsize=4)
def _gaussian_window(kernel_size: int, sigma: float) -> np.ndarray:
    coords = np.arange(kernel_size, dtype=np.float64) - (kernel_size - 1) / 2.0
    g = np.exp(-(coords**2) / (2.0 * sigma**2))
    g /= g.sum()
    return np.outer(g, g).astype(np.float32)


def _depthwise_valid(x: jnp.ndarray, k2d: jnp.ndarray) -> jnp.ndarray:
    c = x.shape[-1]
    kernel = jnp.tile(k2d[:, :, None, None], (1, 1, 1, c))
    # HIGHEST precision is required: TPU convs default to bf16 inputs, and
    # sigma = E[x^2] - E[x]^2 below cancels catastrophically at bf16,
    # producing SSIM > 1.
    return lax.conv_general_dilated(
        x, kernel, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
        precision=lax.Precision.HIGHEST,
    )


def ssim(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    data_range: float = 1.0,
    kernel_size: int = 11,
    sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
) -> jnp.ndarray:
    """Wang et al. SSIM with gaussian windows on valid positions, global mean."""
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    w = jnp.asarray(_gaussian_window(kernel_size, sigma))

    x = pred.astype(jnp.float32)
    y = target.astype(jnp.float32)
    mu_x = _depthwise_valid(x, w)
    mu_y = _depthwise_valid(y, w)
    mu_xx = _depthwise_valid(x * x, w)
    mu_yy = _depthwise_valid(y * y, w)
    mu_xy = _depthwise_valid(x * y, w)

    sigma_x = mu_xx - mu_x**2
    sigma_y = mu_yy - mu_y**2
    sigma_xy = mu_xy - mu_x * mu_y

    num = (2 * mu_x * mu_y + c1) * (2 * sigma_xy + c2)
    den = (mu_x**2 + mu_y**2 + c1) * (sigma_x + sigma_y + c2)
    return jnp.mean(num / den)


class LPIPSAlex:
    """LPIPS with an AlexNet backbone (the reference's ``lpips.LPIPS(net='alex')``).

    ``__call__`` expects NHWC images in [-1, 1] (callers rescale, as the
    reference does at src/metrics.py:22). Returns the batch-mean distance.
    """

    def __init__(self, weights_dir: str | None = None, dtype: Any = None):
        self.module = AlexNetFeatures(dtype=dtype)
        self.variables, self.pretrained = load_feature_params(
            self.module, "alexnet_features.npz", (1, 64, 64, 3), weights_dir
        )
        self.heads, self.heads_pretrained = load_lpips_heads(weights_dir)
        self.shift = jnp.asarray(LPIPS_SHIFT)
        self.scale = jnp.asarray(LPIPS_SCALE)

    def __call__(self, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        xs = (x - self.shift) / self.scale
        ys = (y - self.shift) / self.scale
        fx = self.module.apply(self.variables, xs)
        fy = self.module.apply(self.variables, ys)
        total = 0.0
        for tx, ty, head in zip(fx, fy, self.heads):
            nx = tx / (jnp.linalg.norm(tx, axis=-1, keepdims=True) + 1e-10)
            ny = ty / (jnp.linalg.norm(ty, axis=-1, keepdims=True) + 1e-10)
            d2 = (nx - ny) ** 2  # [N,H,W,C]
            # 1x1 conv head == channel-weighted sum; then spatial mean.
            total = total + jnp.mean(jnp.sum(d2 * head, axis=-1), axis=(1, 2))
        return jnp.mean(total)


def lpips_alex(weights_dir: str | None = None) -> LPIPSAlex:
    return LPIPSAlex(weights_dir=weights_dir)


class MetricsCalculator:
    """Drop-in equivalent of the reference MetricsCalculator: jitted
    ``compute(sr, hr) -> {psnr, ssim, lpips, nlpd}`` of Python floats."""

    def __init__(self, weights_dir: str | None = None):
        self._lpips = LPIPSAlex(weights_dir=weights_dir)
        # Surfaced so callers (and tests) can tell whether logged lpips
        # values are reference-comparable or the seeded/uniform fallback.
        self.pretrained = self._lpips.pretrained
        self.heads_pretrained = self._lpips.heads_pretrained

        @jax.jit
        def _compute(sr, hr):
            sr = jnp.clip(sr, 0.0, 1.0)
            hr = jnp.clip(hr, 0.0, 1.0)
            return {
                "psnr": psnr(sr, hr),
                "ssim": ssim(sr, hr),
                "lpips": self._lpips(sr * 2 - 1, hr * 2 - 1),
                "nlpd": nlpd_loss(sr, hr),
            }

        self._compute = _compute

    def compute(self, sr, hr):
        out = self._compute(sr, hr)
        return {k: float(v) for k, v in out.items()}

    def compute_device(self, sr, hr):
        """Same, but stays on device (no host sync) — for use inside jitted
        eval steps; the reference's per-batch ``.item()`` syncs are one of its
        documented bottlenecks (SURVEY §3.1)."""
        sr = jnp.clip(sr, 0.0, 1.0)
        hr = jnp.clip(hr, 0.0, 1.0)
        return {
            "psnr": psnr(sr, hr),
            "ssim": ssim(sr, hr),
            "lpips": self._lpips(sr * 2 - 1, hr * 2 - 1),
            "nlpd": nlpd_loss(sr, hr),
        }
