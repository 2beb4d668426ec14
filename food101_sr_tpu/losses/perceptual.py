"""VGG19 perceptual loss (reference src/loss.py:19-29): MSE between frozen
VGG19 conv5_4 feature maps of prediction and target. The VGG parameters live
outside the optimizer (closure constants under jit => XLA treats them as
frozen weights; no stop_gradient needed since they are not differentiated)."""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp

from ..models.feature_nets import VGG19Features, load_feature_params


class PerceptualLoss:
    """Callable ``loss(pred, target) -> scalar`` on NHWC [0,1] images."""

    def __init__(self, weights_dir: str | None = None, dtype: Any = None,
                 precision: Any = None):
        # training-loss embedding: default (fast bf16-pass) conv precision —
        # the HIGHEST-precision path is for the LPIPS *metric* (torch
        # parity); here it would triple the GAN G-step cost (measured
        # 201 -> ~100 ms at batch 32, crop 192).
        self.module = VGG19Features(dtype=dtype, precision=precision)
        self.variables, self.pretrained = load_feature_params(
            self.module, "vgg19_features.npz", (1, 32, 32, 3), weights_dir
        )

    def __call__(self, pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        fp = self.module.apply(self.variables, pred)
        ft = self.module.apply(self.variables, target)
        return jnp.mean((fp - ft) ** 2)
