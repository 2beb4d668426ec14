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

    def __init__(self, weights_dir: str | None = None, dtype: Any = None):
        self.module = VGG19Features(dtype=dtype)
        self.variables, self.pretrained = load_feature_params(
            self.module, "vgg19_features.npz", (1, 32, 32, 3), weights_dir
        )

    def __call__(self, pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        fp = self.module.apply(self.variables, pred)
        ft = self.module.apply(self.variables, target)
        return jnp.mean((fp - ft) ** 2)
