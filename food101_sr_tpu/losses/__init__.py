"""Loss registry mirroring the reference's ``get_loss_function``
(reference src/loss.py:81-92): mae, mse, perceptual, nlpd. ``gan`` is not a
registry entry — it is a composite assembled by the training loop (reference
train.py:58-65), same as here (see training/steps.py make_gan_*_step)."""
from __future__ import annotations

import jax.numpy as jnp

from .nlpd import laplacian_pyramid, nlpd_loss, nlpd_loss_train
from .perceptual import PerceptualLoss
from .tv import tv_loss


def mae_loss(pred, target):
    return jnp.mean(jnp.abs(pred - target))


def mse_loss(pred, target):
    return jnp.mean((pred - target) ** 2)


def get_loss_function(name: str, weights_dir: str | None = None):
    """Return a jit-compatible callable ``loss(pred, target) -> scalar``."""
    name = name.lower()
    if name == "mae":
        return mae_loss
    if name == "mse":
        return mse_loss
    if name == "perceptual":
        return PerceptualLoss(weights_dir=weights_dir)
    if name == "nlpd":
        return nlpd_loss
    raise ValueError(f"Unknown loss function: {name}")


__all__ = [
    "get_loss_function",
    "laplacian_pyramid",
    "mae_loss",
    "mse_loss",
    "nlpd_loss",
    "nlpd_loss_train",
    "PerceptualLoss",
    "tv_loss",
]
