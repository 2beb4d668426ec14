"""Anisotropic total-variation loss (reference src/loss.py:6-17).

Faithfully reproduces the reference formula, including its quirk of applying
``tv_loss_weight`` both per-term and globally (effectively weight^2); with the
training-time weight of 1 (reference train.py:65) the quirk is inert, but we
keep the formula so custom weights behave identically.
"""
from __future__ import annotations

import jax.numpy as jnp


def tv_loss(x: jnp.ndarray, tv_loss_weight: float = 1.0) -> jnp.ndarray:
    """``x``: NHWC in [0,1]. Returns a scalar."""
    batch = x.shape[0]
    w = tv_loss_weight
    count_h = w * jnp.sum((x[:, 1:, :, :] - x[:, :-1, :, :]) ** 2)
    count_w = w * jnp.sum((x[:, :, 1:, :] - x[:, :, :-1, :]) ** 2)
    return w * 2.0 * (count_h + count_w) / batch
