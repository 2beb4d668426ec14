"""Geometric self-ensemble (x8 test-time augmentation).

The EDSR-style eval trick (Lim et al. 2017): run the model on all eight
dihedral transforms of the input (4 rotations x horizontal flip), undo each
transform on the output, and average — typically worth ~0.1-0.2 dB PSNR at
8x the inference FLOPs. The reference project has no TTA; this is a
beyond-parity eval tool.

TPU shape note: the eight transforms fall into two shape classes (HxW and
WxH), so the ensemble runs as TWO batched forwards of 4N images each — one
compiled program per class instead of eight separate dispatches (and only
one for square inputs' forward shape bucketing).
"""
from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

# the four axis-flip subsets of an NHWC batch; each is its own inverse
_FLIPS = ((), (2,), (1,), (1, 2))


def _flip(x, axes):
    return jnp.flip(x, axes) if axes else x


def self_ensemble(forward: Callable, x: jnp.ndarray) -> jnp.ndarray:
    """Average ``forward`` over the dihedral group D4.

    Args:
      forward: (N, h, w, C) -> (N, h*s, w*s, C) SR forward (jittable; this
        function is itself jittable and is typically wrapped in one jit
        with the forward).
      x: (N, H, W, C) LR batch.

    Returns:
      (N, H*s, W*s, C) ensemble mean.
    """
    n = x.shape[0]
    xt = jnp.swapaxes(x, 1, 2)
    even = jnp.concatenate([_flip(x, f) for f in _FLIPS])    # H x W
    odd = jnp.concatenate([_flip(xt, f) for f in _FLIPS])    # W x H
    ye, yo = forward(even), forward(odd)
    outs = []
    for i, f in enumerate(_FLIPS):
        outs.append(_flip(ye[i * n:(i + 1) * n], f))
    for i, f in enumerate(_FLIPS):
        outs.append(jnp.swapaxes(_flip(yo[i * n:(i + 1) * n], f), 1, 2))
    return jnp.mean(jnp.stack(outs), axis=0)
