"""Relativistic-GAN patch critic with spectral norm
(reference src/models.py:191-217).

Four SN-conv blocks (3->64 s1 bias, ->128 s2, ->256 s2, ->512 s2; BN on all
but the first; LeakyReLU 0.2) -> global average pool -> SN-Dense(512->100)
-> LeakyReLU -> SN-Dense(100->1) logit.
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from .layers import SNConv, SNDense, TorchBatchNorm


class Discriminator(nn.Module):
    in_nc: int = 3
    nf: int = 64
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        specs = [
            # (features, stride, bias, bn)
            (self.nf, 1, True, False),
            (self.nf * 2, 2, False, True),
            (self.nf * 4, 2, False, True),
            (self.nf * 8, 2, False, True),
        ]
        for i, (f, s, bias, bn) in enumerate(specs):
            x = SNConv(f, 3, strides=s, use_bias=bias, dtype=self.dtype,
                       name=f"block_{i}")(x, update_stats=train)
            if bn:
                x = TorchBatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=1e-5, dtype=self.dtype,
                                 name=f"bn_{i}")(x)
            x = nn.leaky_relu(x, negative_slope=0.2)
        x = jnp.mean(x, axis=(1, 2))  # AdaptiveAvgPool2d(1) + flatten
        x = SNDense(100, dtype=self.dtype, name="fc1")(x, update_stats=train)
        x = nn.leaky_relu(x, negative_slope=0.2)
        return SNDense(1, dtype=self.dtype, name="fc2")(x, update_stats=train)
