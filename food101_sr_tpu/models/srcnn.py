"""SRCNN — pre-upsampling 3-layer CNN (reference src/models.py:80-102).

Bicubic x`scale` upsample first (fully on-device; the reference round-trips
through the CPU as an MPS workaround, src/models.py:98), then
relu(conv9x9(3->64)) -> relu(conv1x1(64->hidden)) -> conv5x5(hidden->3).
Kaiming fan_out init.
"""
from __future__ import annotations

from typing import Any

from flax import linen as nn

from ..ops.resize import upsample_bicubic
from .layers import Conv, kaiming_normal


class SRCNN(nn.Module):
    num_channels: int = 3
    scale_factor: int = 4
    hidden_dim: int = 64
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = upsample_bicubic(x, self.scale_factor)
        x = nn.relu(Conv(64, 9, kernel_init=kaiming_normal("fan_out"),
                         dtype=self.dtype, name="conv1")(x))
        x = nn.relu(Conv(self.hidden_dim, 1, kernel_init=kaiming_normal("fan_out"),
                         dtype=self.dtype, name="conv2")(x))
        return Conv(self.num_channels, 5, kernel_init=kaiming_normal("fan_out"),
                    dtype=self.dtype, subpixel_r=self.scale_factor,
                    name="conv3")(x)
