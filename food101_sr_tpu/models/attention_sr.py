"""AttentionSR — channel-attention SR net (reference src/models.py:146-189).

Same skeleton as ResNetSR but N attention residual blocks (SE, res_scale
0.1, no BN anywhere) and a BN-free mid conv; trained at 96 channels via the
registry (reference src/models.py:225).
"""
from __future__ import annotations

from typing import Any

from flax import linen as nn

from .layers import (AttentionResidualBlock, Conv, PReLU, UpsampleBlock,
                     scale_stages)


class AttentionSR(nn.Module):
    scale_factor: int = 4
    num_channels: int = 64
    num_residuals: int = 32
    dtype: Any = None
    remat: bool = False  # rematerialize blocks in backward (trade FLOPs for HBM)
    quantize: str = ""   # "int8"/"int8_dot": dynamic-int8 BODY convs for
                         # inference (head/tail convs stay full precision;
                         # ops/quantize.py — inference-only, params unchanged)
    phase_tail: bool = False  # fused phase-space upsample tail: every tail
                              # conv runs at LR resolution in pixel-shuffle
                              # phase space (ops/subpixel_conv.phase_conv2d),
                              # one shuffle at the very end — exact math,
                              # same params, no intermediate HR copies

    @nn.compact
    def __call__(self, x, train: bool = False):
        initial = PReLU(name="prelu")(
            Conv(self.num_channels, 9, dtype=self.dtype, name="input_conv")(x)
        )
        block_cls = (nn.remat(AttentionResidualBlock) if self.remat
                     else AttentionResidualBlock)
        r = initial
        for i in range(self.num_residuals):
            r = block_cls(self.num_channels, dtype=self.dtype,
                          quantize=self.quantize, name=f"res_{i}")(r)
        r = Conv(self.num_channels, 3, dtype=self.dtype,
                 quantize=self.quantize, name="mid_conv")(r)
        x = initial + r
        # Upsample tail from prime-factor stages (x4 -> two x2 stages, the
        # reference's layout; x3/x6/... beyond-parity — the reference is
        # powers-of-two only, src/models.py:160-167)
        stages = scale_stages(self.scale_factor)
        if self.phase_tail:
            from ..ops.subpixel_conv import grouped_out_map

            r_acc, in_map = 1, None
            for i, s in enumerate(stages):
                x = UpsampleBlock(out_channels=64, scale=s, dtype=self.dtype,
                                  phase_in=r_acc, phase_in_map=in_map,
                                  name=f"up_{i}")(x)
                # a grouped stage emits (py, px, c, by, bx) channel order;
                # the next kernel's gather absorbs it (zero runtime cost)
                in_map = (grouped_out_map(64 * s * s, r_acc, s=s)
                          if r_acc > 1 else None)
                r_acc *= s
            return Conv(3, 9, dtype=self.dtype,
                        subpixel_r=self.scale_factor, phase_in=r_acc,
                        phase_in_map=in_map, name="output_conv")(x)
        for i, s in enumerate(stages):
            x = UpsampleBlock(out_channels=64, scale=s, dtype=self.dtype,
                              name=f"up_{i}")(x)
        return Conv(3, 9, dtype=self.dtype, subpixel_r=self.scale_factor,
                    name="output_conv")(x)
