"""ResNetSR — post-upsampling SRResNet/EDSR hybrid
(reference src/models.py:104-144).

conv9x9(3->C)+PReLU -> N residual blocks (BN) -> conv3x3+BN -> global skip
-> two x2 [conv3x3(->4*64) -> PixelShuffle -> PReLU] stages (ICNR init)
-> conv9x9(64->3). All compute at LR resolution until the tail.
"""
from __future__ import annotations

from typing import Any

from flax import linen as nn

from .layers import (Conv, PReLU, ResidualBlock, TorchBatchNorm,
                     UpsampleBlock, scale_stages)


class ResNetSR(nn.Module):
    scale_factor: int = 4
    num_channels: int = 64
    num_residuals: int = 16
    dtype: Any = None
    remat: bool = False  # rematerialize blocks in backward (trade FLOPs for HBM)
    quantize: str = ""   # "int8"/"int8_dot": dynamic-int8 BODY convs for
                         # inference (BN/head/tail stay full precision)
    phase_tail: bool = False  # fused phase-space upsample tail (see
                              # AttentionSR.phase_tail / ops/subpixel_conv)

    @nn.compact
    def __call__(self, x, train: bool = False):
        initial = PReLU(name="prelu")(
            Conv(self.num_channels, 9, dtype=self.dtype, name="input_conv")(x)
        )
        block_cls = (nn.remat(ResidualBlock, static_argnums=(2,))
                     if self.remat else ResidualBlock)
        r = initial
        for i in range(self.num_residuals):
            r = block_cls(self.num_channels, use_se=False, dtype=self.dtype,
                          quantize=self.quantize, name=f"res_{i}")(r, train)
        r = Conv(self.num_channels, 3, dtype=self.dtype,
                 quantize=self.quantize, name="mid_conv")(r)
        r = TorchBatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn_mid")(r)
        x = initial + r
        # Upsample tail from prime-factor stages (x4 -> two x2 stages, the
        # reference's layout; x3/x6/... beyond-parity — the reference is
        # powers-of-two only, src/models.py:116-123)
        stages = scale_stages(self.scale_factor)
        if self.phase_tail:
            from ..ops.subpixel_conv import grouped_out_map

            r_acc, in_map = 1, None
            for i, s in enumerate(stages):
                x = UpsampleBlock(out_channels=64, scale=s, dtype=self.dtype,
                                  phase_in=r_acc, phase_in_map=in_map,
                                  name=f"up_{i}")(x)
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
