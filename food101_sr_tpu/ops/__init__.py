from .resize import (
    degrade_bicubic,
    resize2d,
    resize_bicubic_pil,
    resize_bicubic_torch,
    resize_bilinear_torch,
    upsample_bicubic,
)
from .pixel_shuffle import pixel_shuffle
from .quantize import (
    fake_quant_act,
    fake_quant_conv2d,
    fake_quant_kernel,
    int8_conv2d,
    quantize_kernel_per_cout,
    quantize_per_sample,
    quantize_per_tensor,
)
from .gaussian import gaussian_kernel_2d, depthwise_blur
from .spatial_mean import spatial_mean
from .tta import self_ensemble

__all__ = [
    "self_ensemble",
    "degrade_bicubic",
    "resize2d",
    "resize_bicubic_pil",
    "resize_bicubic_torch",
    "resize_bilinear_torch",
    "upsample_bicubic",
    "pixel_shuffle",
    "int8_conv2d",
    "fake_quant_act",
    "fake_quant_conv2d",
    "fake_quant_kernel",
    "quantize_kernel_per_cout",
    "quantize_per_sample",
    "quantize_per_tensor",
    "gaussian_kernel_2d",
    "depthwise_blur",
    "spatial_mean",
]
