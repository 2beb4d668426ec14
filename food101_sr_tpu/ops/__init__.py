from .resize import (
    degrade_bicubic,
    resize2d,
    resize_bicubic_pil,
    resize_bicubic_torch,
    resize_bilinear_torch,
    upsample_bicubic,
)
from .pixel_shuffle import pixel_shuffle
from .gaussian import gaussian_kernel_2d, depthwise_blur
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
    "gaussian_kernel_2d",
    "depthwise_blur",
]
