from .metrics import MetricsCalculator, lpips_alex, psnr, ssim

__all__ = ["MetricsCalculator", "lpips_alex", "psnr", "ssim"]
