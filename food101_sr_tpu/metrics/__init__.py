from .metrics import LPIPSAlex, MetricsCalculator, lpips_alex, psnr, ssim

__all__ = ["LPIPSAlex", "MetricsCalculator", "lpips_alex", "psnr", "ssim"]
