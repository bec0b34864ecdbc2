from nerface_tpu.metrics.image import (
    l1,
    psnr,
    ssim,
)
from nerface_tpu.metrics.harness import ScalarMetric, two_folders
from nerface_tpu.metrics.lpips import LPIPSAlex, lpips_available

__all__ = [
    "l1",
    "psnr",
    "ssim",
    "ScalarMetric",
    "two_folders",
    "LPIPSAlex",
    "lpips_available",
]
