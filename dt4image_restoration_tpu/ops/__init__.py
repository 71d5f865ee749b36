from dt4image_restoration_tpu.ops.fourier import fft2c, ifft2c
from dt4image_restoration_tpu.ops.metrics import psnr, ssim
from dt4image_restoration_tpu.ops.csmri import kspace_consistency, spi_inverse
from dt4image_restoration_tpu.ops.image import (
    bilinear_upsample_2x,
    complex2channel,
    greyscale_to_rgb,
    resize_bilinear,
)

__all__ = [
    "fft2c", "ifft2c", "psnr", "ssim", "kspace_consistency", "spi_inverse",
    "bilinear_upsample_2x", "complex2channel", "greyscale_to_rgb",
    "resize_bilinear",
]
