"""Gaussian smoothing (depthwise conv).

Equivalent of `train_utils.py:379-443` (`GaussianSmoothing`), used to
optionally blur the trainable-background initialization
(`train_transformed_rays.py:147-152`).  The reference builds the kernel as
a product of per-axis 1-D Gaussians with std applied as
exp(-((x-mean)/(2*std))^2) — note the std factor is *inside* the square,
a quirk kept for behavioral parity — and convolves with padding=5.
"""

from __future__ import annotations

import math
import jax
import jax.numpy as jnp
import numpy as np


def gaussian_kernel(kernel_size, sigma, dim: int = 2) -> np.ndarray:
    if isinstance(kernel_size, (int, float)):
        kernel_size = [int(kernel_size)] * dim
    if isinstance(sigma, (int, float)):
        sigma = [float(sigma)] * dim
    kernel = np.array(1.0, np.float32)
    grids = np.meshgrid(*[np.arange(s, dtype=np.float32) for s in kernel_size], indexing="ij")
    for size, std, mgrid in zip(kernel_size, sigma, grids):
        mean = (size - 1) / 2.0
        kernel = kernel * (
            1.0 / (std * math.sqrt(2 * math.pi))
            * np.exp(-(((mgrid - mean) / (2 * std)) ** 2))
        )
    return kernel / kernel.sum()


def gaussian_smooth(
    image: jnp.ndarray, kernel_size: int = 11, sigma: float = 11.0, padding: int = 5
) -> jnp.ndarray:
    """Blur an (H, W, C) image with a depthwise Gaussian (padding=5 like the
    reference's conv call, `train_utils.py:442`)."""
    k = jnp.asarray(gaussian_kernel(kernel_size, sigma, dim=2))
    C = image.shape[-1]
    x = image.transpose(2, 0, 1)[None]  # (1, C, H, W)
    w = jnp.tile(k[None, None], (C, 1, 1, 1))  # (C, 1, kh, kw) depthwise
    y = jax.lax.conv_general_dilated(
        x, w,
        window_strides=(1, 1),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=C,
    )
    return y[0].transpose(1, 2, 0)
