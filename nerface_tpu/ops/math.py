"""Small numeric helpers shared across the pipeline.

Behavioral equivalents of `nerface_code/nerf-pytorch/nerf/nerf_helpers.py`:
`img2mse` (:10), `mse2psnr` (:14-18), `meshgrid_xy` (:29-41),
`cumprod_exclusive` (:44-65).  All pure jnp, shape-static, jit-safe.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def img2mse(img_src: jnp.ndarray, img_tgt: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((img_src - img_tgt) ** 2)


def mse2psnr(mse) -> float:
    """PSNR from an MSE *scalar* (host-side; mirrors reference's math.log10 use)."""
    mse = float(mse)
    if mse == 0:
        mse = 1e-5
    return -10.0 * math.log10(mse)


def mse2psnr_jnp(mse: jnp.ndarray) -> jnp.ndarray:
    """Device-side PSNR (jit-safe variant; clamps zero MSE like the reference)."""
    mse = jnp.maximum(mse, 1e-5)
    return -10.0 * jnp.log10(mse)


def meshgrid_xy(tensor1: jnp.ndarray, tensor2: jnp.ndarray):
    """np.meshgrid(..., indexing='xy') semantics.

    Returns (ii, jj) of shape (len(tensor2), len(tensor1)): ii varies along
    the last axis (x / column), jj along the first (y / row).
    """
    ii, jj = jnp.meshgrid(tensor1, tensor2, indexing="xy")
    return ii, jj


def cumprod_exclusive(tensor: jnp.ndarray) -> jnp.ndarray:
    """tf.math.cumprod(..., exclusive=True) along the last axis.

    cumprod_exclusive([a, b, c]) == [1, a, ab].
    """
    cumprod = jnp.cumprod(tensor, axis=-1)
    cumprod = jnp.roll(cumprod, 1, axis=-1)
    return cumprod.at[..., 0].set(1.0)
