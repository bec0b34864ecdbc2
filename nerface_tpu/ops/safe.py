"""Numerically-safe primitives whose gradients match torch's conventions."""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def safe_norm(x: jnp.ndarray) -> jnp.ndarray:
    """L2 norm with subgradient 0 at the origin (torch.norm convention).

    jnp.linalg.norm's gradient at 0 is NaN (0/0); torch defines it as 0,
    which matters because the reference's latent-code regularizer
    ‖code‖·0.0005 (`train_transformed_rays.py:372`) is applied to codes
    initialized at exactly zero.
    """
    return jnp.sqrt(jnp.sum(x * x))


def _safe_norm_fwd(x):
    n = jnp.sqrt(jnp.sum(x * x))
    return n, (x, n)


def _safe_norm_bwd(res, g):
    x, n = res
    grad = jnp.where(n > 0, x / jnp.where(n > 0, n, 1.0), jnp.zeros_like(x))
    return (g * grad,)


safe_norm.defvjp(_safe_norm_fwd, _safe_norm_bwd)
