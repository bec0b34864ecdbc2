"""SO(3)/SE(3) exponential and logarithm maps in jnp.

Equivalent of the reference's `lieutils.py:41-737` (SURVEY.md §2
component 16 — pose-refinement scaffolding, unused by the main train/eval
path but part of the public surface). The reference needs ~800 lines of
custom torch autograd Functions with hand-derived gradients; under JAX the
maps are plain differentiable functions — the only care needed is
Taylor-stabilizing the sinc-like coefficients near θ=0 AND keeping their
*gradients* finite there, which the double-`where` idiom below handles.

Also provides `so3_exponential_map`, the pytorch3d function the reference
imports for axis-angle ray bundles (`nerf_helpers.py:4,177`).
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8


def hat(w: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) -> (..., 3, 3) skew-symmetric matrix."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    zeros = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([zeros, -wz, wy], -1),
            jnp.stack([wz, zeros, -wx], -1),
            jnp.stack([-wy, wx, zeros], -1),
        ],
        -2,
    )


def vee(W: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) skew -> (..., 3)."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], -1)


def _taylor_safe(theta_sq, exact_fn, taylor_val):
    """Evaluate `exact_fn(theta)` where theta is large enough, a Taylor
    value otherwise — with the argument masked BEFORE the unstable op so
    gradients stay finite (double-where)."""
    small = theta_sq < _EPS
    safe_sq = jnp.where(small, jnp.ones_like(theta_sq), theta_sq)
    return jnp.where(small, taylor_val, exact_fn(jnp.sqrt(safe_sq)))


def so3_exp(w: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle (..., 3) -> rotation matrix (..., 3, 3) via Rodrigues.

    R = I + sinc(θ)·ŵ + ((1-cosθ)/θ²)·ŵ² with Taylor fallbacks at θ→0
    (`lieutils.py` SO3.Exp :499; pytorch3d `so3_exponential_map`)."""
    theta_sq = jnp.sum(w * w, axis=-1)
    A = _taylor_safe(
        theta_sq, lambda t: jnp.sin(t) / t, 1.0 - theta_sq / 6.0
    )[..., None, None]
    B = _taylor_safe(
        theta_sq, lambda t: (1.0 - jnp.cos(t)) / (t * t), 0.5 - theta_sq / 24.0
    )[..., None, None]
    W = hat(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + A * W + B * (W @ W)


# pytorch3d-compatible alias (`nerf_helpers.py:4`)
so3_exponential_map = so3_exp


def so3_log(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix (..., 3, 3) -> axis-angle (..., 3) (SO3.Log)."""
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_theta = jnp.clip((trace - 1.0) / 2.0, -1.0 + 1e-7, 1.0 - 1e-7)
    theta = jnp.arccos(cos_theta)
    theta_sq = theta * theta
    # w = θ/(2 sinθ) · vee(R - Rᵀ); Taylor: 1/2 + θ²/12
    coef = _taylor_safe(
        theta_sq,
        lambda t: t / (2.0 * jnp.sin(t)),
        0.5 + theta_sq / 12.0,
    )
    return coef[..., None] * vee(R - jnp.swapaxes(R, -1, -2))


def se3_exp(xi: jnp.ndarray) -> jnp.ndarray:
    """Twist (..., 6) = [v, w] -> homogeneous transform (..., 4, 4)
    (SE3.Exp `lieutils.py:670`)."""
    v, w = xi[..., :3], xi[..., 3:]
    theta_sq = jnp.sum(w * w, axis=-1)
    R = so3_exp(w)
    B = _taylor_safe(
        theta_sq, lambda t: (1.0 - jnp.cos(t)) / (t * t), 0.5 - theta_sq / 24.0
    )[..., None, None]
    C = _taylor_safe(
        theta_sq,
        lambda t: (t - jnp.sin(t)) / (t * t * t),
        1.0 / 6.0 - theta_sq / 120.0,
    )[..., None, None]
    W = hat(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), W.shape)
    V = eye + B * W + C * (W @ W)
    t = (V @ v[..., None])[..., 0]
    top = jnp.concatenate([R, t[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], xi.dtype), top.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def se3_log(T: jnp.ndarray) -> jnp.ndarray:
    """Homogeneous transform (..., 4, 4) -> twist (..., 6) = [v, w]."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    w = so3_log(R)
    theta_sq = jnp.sum(w * w, axis=-1)
    # V⁻¹ = I - ŵ/2 + (1/θ² - (1+cosθ)/(2θ sinθ))·ŵ²
    coef = _taylor_safe(
        theta_sq,
        lambda th: 1.0 / (th * th)
        - (1.0 + jnp.cos(th)) / (2.0 * th * jnp.sin(th)),
        1.0 / 12.0 + theta_sq / 720.0,
    )[..., None, None]
    W = hat(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=T.dtype), W.shape)
    V_inv = eye - 0.5 * W + coef * (W @ W)
    v = (V_inv @ t[..., None])[..., 0]
    return jnp.concatenate([v, w], axis=-1)
