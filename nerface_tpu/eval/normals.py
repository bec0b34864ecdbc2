"""Normal maps from rendered depth/disparity.

Equivalent of `eval_transformed_rays.py:84-119` (`torch_normal_map`):
backproject each pixel with the intrinsics, take forward differences,
cross-product for the surface normal, then optionally "clean" using the
volume-rendering background weights (mask > 0.22 -> white, then
alpha-blend toward white by the mask).

Note the reference feeds the *disparity* map as `depthmap` (:469) — the
same behavior is kept; pass whichever map you want backprojected.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from nerface_tpu.ops.math import meshgrid_xy


@partial(jax.jit, static_argnames=("clean", "central_difference"))
def normal_map_from_depth(
    depthmap: jnp.ndarray,
    intrinsics,
    weights: Optional[jnp.ndarray] = None,
    clean: bool = True,
    central_difference: bool = False,
) -> jnp.ndarray:
    """depthmap: (H, W); intrinsics: [fx, fy, cx, cy] (cx, cy relative).
    Returns (H-d, W-d, 3) uint8-scale float normals (0..255)."""
    H, W = depthmap.shape
    fx, fy, cx, cy = (
        intrinsics[0], intrinsics[1], intrinsics[2] * W, intrinsics[3] * H
    )
    ii, jj = meshgrid_xy(jnp.arange(W, dtype=depthmap.dtype), jnp.arange(H, dtype=depthmap.dtype))
    points = jnp.stack(
        [
            ((ii - cx) * depthmap) / fx,
            -((jj - cy) * depthmap) / fy,
            depthmap,
        ],
        axis=-1,
    )
    d = 2 if central_difference else 1
    dx = points[d:, :, :] - points[:-d, :, :]
    dy = points[:, d:, :] - points[:, :-d, :]
    normals = jnp.cross(dy[:-d, :, :], dx[:, :-d, :])
    norm = jnp.sqrt(jnp.sum(normals * normals, axis=2, keepdims=True))
    normals = normals / jnp.maximum(norm, 1e-12)
    normals = normals * 0.5 + 0.5

    if clean and weights is not None:
        mask = jnp.repeat(weights[..., None], 3, axis=-1)[:-d, :-d]
        normals = jnp.where(mask > 0.22, 1.0, normals)
        normals = (1.0 - mask) * normals + mask * jnp.ones_like(normals)
    return normals * 255.0
