"""Ray generation from camera intrinsics and head-pose c2w transforms.

Behavioral equivalents of `nerf_helpers.py`: `get_ray_bundle` (:68-123),
`get_ray_bundle_axis_angles` (:126-185, pytorch3d `so3_exponential_map`
replaced with a jnp Rodrigues formula), `ndc_rays` (:252-281).

Convention (reference `nerf_helpers.py:109-123`): intrinsics is
[fx, fy, cx, cy] with cx, cy *relative* in [0, 1]; pixel (i=x/col, j=y/row)
maps to camera-frame direction ((i - W·cx)/fx, -(j - H·cy)/fy, -1), rotated
by the camera-to-world rotation. Scalar focal f falls back to
[f, f, 0.5, 0.5].
"""

from __future__ import annotations

from typing import Tuple, Union

import jax.numpy as jnp
import numpy as np

from nerface_tpu.ops.math import meshgrid_xy


def _normalize_intrinsics(intrinsics, dtype) -> jnp.ndarray:
    intrinsics = jnp.asarray(intrinsics, dtype)
    if intrinsics.ndim == 0:
        f = intrinsics
        intrinsics = jnp.stack([f, f, jnp.asarray(0.5, dtype), jnp.asarray(0.5, dtype)])
    return intrinsics


def pixel_directions(height: int, width: int, intrinsics, dtype=jnp.float32) -> jnp.ndarray:
    """Camera-frame direction for every pixel: (H, W, 3)."""
    intr = _normalize_intrinsics(intrinsics, dtype)
    ii, jj = meshgrid_xy(
        jnp.arange(width, dtype=dtype), jnp.arange(height, dtype=dtype)
    )
    return jnp.stack(
        [
            (ii - width * intr[2]) / intr[0],
            -(jj - height * intr[3]) / intr[1],
            -jnp.ones_like(ii),
        ],
        axis=-1,
    )


def get_ray_bundle(
    height: int,
    width: int,
    intrinsics,
    tform_cam2world: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One ray per pixel: origins (H, W, 3), directions (H, W, 3).

    tform_cam2world: (3, 4) or (4, 4) camera-to-world (head pose) transform.
    Directions are *not* normalized (reference behavior; the renderer scales
    dists by ||rd|| instead).
    """
    tform_cam2world = jnp.asarray(tform_cam2world)
    directions = pixel_directions(height, width, intrinsics, tform_cam2world.dtype)
    ray_directions = jnp.sum(
        directions[..., None, :] * tform_cam2world[:3, :3], axis=-1
    )
    ray_origins = jnp.broadcast_to(tform_cam2world[:3, -1], ray_directions.shape)
    return ray_origins, ray_directions


def rodrigues(axis_angle: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Axis-angle (3,) -> rotation matrix (3, 3) via the Rodrigues formula.

    Replaces pytorch3d's `so3_exponential_map` (used at
    `nerf_helpers.py:177`) with a 10-line jnp closed form, Taylor-safe at
    theta -> 0.
    """
    theta2 = jnp.sum(axis_angle * axis_angle)
    theta = jnp.sqrt(theta2 + eps)
    k = axis_angle / theta
    K = jnp.array(
        [
            [0.0, -k[2], k[1]],
            [k[2], 0.0, -k[0]],
            [-k[1], k[0], 0.0],
        ],
        dtype=axis_angle.dtype,
    )
    eye = jnp.eye(3, dtype=axis_angle.dtype)
    R = eye + jnp.sin(theta) * K + (1.0 - jnp.cos(theta)) * (K @ K)
    # Near-zero rotation: fall back to first-order expansion (numerically the
    # same as the formula above given the eps-regularized theta, but explicit).
    return jnp.where(theta2 < eps, eye + K * theta, R)


def get_ray_bundle_axis_angles(
    height: int,
    width: int,
    intrinsics,
    tform_cam2world: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Ray bundle from a (2, 3) [axis-angle; translation] pose.

    Equivalent of `nerf_helpers.py:126-185` (pose-refinement scaffolding).
    """
    tform_cam2world = jnp.asarray(tform_cam2world)
    directions = pixel_directions(height, width, intrinsics, tform_cam2world.dtype)
    rot = rodrigues(tform_cam2world[0])
    ray_directions = jnp.sum(directions[..., None, :] * rot, axis=-1)
    ray_origins = jnp.broadcast_to(tform_cam2world[1], ray_directions.shape)
    return ray_origins, ray_directions


def ndc_rays(
    H: int,
    W: int,
    focal: Union[float, jnp.ndarray],
    near: float,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Shift rays to the near plane and project to NDC (`nerf_helpers.py:252-281`)."""
    focal = jnp.asarray(focal)
    if focal.ndim == 0:
        fx = fy = focal
    else:
        fx, fy = focal[0], focal[1]
    t = -(near + rays_o[..., 2]) / rays_d[..., 2]
    rays_o = rays_o + t[..., None] * rays_d

    o0 = -1.0 / (W / (2.0 * fx)) * rays_o[..., 0] / rays_o[..., 2]
    o1 = -1.0 / (H / (2.0 * fy)) * rays_o[..., 1] / rays_o[..., 2]
    o2 = 1.0 + 2.0 * near / rays_o[..., 2]

    d0 = (
        -1.0
        / (W / (2.0 * fx))
        * (rays_d[..., 0] / rays_d[..., 2] - rays_o[..., 0] / rays_o[..., 2])
    )
    d1 = (
        -1.0
        / (H / (2.0 * fy))
        * (rays_d[..., 1] / rays_d[..., 2] - rays_o[..., 1] / rays_o[..., 2])
    )
    d2 = -2.0 * near / rays_o[..., 2]

    return jnp.stack([o0, o1, o2], -1), jnp.stack([d0, d1, d2], -1)


def ray_bundle_numpy(height: int, width: int, intrinsics, tform_cam2world: np.ndarray):
    """Host-side (numpy) twin of `get_ray_bundle` for the data pipeline.

    Used by the host feed so per-step ray selection never touches the device.
    """
    intr = np.asarray(intrinsics, np.float32)
    if intr.ndim == 0:
        intr = np.array([intr, intr, 0.5, 0.5], np.float32)
    ii, jj = np.meshgrid(
        np.arange(width, dtype=np.float32),
        np.arange(height, dtype=np.float32),
        indexing="xy",
    )
    directions = np.stack(
        [
            (ii - width * intr[2]) / intr[0],
            -(jj - height * intr[3]) / intr[1],
            -np.ones_like(ii),
        ],
        axis=-1,
    )
    tform = np.asarray(tform_cam2world, np.float32)
    ray_directions = directions @ tform[:3, :3].T
    ray_origins = np.broadcast_to(tform[:3, -1], ray_directions.shape)
    return ray_origins, ray_directions
