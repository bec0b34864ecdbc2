"""Alpha compositing of a sampled radiance field along rays.

Behavioral equivalent of `volume_rendering_utils.py:7-75`, including the
load-bearing background-prior semantics (SURVEY.md §2.4):

* when a `background_prior` is given, the *last* sample's RGB is the raw
  (pre-sigmoid) background pixel value — every other sample's RGB goes
  through a sigmoid (`volume_rendering_utils.py:29-31`);
* the last sample's sigma gets +1e-6 *unconditionally*
  (`volume_rendering_utils.py:53`) so leftover transmittance lands on it;
* the returned tuple is (rgb, disp, acc, weights, None) — the reference
  computes a depth map but returns `surface_depth = None`
  (`volume_rendering_utils.py:62,75`); `depth_map` is available via
  `return_depth=True` for the eval/normals path.

TPU notes: everything here is elementwise + a cumprod + reductions over the
static samples axis — pure VPU work that XLA fuses into one kernel; the
sigma-noise draw uses an explicit PRNG key.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from nerface_tpu.ops.math import cumprod_exclusive


def volume_render_radiance_field(
    radiance_field: jnp.ndarray,
    depth_values: jnp.ndarray,
    ray_directions: jnp.ndarray,
    radiance_field_noise_std: float = 0.0,
    white_background: bool = False,
    background_prior: Optional[jnp.ndarray] = None,
    noise_key: Optional[jax.Array] = None,
    return_depth: bool = False,
    ray_index: Optional[jnp.ndarray] = None,
):
    """Composite (num_rays, num_samples, 4) radiance into per-ray maps.

    Returns (rgb_map, disp_map, acc_map, weights, surface_depth) where
    surface_depth is None unless `return_depth`.
    """
    one_e_10 = jnp.asarray(1e10, radiance_field.dtype)
    dists = jnp.concatenate(
        [
            depth_values[..., 1:] - depth_values[..., :-1],
            jnp.broadcast_to(one_e_10, depth_values[..., :1].shape),
        ],
        axis=-1,
    )
    dists = dists * jnp.linalg.norm(ray_directions, axis=-1)[..., None]

    if background_prior is not None:
        rgb = jax.nn.sigmoid(radiance_field[:, :-1, :3])
        rgb = jnp.concatenate([rgb, radiance_field[:, -1:, :3]], axis=1)
    else:
        rgb = jax.nn.sigmoid(radiance_field[..., :3])

    sigma = radiance_field[..., 3]
    if radiance_field_noise_std > 0.0:
        if noise_key is None:
            raise ValueError("radiance_field_noise_std > 0 requires noise_key")
        if ray_index is not None:
            from nerface_tpu.ops.sampling import per_ray_normal

            noise = per_ray_normal(
                noise_key, ray_index, sigma.shape[-1], sigma.dtype
            )
        else:
            noise = jax.random.normal(noise_key, sigma.shape, dtype=sigma.dtype)
        sigma = sigma + noise * radiance_field_noise_std
    sigma_a = jax.nn.relu(sigma)
    # Unconditional epsilon on the last sample (`volume_rendering_utils.py:53`).
    sigma_a = sigma_a.at[..., -1].add(1e-6)

    alpha = 1.0 - jnp.exp(-sigma_a * dists)
    weights = alpha * cumprod_exclusive(1.0 - alpha + 1e-10)

    rgb_map = jnp.sum(weights[..., None] * rgb, axis=-2)
    depth_map = jnp.sum(weights * depth_values, axis=-1)
    acc_map = jnp.sum(weights, axis=-1)
    disp_map = 1.0 / jnp.maximum(1e-10, depth_map / acc_map)

    if white_background:
        rgb_map = rgb_map + (1.0 - acc_map[..., None])

    surface_depth = depth_map if return_depth else None
    return rgb_map, disp_map, acc_map, weights, surface_depth


def inject_background(
    radiance_field: jnp.ndarray, background_prior: Optional[jnp.ndarray]
) -> jnp.ndarray:
    """Overwrite the last sample's RGB with the background pixel
    (`train_utils.py:95-96,141-142`)."""
    if background_prior is None:
        return radiance_field
    return radiance_field.at[:, -1, :3].set(background_prior)
