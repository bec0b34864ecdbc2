"""Tiny NeRF — the minimal single-file bring-up target, in JAX.

Equivalent of the reference's `tiny_nerf.py:12-350` (SURVEY.md §2
component 15): ray generation → uniformly-stratified depth samples →
positional encoding → a 3-layer MLP → alpha compositing → MSE, overfit on
a small multi-view dataset with a jitted train step. No hierarchical
sampling, no conditioning — the canonical "first slice".

Data: the reference downloads `tiny_nerf_data.npz` (100 images + poses +
focal). Run with `--data path/to/tiny_nerf_data.npz`, or with no argument
a synthetic multi-view blob dataset is generated so the example runs
offline end-to-end.

Usage:
    python -m nerface_tpu.examples.tiny_nerf [--data FILE] [--iters N]
"""

from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from nerface_tpu.ops.encoding import positional_encoding
from nerface_tpu.ops.math import cumprod_exclusive
from nerface_tpu.ops.rays import get_ray_bundle


def compute_query_points_from_rays(
    ray_origins, ray_directions, near_thresh, far_thresh, num_samples,
    key=None,
):
    """Uniform depth values, optionally jittered by U(0, bin)/num_samples
    noise (`tiny_nerf.py:12-65` — note the noise is NOT per-stratum like
    the full model's; reproduced as-is)."""
    depth_values = jnp.linspace(near_thresh, far_thresh, num_samples)
    if key is not None:
        noise = jax.random.uniform(
            key, ray_origins.shape[:-1] + (num_samples,)
        ) * ((far_thresh - near_thresh) / num_samples)
        depth_values = depth_values + noise
    query_points = (
        ray_origins[..., None, :]
        + ray_directions[..., None, :] * depth_values[..., :, None]
    )
    return query_points, depth_values


def render_volume_density(radiance_field, depth_values):
    """Alpha compositing with relu σ and sigmoid rgb
    (`tiny_nerf.py:68-107`)."""
    sigma_a = jax.nn.relu(radiance_field[..., 3])
    rgb = jax.nn.sigmoid(radiance_field[..., :3])
    one_e_10 = jnp.full_like(depth_values[..., :1], 1e10)
    dists = jnp.concatenate(
        [depth_values[..., 1:] - depth_values[..., :-1], one_e_10], axis=-1
    )
    alpha = 1.0 - jnp.exp(-sigma_a * dists)
    weights = alpha * cumprod_exclusive(1.0 - alpha + 1e-10)
    rgb_map = jnp.sum(weights[..., None] * rgb, axis=-2)
    depth_map = jnp.sum(weights * depth_values, axis=-1)
    acc_map = jnp.sum(weights, axis=-1)
    return rgb_map, depth_map, acc_map


def init_model(key, num_encoding_functions=6, filter_size=128):
    """3-layer MLP (`VeryTinyNerfModel`, `tiny_nerf.py:162-181`)."""
    d_in = 3 + 3 * 2 * num_encoding_functions
    k1, k2, k3 = jax.random.split(key, 3)

    def dense(k, i, o):
        bound = 1.0 / np.sqrt(i)
        kw, kb = jax.random.split(k)
        return {
            "w": jax.random.uniform(kw, (i, o), minval=-bound, maxval=bound),
            "b": jax.random.uniform(kb, (o,), minval=-bound, maxval=bound),
        }

    return [
        dense(k1, d_in, filter_size),
        dense(k2, filter_size, filter_size),
        dense(k3, filter_size, 4),
    ]


def model_apply(params, x):
    x = jax.nn.relu(x @ params[0]["w"] + params[0]["b"])
    x = jax.nn.relu(x @ params[1]["w"] + params[1]["b"])
    return x @ params[2]["w"] + params[2]["b"]


@functools.partial(
    jax.jit, static_argnames=("height", "width", "num_samples", "num_fns")
)
def run_one_iter_of_tinynerf(
    params, height, width, focal, pose, target, key,
    near=2.0, far=6.0, num_samples=32, num_fns=6,
):
    """One training iteration: full-image render + MSE + grads
    (`tiny_nerf.py:111-159,290-299`), as one XLA program."""

    def loss_fn(params):
        intrinsics = jnp.asarray([focal, focal, 0.5, 0.5], jnp.float32)
        ro, rd = get_ray_bundle(height, width, intrinsics, pose[:3, :4])
        pts, z = compute_query_points_from_rays(ro, rd, near, far, num_samples, key)
        pe = positional_encoding(pts, num_fns, True, True)
        radiance = model_apply(params, pe)
        rgb, _, _ = render_volume_density(radiance, z)
        return jnp.mean((rgb - target) ** 2), rgb

    (loss, rgb), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    return loss, rgb, grads


def make_synthetic_tiny_data(n=20, H=48, W=48, num_render_samples=32):
    """Offline stand-in for tiny_nerf_data.npz: multi-view renders of a
    soft-blob volume via the framework's synthetic renderer."""
    from nerface_tpu.data.synthetic import render_blob_frame
    from nerface_tpu.tools.dataset_builder import look_at
    from nerface_tpu.tools.spherical_sampler import sphere_fibonacci_grid_points

    focal = 0.7 * W
    intrinsics = np.array([focal, focal, 0.5, 0.5], np.float32)
    # cameras on a 0.6-radius sphere around the blob (blob radius ~0.08)
    cams = sphere_fibonacci_grid_points(n) * 0.6
    cams[:, 2] = np.abs(cams[:, 2]) + 0.15
    cams *= 0.6 / np.linalg.norm(cams, axis=-1, keepdims=True)
    images, poses = [], []
    bg = np.zeros((H, W, 3), np.float32)
    expr = np.zeros(76, np.float32)
    for cam in cams:
        c2w = look_at(cam.astype(np.float32), np.zeros(3)).astype(np.float32)
        img = render_blob_frame(
            H, W, intrinsics, c2w, expr, bg,
            num_samples=num_render_samples, near=0.2, far=1.2,
        )
        images.append(img)
        poses.append(c2w)
    return np.stack(images), np.stack(poses), np.float32(focal)


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--data", type=str, default=None,
                        help="tiny_nerf_data.npz (downloads not available "
                             "offline; default: synthetic blob dataset)")
    parser.add_argument("--iters", type=int, default=1000)
    parser.add_argument("--display-every", type=int, default=100)
    parser.add_argument("--lr", type=float, default=5e-3)
    parser.add_argument("--near", type=float, default=None)
    parser.add_argument("--far", type=float, default=None)
    args = parser.parse_args(argv)

    if args.data:
        data = np.load(args.data)
        images = data["images"][..., :3].astype(np.float32)
        poses = data["poses"].astype(np.float32)
        focal = np.float32(data["focal"])
        near = args.near if args.near is not None else 2.0  # tiny_nerf.py:211-212
        far = args.far if args.far is not None else 6.0
    else:
        print("No --data given; generating a synthetic blob dataset.")
        images, poses, focal = make_synthetic_tiny_data()
        near = args.near if args.near is not None else 0.2
        far = args.far if args.far is not None else 1.2

    H, W = images.shape[1:3]
    test_idx = len(images) - 1
    testimg, testpose = jnp.asarray(images[test_idx]), jnp.asarray(poses[test_idx])
    images, poses = images[:-1], poses[:-1]

    key = jax.random.PRNGKey(9458)
    params = init_model(key)
    import optax

    opt = optax.adam(args.lr)
    opt_state = opt.init(params)

    t0 = time.time()
    for i in range(args.iters):
        key, k_img, k_noise = jax.random.split(key, 3)
        idx = int(jax.random.randint(k_img, (), 0, len(images)))
        loss, _, grads = run_one_iter_of_tinynerf(
            params, H, W, focal, jnp.asarray(poses[idx]),
            jnp.asarray(images[idx]), k_noise, near=near, far=far,
        )
        updates, opt_state = opt.update(grads, opt_state)
        params = optax.apply_updates(params, updates)

        if i % args.display_every == 0 or i == args.iters - 1:
            test_loss, rgb, _ = run_one_iter_of_tinynerf(
                params, H, W, focal, testpose, testimg, k_noise,
                near=near, far=far,
            )
            psnr = -10.0 * np.log10(float(test_loss))
            print(
                f"iter {i}: train loss {float(loss):.5f}  "
                f"test PSNR {psnr:.2f} dB  ({time.time() - t0:.1f}s)"
            )
    return params


if __name__ == "__main__":
    main()
