"""Full-frame rendering: the eval/validation path.

Replaces the reference's chunked validation render
(`run_one_iter_of_nerf(mode="validation")` with chunksize 65536,
`train_utils.py:227-232,270-288`) with a single jitted program that tiles
the H·W rays with `lax.map` — each tile's buffers are reused, bounding HBM
at tile size while XLA pipelines the tiles.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from nerface_tpu.ops.rays import get_ray_bundle
from nerface_tpu.render.pipeline import RenderSettings, render_rays


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


@functools.partial(
    jax.jit,
    static_argnames=(
        "model_coarse", "model_fine", "height", "width", "settings", "tile", "dtype",
    ),
)
def _render_frame_jit(
    model_coarse,
    model_fine,
    params_coarse,
    params_fine,
    height: int,
    width: int,
    intrinsics,
    pose,
    settings: RenderSettings,
    key,
    expressions,
    latent_code,
    background,  # (H*W, 3) or None
    ray_directions_ablation,  # (H*W, 3) or None
    tile: int,
    dtype,
) -> Dict[str, Any]:
    ro, rd = get_ray_bundle(height, width, intrinsics, pose)
    if not settings.no_ndc:
        # LLFF path: project to NDC, near/far -> 0/1 (`train_utils.py:198-207`)
        import dataclasses

        from nerface_tpu.ops.rays import ndc_rays

        ro, rd = ndc_rays(
            height, width, intrinsics[:2], 1.0, ro.reshape(-1, 3), rd.reshape(-1, 3)
        )
        settings = dataclasses.replace(settings, no_ndc=True, near=0.0, far=1.0)
    n = height * width
    n_pad = _round_up(n, tile)
    pad = n_pad - n

    def _flat_pad(x, fill=0.0):
        x = x.reshape(n, -1)
        return jnp.pad(x, ((0, pad), (0, 0)), constant_values=fill)

    ro_t = _flat_pad(ro).reshape(-1, tile, 3)
    rd_t = _flat_pad(rd, fill=1.0).reshape(-1, tile, 3)
    bg_t = (
        _flat_pad(background).reshape(-1, tile, 3) if background is not None else None
    )
    abl_t = (
        _flat_pad(ray_directions_ablation, fill=1.0).reshape(-1, tile, 3)
        if ray_directions_ablation is not None
        else None
    )
    keys = jax.random.split(key, ro_t.shape[0])

    def render_tile(args):
        ro_i, rd_i, key_i, bg_i, abl_i = args
        out = render_rays(
            model_coarse, model_fine, params_coarse, params_fine,
            ro_i, rd_i, settings, key=key_i,
            expressions=expressions, latent_code=latent_code,
            background_prior=bg_i, ray_directions_ablation=abl_i,
            dtype=dtype,
        )
        # Drop per-sample weights: full-frame weights at 512^2x128 would be
        # 8.6 GB; keep the reduced maps + bg weight only.
        out.pop("weights")
        return {k: v for k, v in out.items() if v is not None}

    tiles = jax.lax.map(render_tile, (ro_t, rd_t, keys, bg_t, abl_t))

    def _restore(x):
        flat = x.reshape(n_pad, *x.shape[2:])[:n]
        return flat.reshape(height, width, *x.shape[2:])

    return {k: _restore(v) for k, v in tiles.items()}


def render_full_frame(
    model_coarse,
    model_fine,
    params_coarse,
    params_fine,
    height: int,
    width: int,
    intrinsics,
    pose,
    settings: RenderSettings,
    key: Optional[jax.Array] = None,
    expressions: Optional[jnp.ndarray] = None,
    latent_code: Optional[jnp.ndarray] = None,
    background: Optional[jnp.ndarray] = None,
    ray_directions_ablation: Optional[jnp.ndarray] = None,
    tile: Optional[int] = None,
    dtype=None,
) -> Dict[str, jnp.ndarray]:
    """Render one full frame; returns image-shaped maps
    (rgb_coarse/rgb_fine (H,W,3), disp/acc/depth (H,W), bg_weight (H,W)).

    `background` may be (H, W, 3) or flat; `tile` defaults to
    settings.chunksize (the reference's validation chunk size).
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    tile = int(tile or settings.chunksize)
    tile = min(tile, height * width)
    bg = background.reshape(-1, 3) if background is not None else None
    abl = (
        ray_directions_ablation.reshape(-1, 3)
        if ray_directions_ablation is not None
        else None
    )
    return _render_frame_jit(
        model_coarse, model_fine, params_coarse, params_fine,
        height, width, jnp.asarray(intrinsics), jnp.asarray(pose), settings,
        key, expressions, latent_code, bg, abl, tile, dtype,
    )
