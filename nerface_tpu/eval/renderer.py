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
    # Global ray indices key the per-ray random draws (ops/sampling.py):
    # the rendered frame is bit-identical for any tile size or mesh sharding.
    idx_t = jnp.arange(n_pad, dtype=jnp.int32).reshape(-1, tile)

    # Eval is never differentiated: allow the forward-only fused render
    # (MLP + compositing in one kernel) for the fine pass.
    import dataclasses as _dc

    tile_settings = _dc.replace(settings, fused_render=True)

    def render_tile(args):
        ro_i, rd_i, idx_i, bg_i, abl_i = args
        out = render_rays(
            model_coarse, model_fine, params_coarse, params_fine,
            ro_i, rd_i, tile_settings, key=key,
            expressions=expressions, latent_code=latent_code,
            background_prior=bg_i, ray_directions_ablation=abl_i,
            dtype=dtype, ray_index=idx_i,
        )
        # Drop per-sample weights: full-frame weights at 512^2x128 would be
        # 8.6 GB; keep the reduced maps + bg weight only.
        out.pop("weights")
        return {k: v for k, v in out.items() if v is not None}

    tiles = jax.lax.map(render_tile, (ro_t, rd_t, idx_t, bg_t, abl_t))

    def _restore(x):
        flat = x.reshape(n_pad, *x.shape[2:])[:n]
        return flat.reshape(height, width, *x.shape[2:])

    return {k: _restore(v) for k, v in tiles.items()}


def _active_mask(
    ro, rd, height, width, bbox, occupancy, settings,
    pose=None, intrinsics=None,
):
    """Which rays run the radiance field on the fast path: inside the
    pixel bbox (2D) AND touching an occupied voxel (3D) — either test
    alone when the other is absent. Grids carrying splat boxes
    (`OccupancyGrid.with_boxes()`) use the exact projection-splat mask;
    bare grids use per-ray (optionally blocked) probing."""
    n = height * width
    inside = jnp.ones((n,), bool)
    if bbox is not None:
        ii = jnp.arange(n, dtype=jnp.int32) // width   # pixel row
        jj = jnp.arange(n, dtype=jnp.int32) % width    # pixel col
        h0, h1, w0, w1 = bbox[0], bbox[1], bbox[2], bbox[3]
        inside = (ii >= h0) & (ii <= h1) & (jj >= w0) & (jj <= w1)
    if occupancy is not None:
        from nerface_tpu.eval.occupancy import (
            ray_occupancy_mask,
            ray_occupancy_mask_blocked,
            ray_occupancy_mask_splat,
        )

        b = settings.occupancy_block
        if occupancy.boxes_lo is not None and pose is not None:
            inside = inside & ray_occupancy_mask_splat(
                occupancy, pose, intrinsics, height, width,
            )
        elif b > 1 and height % b == 0 and width % b == 0:
            # one probed ray per b×b pixel block — the setup sized `b`
            # so the grid's dilation margin keeps this conservative
            inside = inside & ray_occupancy_mask_blocked(
                occupancy, ro, rd, height, width, settings.near,
                settings.far, settings.occupancy_probes, b,
            )
        else:
            inside = inside & ray_occupancy_mask(
                occupancy, ro, rd, settings.near, settings.far,
                settings.occupancy_probes,
            )
    return inside


@functools.partial(
    jax.jit,
    static_argnames=(
        "model_coarse", "model_fine", "height", "width", "settings", "tile",
        "dtype",
    ),
)
def _render_frame_fast_jit(
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
    bbox,        # (4,) pixel [h0, h1, w0, w1] or None
    tile: int,
    dtype,
    occupancy=None,  # eval.occupancy.OccupancyGrid or None
) -> Dict[str, Any]:
    """Opt-in fast eval: only the rays inside the head bbox run the
    radiance field — everything outside composites directly to the
    background (exactly where a trained model's empty space converges:
    the bg sample's raw RGB with ~full transmittance, §2.4 background
    semantics).  TPU-static skipping: a stable argsort over the inside
    mask packs active rays into a FIXED capacity buffer
    (`settings.fast_eval_capacity` of H·W, rounded up to whole tiles),
    tiles render as usual, and results scatter back.  Rays beyond
    capacity fall back to background — the eval driver sizes the
    capacity from the dataset's largest bbox so none overflow."""
    n = height * width
    # Small tiles round the capacity tighter (a 65536 tile would pad a
    # 0.35 capacity up to 0.5 of the frame — 40% wasted work) and cost no
    # throughput (BENCH_NOTES round-2 eval tile sweep: flat 16k→262k).
    tile = min(tile, 16384)
    cap = _round_up(
        max(1, int(n * float(settings.fast_eval_capacity))), tile
    )
    cap = min(cap, _round_up(n, tile))

    ro, rd = get_ray_bundle(height, width, intrinsics, pose)
    ro = ro.reshape(n, 3)
    rd = rd.reshape(n, 3)

    inside = _active_mask(
        ro, rd, height, width, bbox, occupancy, settings,
        pose=pose, intrinsics=intrinsics,
    )

    # Stable sort puts active rays first in raster order; take `cap`.
    # `cap` can exceed n (capacity ~1.0 rounded up to whole tiles on a
    # frame whose ray count isn't tile-aligned) — resize wraps the order
    # cyclically so `act` is always exactly `cap` long. Duplicate
    # indices are harmless: the per-ray-index RNG renders a repeated ray
    # identically, so the scatter writes the same value twice.
    order = jnp.argsort(~inside, stable=True)
    act = jnp.resize(order, (cap,))

    import dataclasses as _dc

    tile_settings = _dc.replace(settings, fused_render=True)

    bg_flat = background
    ro_t = ro[act].reshape(-1, tile, 3)
    rd_t = rd[act].reshape(-1, tile, 3)
    idx_t = act.reshape(-1, tile)
    bg_t = (
        bg_flat[act].reshape(-1, tile, 3) if bg_flat is not None else None
    )

    def render_tile(args):
        ro_i, rd_i, idx_i, bg_i = args
        out = render_rays(
            model_coarse, model_fine, params_coarse, params_fine,
            ro_i, rd_i, tile_settings, key=key,
            expressions=expressions, latent_code=latent_code,
            background_prior=bg_i, dtype=dtype, ray_index=idx_i,
        )
        out.pop("weights")
        return {k: v for k, v in out.items() if v is not None}

    tiles = jax.lax.map(render_tile, (ro_t, rd_t, idx_t, bg_t))

    # Background defaults for skipped rays: the bg sample absorbs all
    # transmittance (acc/bg_weight 1, depth at the far plane).
    have_bg = bg_flat is not None
    far = jnp.asarray(settings.far, jnp.float32)

    def _default(k):
        if k.startswith("rgb"):
            if have_bg:
                return bg_flat
            return jnp.full((n, 3), 1.0 if settings.white_background else 0.0)
        if k.startswith("disp"):
            return jnp.full((n,), 1.0 / jnp.maximum(far, 1e-10))
        if k.startswith("depth"):
            return jnp.full((n,), far)
        # acc_* / bg_weight
        return jnp.full((n,), 1.0 if have_bg else 0.0)

    out = {}
    for k, v in tiles.items():
        flat = v.reshape(cap, *v.shape[2:])
        full = _default(k).astype(flat.dtype)
        full = full.at[act].set(flat)
        out[k] = full.reshape(height, width, *v.shape[2:])
    return out


def _render_frame_fast_sharded(
    model_coarse, model_fine, params_coarse, params_fine,
    height, width, intrinsics, pose, settings, key,
    expressions, latent_code, background, bbox, tile, dtype,
    mesh, data_axis, occupancy=None,
):
    """Fast eval over a data mesh: the active-ray capacity is sharded so
    every chip renders its block of the bbox rays (ray data stays
    replicated — each chip gathers its own indices locally; the only
    collective is the output all-gather XLA inserts at the shard_map
    boundary). Same skipping semantics as the single-device fast path."""
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    n_dev = mesh.shape[data_axis]
    n = height * width
    tile = min(tile, 16384)  # see _render_frame_fast_jit
    cap = _round_up(
        max(1, int(n * float(settings.fast_eval_capacity))), tile * n_dev
    )
    cap = min(cap, _round_up(n, tile * n_dev))

    ro, rd = get_ray_bundle(height, width, intrinsics, pose)
    ro = ro.reshape(n, 3)
    rd = rd.reshape(n, 3)

    inside = _active_mask(
        ro, rd, height, width, bbox, occupancy, settings,
        pose=pose, intrinsics=intrinsics,
    )
    # resize, not slice: cap may exceed n once rounded up to whole
    # per-device tiles (see _render_frame_fast_jit)
    act = jnp.resize(jnp.argsort(~inside, stable=True), (cap,))

    import dataclasses as _dc

    tile_settings = _dc.replace(settings, fused_render=True)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(data_axis), P(), P(), P()),
        out_specs=P(data_axis), check_vma=False,
    )
    def shard_fn(act_s, ro_f, rd_f, bg_f):
        ro_t = ro_f[act_s].reshape(-1, tile, 3)
        rd_t = rd_f[act_s].reshape(-1, tile, 3)
        idx_t = act_s.reshape(-1, tile)
        bg_t = (
            bg_f[act_s].reshape(-1, tile, 3) if bg_f is not None else None
        )

        def render_tile(args):
            ro_i, rd_i, idx_i, bg_i = args
            out = render_rays(
                model_coarse, model_fine, params_coarse, params_fine,
                ro_i, rd_i, tile_settings, key=key,
                expressions=expressions, latent_code=latent_code,
                background_prior=bg_i, dtype=dtype, ray_index=idx_i,
            )
            out.pop("weights")
            return {k: v for k, v in out.items() if v is not None}

        tiles = jax.lax.map(render_tile, (ro_t, rd_t, idx_t, bg_t))
        return jax.tree_util.tree_map(
            lambda x: x.reshape(-1, *x.shape[2:]), tiles
        )

    tiles = shard_fn(act, ro, rd, background)

    have_bg = background is not None
    far = jnp.asarray(settings.far, jnp.float32)

    def _default(k):
        if k.startswith("rgb"):
            if have_bg:
                return background
            return jnp.full((n, 3), 1.0 if settings.white_background else 0.0)
        if k.startswith("disp"):
            return jnp.full((n,), 1.0 / jnp.maximum(far, 1e-10))
        if k.startswith("depth"):
            return jnp.full((n,), far)
        return jnp.full((n,), 1.0 if have_bg else 0.0)

    out = {}
    for k, v in tiles.items():
        full = _default(k).astype(v.dtype)
        full = full.at[act].set(v)
        out[k] = full.reshape(height, width, *v.shape[1:])
    return out


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
    mesh: Optional[jax.sharding.Mesh] = None,
    data_axis: str = "data",
    bbox: Optional[jnp.ndarray] = None,
    occupancy=None,
) -> Dict[str, jnp.ndarray]:
    """Render one full frame; returns image-shaped maps
    (rgb_coarse/rgb_fine (H,W,3), disp/acc/depth (H,W), bg_weight (H,W)).

    `background` may be (H, W, 3) or flat; `tile` defaults to
    settings.chunksize (the reference's validation chunk size). With a
    `mesh`, the frame's rays are sharded over `data_axis` — each chip
    renders its slice of the ray axis (embarrassingly parallel; the only
    collective is the output all-gather XLA inserts).

    With `settings.fast_eval` and a pixel `bbox` [h0, h1, w0, w1], only
    bbox rays run the radiance field — single-device or sharded over the
    mesh (each chip renders its block of the active-ray capacity). An
    `occupancy` grid (`eval/occupancy.OccupancyGrid`) tightens the
    active set to rays that touch occupied voxels (combined with the
    bbox when both are given; either alone works).
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
    if (
        settings.fast_eval and (bbox is not None or occupancy is not None)
        and abl is None and settings.no_ndc
    ):
        bbox_a = jnp.asarray(bbox, jnp.int32) if bbox is not None else None
        if mesh is not None:
            return _render_frame_fast_sharded(
                model_coarse, model_fine, params_coarse, params_fine,
                height, width, jnp.asarray(intrinsics), jnp.asarray(pose),
                settings, key, expressions, latent_code, bg,
                bbox_a, tile, dtype, mesh, data_axis, occupancy,
            )
        return _render_frame_fast_jit(
            model_coarse, model_fine, params_coarse, params_fine,
            height, width, jnp.asarray(intrinsics), jnp.asarray(pose),
            settings, key, expressions, latent_code, bg,
            bbox_a, tile, dtype, occupancy,
        )
    if mesh is not None:
        return _render_frame_sharded(
            model_coarse, model_fine, params_coarse, params_fine,
            height, width, jnp.asarray(intrinsics), jnp.asarray(pose),
            settings, key, expressions, latent_code, bg, abl, tile, dtype,
            mesh, data_axis,
        )
    return _render_frame_jit(
        model_coarse, model_fine, params_coarse, params_fine,
        height, width, jnp.asarray(intrinsics), jnp.asarray(pose), settings,
        key, expressions, latent_code, bg, abl, tile, dtype,
    )


def _render_frame_sharded(
    model_coarse, model_fine, params_coarse, params_fine,
    height, width, intrinsics, pose, settings, key,
    expressions, latent_code, background, abl, tile, dtype,
    mesh, data_axis,
):
    """Multi-chip full-frame render: pad the H·W ray axis to a multiple of
    n_devices·tile, shard it over the mesh with shard_map, and run the
    single-device tile loop on each chip's slice."""
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    n_dev = mesh.shape[data_axis]
    n = height * width
    tile = min(tile, _round_up(n, n_dev) // n_dev)
    n_pad = _round_up(n, tile * n_dev)
    pad = n_pad - n

    ro, rd = get_ray_bundle(height, width, intrinsics, pose)

    def _flat_pad(x, fill=0.0):
        x = x.reshape(n, -1)
        return jnp.pad(x, ((0, pad), (0, 0)), constant_values=fill)

    ro_f = _flat_pad(ro)
    rd_f = _flat_pad(rd, fill=1.0)
    bg_f = _flat_pad(background) if background is not None else None
    abl_f = _flat_pad(abl, fill=1.0) if abl is not None else None
    # Global ray indices — sharding slices this arange, so each chip draws
    # its rays' randomness with their GLOBAL indices: the sharded frame is
    # bit-identical to the single-device render with the same key.
    idx_f = jnp.arange(n_pad, dtype=jnp.int32)

    ray_args = (ro_f, rd_f, idx_f, bg_f, abl_f)
    in_specs = tuple(P(data_axis) if a is not None else P() for a in ray_args)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=in_specs, out_specs=P(data_axis), check_vma=False,
    )
    def shard_fn(ro_s, rd_s, idx_s, bg_s, abl_s):
        ro_t = ro_s.reshape(-1, tile, 3)
        rd_t = rd_s.reshape(-1, tile, 3)
        idx_t = idx_s.reshape(-1, tile)
        bg_t = bg_s.reshape(-1, tile, 3) if bg_s is not None else None
        abl_t = abl_s.reshape(-1, tile, 3) if abl_s is not None else None

        import dataclasses as _dc

        tile_settings = _dc.replace(settings, fused_render=True)

        def render_tile(args):
            ro_i, rd_i, idx_i, bg_i, abl_i = args
            out = render_rays(
                model_coarse, model_fine, params_coarse, params_fine,
                ro_i, rd_i, tile_settings, key=key,
                expressions=expressions, latent_code=latent_code,
                background_prior=bg_i, ray_directions_ablation=abl_i,
                dtype=dtype, ray_index=idx_i,
            )
            out.pop("weights")
            return {k: v for k, v in out.items() if v is not None}

        tiles = jax.lax.map(render_tile, (ro_t, rd_t, idx_t, bg_t, abl_t))
        return jax.tree_util.tree_map(
            lambda x: x.reshape(-1, *x.shape[2:]), tiles
        )

    out = shard_fn(*ray_args)

    def _restore(x):
        return x[:n].reshape(height, width, *x.shape[1:])

    return {k: _restore(v) for k, v in out.items()}
