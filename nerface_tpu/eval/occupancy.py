"""Occupancy-grid ray skipping — the 3D upgrade of fast-eval's 2D bbox.

The reference renders every ray of every frame at the full sample count
(`eval_transformed_rays.py:449-467`); the repo's opt-in fast-eval mode
(`eval/renderer.py`) skips rays outside the head-bbox union. This module
tightens that further with the NerfAcc-style occupancy idea from
PAPERS.md, adapted to TPU static shapes: a boolean voxel grid marks
where the *trained field itself* has density; a ray whose probe points
never touch an occupied voxel composites straight to background. The
surviving rays ride the existing capacity-pack machinery unchanged, so
the quality contract is identical — active rays are bit-identical to the
parity renderer, skipped rays return the exact background pixel — but
the active set is the head's 3D silhouette instead of its bounding
rectangle (a face fills ~55-70% of its own bbox), and the capacity (=
rendered rays per frame) shrinks by the same factor.

Everything here is plain XLA: the build is a chunked sweep of the model
over grid centers (the same FLOPs as rendering a fraction of one frame),
the per-frame mask is `n_rays x n_probes` gathers, and both are jittable
with static shapes. Conservativeness knobs — sigma threshold, dilation,
probe count — all default to over-inclusion: a false-positive voxel
costs a few extra rendered rays; a false negative would clip the face.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from nerface_tpu.ops.rays import get_ray_bundle


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class OccupancyGrid:
    """Boolean voxel grid over a world-space AABB."""

    grid: jnp.ndarray      # (R, R, R) bool
    aabb_lo: jnp.ndarray   # (3,) f32
    aabb_hi: jnp.ndarray   # (3,) f32

    def tree_flatten(self):
        return (self.grid, self.aabb_lo, self.aabb_hi), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def resolution(self) -> int:
        return int(self.grid.shape[0])

    def occupancy_fraction(self) -> float:
        return float(jnp.mean(self.grid.astype(jnp.float32)))

    def save(self, path: str) -> None:
        np.savez_compressed(
            path, grid=np.asarray(self.grid), lo=np.asarray(self.aabb_lo),
            hi=np.asarray(self.aabb_hi),
        )

    @classmethod
    def load(cls, path: str) -> "OccupancyGrid":
        with np.load(path) as z:
            return cls(
                jnp.asarray(z["grid"]), jnp.asarray(z["lo"]),
                jnp.asarray(z["hi"]),
            )


def ray_aabb(
    poses: np.ndarray,
    intrinsics,
    height: int,
    width: int,
    near: float,
    far: float,
    margin: float = 0.05,
    grid: int = 8,
) -> tuple[np.ndarray, np.ndarray]:
    """World AABB of the sampling region: min/max over a coarse pixel
    grid of every pose's rays at t=near and t=far (the region any
    sample point can occupy), padded by `margin` of its extent."""
    lo = np.full(3, np.inf)
    hi = np.full(3, -np.inf)
    intr = jnp.asarray(intrinsics, jnp.float32)
    ii = np.linspace(0, height - 1, grid).astype(np.int64)
    jj = np.linspace(0, width - 1, grid).astype(np.int64)
    for pose in np.asarray(poses):
        ro, rd = get_ray_bundle(
            height, width, intr, jnp.asarray(pose[:3, :4], jnp.float32)
        )
        ro = np.asarray(ro)[ii[:, None], jj[None, :]].reshape(-1, 3)
        rd = np.asarray(rd)[ii[:, None], jj[None, :]].reshape(-1, 3)
        for t in (near, far):
            p = ro + t * rd
            lo = np.minimum(lo, p.min(axis=0))
            hi = np.maximum(hi, p.max(axis=0))
    pad = (hi - lo) * margin
    return (lo - pad).astype(np.float32), (hi + pad).astype(np.float32)


def _dilate(grid: jnp.ndarray, steps: int) -> jnp.ndarray:
    """3D morphological dilation (3**3 max window), `steps` times."""
    g = grid.astype(jnp.float32)[None, ..., None]   # NDHWC for reduce_window
    for _ in range(max(steps, 0)):
        g = jax.lax.reduce_window(
            g, -jnp.inf, jax.lax.max, (1, 3, 3, 3, 1), (1, 1, 1, 1, 1),
            "SAME",
        )
    return (g[0, ..., 0] > 0.5)


def default_sigma_threshold(near: float, far: float, num_coarse: int,
                            alpha: float = 1e-2) -> float:
    """Sigma whose alpha over one coarse sampling step is `alpha` — below
    it a voxel is invisible at the renderer's own resolution."""
    dz = (far - near) / max(num_coarse, 1)
    return float(-np.log1p(-alpha) / max(dz, 1e-8))


def build_occupancy_grid(
    model,
    params,
    encode_xyz,
    encode_dir,
    aabb_lo,
    aabb_hi,
    resolution: int = 64,
    expressions: Optional[Sequence[np.ndarray]] = None,
    latent_code: Optional[np.ndarray] = None,
    sigma_threshold: float = 1.0,
    dilate: int = 1,
    chunk: int = 65536,
    dtype=None,
) -> OccupancyGrid:
    """Sweep the trained field over voxel centers; a voxel is occupied if
    its sigma clears `sigma_threshold` under ANY of the given
    `expressions` (the conditional models' density moves with the face —
    pass a sample of the dataset's expressions; max-pooling over them
    plus `dilate` keeps the grid conservative). Sigma is evaluated under
    a fixed view direction: every paper-family model computes sigma
    before the direction branch joins, so the choice is immaterial
    there; for toy models with early dir fusion the dilation absorbs the
    approximation."""
    res = int(resolution)
    lo = jnp.asarray(aabb_lo, jnp.float32)
    hi = jnp.asarray(aabb_hi, jnp.float32)
    centers = (jnp.arange(res, dtype=jnp.float32) + 0.5) / res
    gx, gy, gz = jnp.meshgrid(centers, centers, centers, indexing="ij")
    pts = jnp.stack([gx, gy, gz], axis=-1).reshape(-1, 3) * (hi - lo) + lo

    n = pts.shape[0]
    chunk = int(min(chunk, n))
    n_pad = ((n + chunk - 1) // chunk) * chunk
    pts = jnp.pad(pts, ((0, n_pad - n), (0, 0)))
    pts_c = pts.reshape(-1, chunk, 1, 3)   # (tiles, chunk "rays", 1 sample)

    if expressions is None:
        exprs = [None]
    else:
        exprs = [jnp.asarray(e, jnp.float32) for e in expressions]
    latent = (
        jnp.asarray(latent_code, jnp.float32)
        if latent_code is not None else None
    )

    dir_feat = None
    if encode_dir is not None:
        fixed_dir = jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32)
        dir_feat = jnp.broadcast_to(
            encode_dir(fixed_dir), (chunk, encode_dir(fixed_dir).shape[-1])
        )

    @jax.jit
    def _sigma_max(p_tiles):
        def one(p):
            best = None
            for e in exprs:
                out = model.apply(
                    params, encode_xyz(p), dir_feat,
                    e if model.takes_expression else None,
                    latent if model.takes_latent else None,
                    dtype=dtype,
                )
                s = out[..., 3].reshape(-1)
                best = s if best is None else jnp.maximum(best, s)
            return best

        return jax.lax.map(one, p_tiles)

    sigma = np.asarray(_sigma_max(pts_c), np.float32).reshape(-1)[:n]
    occ = jnp.asarray(sigma.reshape(res, res, res) > float(sigma_threshold))
    occ = _dilate(occ, dilate)
    return OccupancyGrid(occ, lo, hi)


def ray_occupancy_mask(
    occ: OccupancyGrid,
    ray_origins: jnp.ndarray,    # (n, 3)
    ray_directions: jnp.ndarray,  # (n, 3)
    near: float,
    far: float,
    n_probes: int = 128,
) -> jnp.ndarray:
    """(n,) bool — does the ray touch ANY occupied voxel? `n_probes`
    equidistant probe points over [near, far]; at the default 128 probes
    the spacing is finer than a 64**3 voxel over the standard [0.2, 0.8]
    bounds, so probes cannot step over a (dilated) occupied cell."""
    res = occ.resolution
    t = jnp.linspace(float(near), float(far), int(n_probes), dtype=jnp.float32)
    pts = (
        ray_origins[:, None, :]
        + ray_directions[:, None, :] * t[None, :, None]
    )
    u = (pts - occ.aabb_lo) / (occ.aabb_hi - occ.aabb_lo)
    in_box = jnp.all((u >= 0.0) & (u < 1.0), axis=-1)
    idx = jnp.clip((u * res).astype(jnp.int32), 0, res - 1)
    hit = occ.grid[idx[..., 0], idx[..., 1], idx[..., 2]]
    return jnp.any(hit & in_box, axis=-1)


def conservative_block(
    occ: OccupancyGrid,
    intrinsics,
    far: float,
    height: int,
    width: int,
    dilate: int = 1,
    max_block: int = 8,
) -> int:
    """Largest power-of-two pixel block size B (dividing H and W, ≤
    `max_block`) such that probing ONE ray per B×B block against the
    `dilate`-dilated grid stays conservative for every ray in the block.

    Bound: a skipped ray is at most B·√2/2 pixels from its block-center
    ray, i.e. ≤ far·(B·√2/2)/f world units off at the far plane. If that
    offset is at most HALF the grid's dilation margin (`dilate` voxels),
    any truly-occupied voxel the ray traverses lies inside the dilated
    neighbourhood the center ray probes — the factor 2 leaves the other
    half of the margin for the along-ray probe spacing
    (`ray_occupancy_mask` docstring). Returns 1 when even B=2 violates
    the bound (the caller falls back to per-ray probing)."""
    vox = float(
        np.min((np.asarray(occ.aabb_hi) - np.asarray(occ.aabb_lo)))
        / occ.resolution
    )
    f_min = float(np.min(np.asarray(intrinsics, np.float64)[:2]))
    limit = dilate * vox * f_min / (np.sqrt(2.0) * float(far))
    b = 1
    while (
        b * 2 <= max_block
        and b * 2 <= limit
        and height % (b * 2) == 0
        and width % (b * 2) == 0
    ):
        b *= 2
    return b


def ray_occupancy_mask_blocked(
    occ: OccupancyGrid,
    ray_origins: jnp.ndarray,     # (H*W, 3) raster order
    ray_directions: jnp.ndarray,  # (H*W, 3)
    height: int,
    width: int,
    near: float,
    far: float,
    n_probes: int,
    block: int,
) -> jnp.ndarray:
    """(H*W,) bool — `ray_occupancy_mask` probed at one ray per
    `block`×`block` pixel block (the block-center ray) and broadcast to
    the block. Cuts the probe-gather cost by block² (at 512² / B=8 the
    full-frame mask cost ~0.4 s/frame — more than the render it saves;
    blocked it is ~ms). Conservative when `block` ≤
    `conservative_block(...)` — the grid's dilation margin covers the
    ≤ far·B·√2/2/f world-space offset between a ray and its block
    center."""
    c = block // 2
    ro = ray_origins.reshape(height, width, 3)[c::block, c::block]
    rd = ray_directions.reshape(height, width, 3)[c::block, c::block]
    hb, wb = ro.shape[0], ro.shape[1]
    m = ray_occupancy_mask(
        occ, ro.reshape(-1, 3), rd.reshape(-1, 3), near, far, n_probes
    ).reshape(hb, wb)
    m = jnp.repeat(jnp.repeat(m, block, axis=0), block, axis=1)
    return m.reshape(height * width)


def fast_eval_setup(
    dataset,
    render_poses: np.ndarray,
    render_expressions: np.ndarray,
    settings,
    model_coarse,
    params_coarse,
    latent_codes=None,
    dtype=None,
    log: bool = False,
    extra_expressions: Optional[Sequence[np.ndarray]] = None,
):
    """One shared fast-eval setup for the eval driver AND the avatar
    server (they must not diverge — a served frame is contractually
    pixel-identical to batch eval): the head-bbox union over the test
    split with the capacity sized to it, plus — when
    `settings.occupancy` — the occupancy grid built from the trained
    field with the capacity tightened to the measured worst-case active
    fraction. `extra_expressions` joins the grid-build sample for eval
    modes that synthesize expressions beyond the dataset's (the mouth
    sweep); returns (bbox, settings, occupancy_grid_or_None)."""
    i_test = np.asarray(dataset.i_test)
    bbs = np.asarray(dataset.bboxes)[i_test]
    bbox = np.array(
        [bbs[:, 0].min(), bbs[:, 1].max(),
         bbs[:, 2].min(), bbs[:, 3].max()], np.int32,
    )
    H, W = dataset.H, dataset.W
    area = (
        float(bbox[1] - bbox[0] + 1) * float(bbox[3] - bbox[2] + 1)
        / float(H * W)
    )
    settings = dataclasses.replace(
        settings, fast_eval_capacity=min(1.0, area * 1.05)
    )
    if log:
        print(
            f"[fast-eval] bbox union {bbox.tolist()}, active capacity "
            f"{settings.fast_eval_capacity:.2f} of {H * W} rays"
        )

    occ = None
    if settings.occupancy:
        lo, hi = ray_aabb(
            render_poses, dataset.intrinsics, H, W,
            settings.near, settings.far,
        )
        sample = list(render_expressions[np.linspace(
            0, max(len(render_expressions) - 1, 0), num=8, dtype=np.int64
        )])
        if extra_expressions is not None:
            sample += [np.asarray(e) for e in extra_expressions]
        occ = build_occupancy_grid(
            model_coarse, params_coarse,
            settings.encode_xyz, settings.encode_dir, lo, hi,
            resolution=settings.occupancy_resolution,
            expressions=sample,
            latent_code=(
                np.asarray(latent_codes[0])
                if latent_codes is not None else None
            ),
            sigma_threshold=default_sigma_threshold(
                settings.near, settings.far, settings.num_coarse
            ),
            dilate=settings.occupancy_dilate,
            dtype=dtype,
        )
        # render-time mask block: one probed ray per B×B pixel block
        # (0 in the config = auto from the conservativeness bound)
        block = settings.occupancy_block
        if block == 0:
            block = conservative_block(
                occ, dataset.intrinsics, settings.far, H, W,
                dilate=max(settings.occupancy_dilate, 1),
            )
        frac = active_fraction(
            occ, render_poses, dataset.intrinsics, H, W,
            settings.near, settings.far, settings.occupancy_probes,
            block=block,
        )
        # `frac` is EXACT for these poses (the grid is frozen and the
        # measurement reuses the render-time mask code), so the margin
        # only buys headroom for novel serve-time poses — overflowing
        # rays fall back to background (renderer docstring).
        settings = dataclasses.replace(
            settings,
            occupancy_block=block,
            fast_eval_capacity=min(
                settings.fast_eval_capacity,
                min(1.0, frac * settings.occupancy_margin),
            ),
        )
        if log:
            print(
                f"[fast-eval] occupancy grid "
                f"{settings.occupancy_resolution}^3 "
                f"({occ.occupancy_fraction():.3f} occupied), mask block "
                f"{block}, active capacity "
                f"{settings.fast_eval_capacity:.2f}"
            )
    return bbox, settings, occ


def active_fraction(
    occ: OccupancyGrid,
    poses: np.ndarray,
    intrinsics,
    height: int,
    width: int,
    near: float,
    far: float,
    n_probes: int = 128,
    block: int = 1,
) -> float:
    """Max over `poses` of the fraction of rays the grid keeps — sizes
    `fast_eval_capacity` the way the driver sizes it from the bbox.
    `block` MUST match the render-time mask's block size: the capacity
    bounds the count of active rays as the renderer computes them."""
    intr = jnp.asarray(intrinsics, jnp.float32)

    @jax.jit
    def frac(pose):
        ro, rd = get_ray_bundle(height, width, intr, pose)
        if block > 1:
            m = ray_occupancy_mask_blocked(
                occ, ro.reshape(-1, 3), rd.reshape(-1, 3), height, width,
                near, far, n_probes, block,
            )
        else:
            m = ray_occupancy_mask(
                occ, ro.reshape(-1, 3), rd.reshape(-1, 3), near, far,
                n_probes,
            )
        return jnp.mean(m.astype(jnp.float32))

    best = 0.0
    for pose in np.asarray(poses):
        best = max(best, float(frac(jnp.asarray(pose[:3, :4], jnp.float32))))
    return best
