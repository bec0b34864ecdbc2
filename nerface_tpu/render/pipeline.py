"""The rendering pipeline: coarse pass → hierarchical resample → fine pass
→ composite, as one traced function.

Replaces the reference's orchestration stack (`train_utils.py`:
`run_network` :9-33, `predict_and_render_radiance` :36-162,
`run_one_iter_of_nerf` :165-290).  The reference's Python chunk loop
(`get_minibatches`, chunksize 2048/65536) exists only to bound GPU memory;
under jit the whole ray batch is one program and memory is bounded by
tiling at the *eval* level (`nerface_tpu/eval`), so there is no chunk loop
here at all.

Faithfully reproduced semantics (see SURVEY.md §2.4):

* ray records are conceptually ``[ro, rd, near, far]`` — and the
  "view-direction" input the reference feeds the direction branch is
  ``ray_batch[..., -3:]`` of that 8-float record (`train_utils.py:14`),
  i.e. **[rd_z, near, far]**, not the normalized direction (the normalized
  `viewdirs` is computed at `train_utils.py:183-188` and then discarded at
  :218).  Checkpoint parity requires reproducing exactly this.
* background injection overwrites the last sample's radiance with the raw
  background pixel before compositing (`train_utils.py:95-96,141-142`).
* hierarchical sampling uses coarse weights[..., 1:-1] over z-midpoints,
  det when perturb==0, gradient-stopped, merged+sorted with the coarse
  z-values (`train_utils.py:117-126`).
* the last return value is the *fine* weights' final (background) column
  (`train_utils.py:162`).
* when `ray_directions_ablation` is provided (eval-only view-direction
  ablation), the direction-branch input is taken from the ablation rays.
  Deviation: the reference pairs each chunk with the ablation rays of the
  *first* chunk (`train_utils.py:82` indexes `ray_dirs_fake[0]`); we pair
  per-ray (the sane alignment), documented here as intended behavior.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from nerface_tpu.ops.compositing import inject_background, volume_render_radiance_field
from nerface_tpu.ops.encoding import positional_encoding
from nerface_tpu.ops.rays import ndc_rays
from nerface_tpu.ops.sampling import merge_sorted_zvals, sample_pdf, stratified_zvals


@dataclasses.dataclass(frozen=True)
class EncodeSpec:
    num_encoding_functions: int
    include_input: bool
    log_sampling: bool

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return positional_encoding(
            x,
            num_encoding_functions=self.num_encoding_functions,
            include_input=self.include_input,
            log_sampling=self.log_sampling,
        )


@dataclasses.dataclass(frozen=True)
class RenderSettings:
    """Static (hashable) render configuration — safe as a jit static arg.

    Mirrors `getattr(options.nerf, mode)` plus the dataset near/far bounds.
    """

    num_coarse: int = 64
    num_fine: int = 64
    perturb: bool = True
    radiance_field_noise_std: float = 0.0
    white_background: bool = False
    lindisp: bool = False
    use_viewdirs: bool = True
    near: float = 0.2
    far: float = 0.8
    no_ndc: bool = True
    encode_xyz: EncodeSpec = EncodeSpec(10, True, True)
    encode_dir: Optional[EncodeSpec] = EncodeSpec(4, False, True)
    chunksize: int = 65536  # eval-time ray tile size (memory bound), not a loop here
    # Fused Pallas MLP kernel: "auto" fuses when computing in bfloat16 on a
    # TPU backend and the model is the flagship paper model; "on"/"off"
    # force. f32 (dtype=None) stays on the XLA path for reference parity.
    fused: str = "auto"
    # Fused render (MLP + compositing in one kernel) for the fine pass.
    # Forward-only — set internally by the full-frame eval renderer, never
    # on a differentiated path (the render kernel has no VJP).
    fused_render: bool = False
    # Opt-in fast eval (OFF the parity path): only rays inside the frame's
    # head bbox run the radiance field; the rest are composited straight to
    # the background. Static shapes via a fixed active-ray capacity —
    # `fast_eval_capacity` is the fraction of H*W rays given to the MLP
    # (the eval driver sizes it from the dataset's largest bbox). The
    # reference renders every ray (`eval_transformed_rays.py:449-467`);
    # recorded speed/PSNR deltas live in BENCH_NOTES.md.
    fast_eval: bool = False
    fast_eval_capacity: float = 0.6
    # Occupancy-grid ray skipping on top of fast_eval (eval/occupancy.py):
    # `occupancy` turns it on (the eval driver builds the grid from the
    # trained field at startup), `occupancy_resolution` is the voxel grid
    # side, and `occupancy_dilate` the conservative dilation steps.
    # `occupancy_mask` picks the render-time ray mask: "splat" (default —
    # exact conservative projection splat over a tight AABB, ~ms/frame)
    # or "probe" (legacy per-ray grid probing over the frustum AABB;
    # `occupancy_probes` test points per ray, `occupancy_block` probes
    # one ray per B×B pixel block, 0 = auto from the conservativeness
    # bound, 1 = per-ray). `occupancy_dilate` defaults per mode (config
    # default splat 0 / probe 1): probing needs the one-voxel halo so
    # probe spacing can't step over a cell, while the splat mask is
    # geometrically exact per voxel and gets its sub-voxel safety from
    # the 2x supersampled grid build instead — the measured halo cost on
    # a converged 512² head is the whole win (kept-ray fraction 0.77x
    # bbox without the halo, 1.00x with it). `occupancy_margin` is the
    # capacity headroom over the measured active fraction (the fraction
    # is exact for the setup's poses — margin only buys room for novel
    # serve-time poses).
    occupancy: bool = False
    occupancy_mask: str = "splat"
    occupancy_resolution: int = 128
    occupancy_probes: int = 128
    occupancy_dilate: int = 0
    occupancy_block: int = 0
    occupancy_margin: float = 1.05

    @classmethod
    def from_cfg(cls, cfg, mode: str = "train") -> "RenderSettings":
        node = getattr(cfg.nerf, mode)
        encode_dir = None
        if cfg.models.coarse.use_viewdirs:
            encode_dir = EncodeSpec(
                cfg.models.coarse.num_encoding_fn_dir,
                cfg.models.coarse.include_input_dir,
                cfg.models.coarse.log_sampling_dir,
            )
        return cls(
            num_coarse=node.num_coarse,
            num_fine=node.num_fine,
            perturb=bool(node.perturb),
            radiance_field_noise_std=float(node.radiance_field_noise_std),
            white_background=bool(node.white_background),
            lindisp=bool(node.lindisp),
            use_viewdirs=bool(cfg.nerf.use_viewdirs),
            near=float(cfg.dataset.near),
            far=float(cfg.dataset.far),
            no_ndc=bool(cfg.dataset.no_ndc),
            encode_xyz=EncodeSpec(
                cfg.models.coarse.num_encoding_fn_xyz,
                cfg.models.coarse.include_input_xyz,
                cfg.models.coarse.log_sampling_xyz,
            ),
            encode_dir=encode_dir,
            chunksize=int(node.chunksize),
            fast_eval=bool(node.get("fast_eval", False)),
            fast_eval_capacity=float(node.get("fast_eval_capacity", 0.6)),
            occupancy=bool(node.get("occupancy", False)),
            occupancy_mask=str(node.get("occupancy_mask", "splat")),
            occupancy_resolution=int(node.get("occupancy_resolution", 128)),
            occupancy_probes=int(node.get("occupancy_probes", 128)),
            occupancy_dilate=int(node.get(
                "occupancy_dilate",
                0 if str(node.get("occupancy_mask", "splat")) == "splat"
                else 1,
            )),
            occupancy_block=int(node.get("occupancy_block", 0)),
            occupancy_margin=float(node.get("occupancy_margin", 1.05)),
        )


def _fused_variant(model) -> Optional[bool]:
    """None if the model has no fused kernel; else the kernel's `small`
    flag (False = flagship paper model, True = the smaller paper variant
    with one fewer post-skip trunk layer and expr in the dir branch)."""
    from nerface_tpu.models.nerf_models import (
        ConditionalBlendshapePaperNeRFModel,
        ConditionalBlendshapePaperSmallerNeRFModel,
    )

    if isinstance(model, ConditionalBlendshapePaperSmallerNeRFModel):
        return True
    if isinstance(model, ConditionalBlendshapePaperNeRFModel):
        return False
    return None


def _fused_model_ok(model, encode_xyz, pe_dir, expr, latent) -> bool:
    """Shared static shape/structure checks for all fused entry points."""
    small = _fused_variant(model)
    if small is None:
        return False
    if pe_dir is None or expr is None or latent is None:
        return False
    if expr.ndim != 1 or latent.ndim != 1:
        return False
    if not encode_xyz.include_input:
        return False
    if model.dim_xyz != 3 + 6 * encode_xyz.num_encoding_functions:
        return False
    # apply() slices the first pe_dir-width dir columns; the model may
    # declare more (include_input_dir default) — same slice here
    if model.dim_dir < pe_dir.shape[-1]:
        return False
    if small and getattr(model, "dim_expression", 0) != 76:
        return False
    return True


def _fused_conditioning(model, params, pe_dir, expr, latent):
    """(cond, dir_contrib, small) for a fused call on `model`."""
    from nerface_tpu.models.mlp import cond_contribution, linear_cols

    small = bool(_fused_variant(model))
    cond = jnp.concatenate([expr * (1.0 / 3.0), latent])
    dd = pe_dir.shape[-1]
    dir_contrib = linear_cols(params, "layers_dir.0", pe_dir, 256, 256 + dd)
    if small:
        # smaller variant: dir branch consumes [feat; dirs; expr/3]
        # (`models.py:330`) — the per-frame expression folds to one vector.
        # Expression columns start at the DECLARED dir width (the model may
        # declare more dir columns than pe_dir provides — the include_input
        # quirk shared with the paper model).
        dir_contrib = dir_contrib + cond_contribution(
            params, "layers_dir.0",
            [(expr * (1.0 / 3.0), model.dim_expression)], 256 + model.dim_dir,
        )
    return cond, dir_contrib, small


def _apply_model(
    model, params, ro, rd, z_vals, encode_xyz: "EncodeSpec", pe_dir,
    expr, latent, dtype, fused: str
) -> jnp.ndarray:
    """Encode + evaluate the radiance field: dispatch to the fused Pallas
    MLP (which computes the positional encoding in VMEM) when eligible,
    else positional-encode and run the pure-JAX apply. Eligibility (all
    trace-time static): paper model family, structured (R, S, 3) points,
    per-frame 1-D conditioning, include-input log/linear PE, TPU backend,
    ray count divisible by the tile size."""
    if fused != "off":
        want = fused == "on" or (fused == "auto" and dtype == jnp.bfloat16)
        if (
            want
            and ro.ndim == 2
            and z_vals.ndim == 2
            and pe_dir is not None
            and pe_dir.ndim == 2
            and _fused_model_ok(model, encode_xyz, pe_dir, expr, latent)
        ):
            from nerface_tpu.ops.pallas.fused_mlp import (
                _pick_rays_per_tile,
                fused_paper_mlp,
                fused_paper_mlp_available,
            )

            tr = _pick_rays_per_tile(z_vals.shape[0], z_vals.shape[1])
            if fused_paper_mlp_available(z_vals.shape[0], tr):
                cond, dir_contrib, small = _fused_conditioning(
                    model, params, pe_dir, expr, latent
                )
                return fused_paper_mlp(
                    params, ro, rd, z_vals, dir_contrib, cond,
                    num_encoding_fn_xyz=encode_xyz.num_encoding_functions,
                    log_sampling_xyz=encode_xyz.log_sampling,
                    rays_per_tile=tr,
                    small=small,
                )
        if (
            want
            and ro.ndim == 2
            and z_vals.ndim == 2
            and pe_dir is not None
            and pe_dir.ndim == 2
            and (expr is None or expr.ndim == 1)
            and (latent is None or latent.ndim == 1)
            and (not getattr(model, "takes_expression", False) or expr is not None)
            and (not getattr(model, "takes_latent", False) or latent is not None)
        ):
            from nerface_tpu.ops.pallas.fused_flex import (
                flex_fused_eligible,
                fused_flex_mlp,
            )

            if flex_fused_eligible(model, encode_xyz, pe_dir):
                from nerface_tpu.models.mlp import cond_contribution, linear_cols
                from nerface_tpu.ops.pallas.fused_mlp import (
                    _pick_rays_per_tile,
                    fused_paper_mlp_available,
                )

                tr = _pick_rays_per_tile(z_vals.shape[0], z_vals.shape[1])
                if fused_paper_mlp_available(z_vals.shape[0], tr):
                    h = model.hidden_size
                    e, l = model._prepare(
                        params,
                        expr if model.takes_expression else None,
                        latent if model.takes_latent else None,
                        None,
                    )
                    v0 = params["layer1.bias"]
                    segs = model._cond_segments_layer1(e, l)
                    if segs:
                        v0 = v0 + cond_contribution(
                            params, "layer1", segs, model.dim_xyz
                        )
                    dd = pe_dir.shape[-1]
                    dir_contrib = linear_cols(
                        params, "layers_dir.0", pe_dir, h, h + dd
                    )
                    return fused_flex_mlp(
                        params, ro, rd, z_vals, dir_contrib, v0[None, :],
                        n_hidden=model.num_layers - 1,
                        hidden_size=h,
                        num_encoding_fn_xyz=encode_xyz.num_encoding_functions,
                        log_sampling_xyz=encode_xyz.log_sampling,
                        rays_per_tile=tr,
                    )
    pts = ro[..., None, :] + rd[..., None, :] * z_vals[..., :, None]
    pe_xyz = encode_xyz(pts)
    return model.apply(
        params, pe_xyz, pe_dir,
        expr if model.takes_expression else None,
        latent if model.takes_latent else None,
        dtype=dtype,
    )


def _fused_render_eligible(
    model, ro, z_all, pe_dir, expr, latent, settings: "RenderSettings"
) -> bool:
    """Static eligibility for the forward-only fused render kernel."""
    if not settings.fused_render or settings.fused == "off":
        return False
    if settings.radiance_field_noise_std > 0.0:
        return False
    from nerface_tpu.ops.pallas.fused_mlp import (
        _pick_rays_per_tile,
        fused_paper_mlp_available,
    )

    if not _fused_model_ok(model, settings.encode_xyz, pe_dir, expr, latent):
        return False
    tr = _pick_rays_per_tile(ro.shape[0], z_all.shape[-1])
    return fused_paper_mlp_available(ro.shape[0], tr)


def _direction_branch_input(
    rd: jnp.ndarray, near: jnp.ndarray, far: jnp.ndarray
) -> jnp.ndarray:
    """The reference's de-facto view-direction input: columns [-3:] of the
    8-float ray record = [rd_z, near, far] (`train_utils.py:14`)."""
    return jnp.stack(
        [rd[..., 2], jnp.broadcast_to(near[..., 0], rd.shape[:-1]),
         jnp.broadcast_to(far[..., 0], rd.shape[:-1])],
        axis=-1,
    )


def render_rays(
    model_coarse,
    model_fine,
    params_coarse,
    params_fine,
    ray_origins: jnp.ndarray,
    ray_directions: jnp.ndarray,
    settings: RenderSettings,
    key: Optional[jax.Array] = None,
    expressions: Optional[jnp.ndarray] = None,
    latent_code: Optional[jnp.ndarray] = None,
    background_prior: Optional[jnp.ndarray] = None,
    ray_directions_ablation: Optional[jnp.ndarray] = None,
    dtype=None,
    ray_index: Optional[jnp.ndarray] = None,
) -> Dict[str, Any]:
    """Render a batch of rays. Everything is static-shaped and jit-safe.

    ray_origins/ray_directions: (R, 3). background_prior: (R, 3) or None.
    Returns a dict with coarse/fine rgb/disp/acc maps, per-sample fine
    weights, the fine background weight column, and depth maps for the
    normals path.

    `ray_index` (global ray indices, default arange(R)) keys all random
    draws per-ray (see ops/sampling.py): render_rays over any partitioning
    of the ray axis — mesh shards, eval tiles — reproduces the
    single-device draws bit-exactly, provided callers pass each ray's
    GLOBAL index.
    """
    ro = ray_origins.reshape(-1, 3)
    rd = ray_directions.reshape(-1, 3)
    num_rays = ro.shape[0]  # after the flatten: (H, W, 3) inputs count H*W
    if ray_index is None:
        ray_index = jnp.arange(num_rays, dtype=jnp.int32)
    else:
        ray_index = ray_index.reshape(-1).astype(jnp.int32)

    if not settings.no_ndc:
        raise NotImplementedError(
            "NDC ray path is only used by the stock LLFF configs; "
            "use ops.rays.ndc_rays upstream."
        )

    near = jnp.full((num_rays, 1), settings.near, dtype=ro.dtype)
    far = jnp.full((num_rays, 1), settings.far, dtype=ro.dtype)

    if key is None:
        key = jax.random.PRNGKey(0)
    k_strat, k_noise_c, k_pdf, k_noise_f = jax.random.split(key, 4)

    # ---- coarse pass -------------------------------------------------------
    z_vals = stratified_zvals(
        k_strat, near, far, settings.num_coarse,
        lindisp=settings.lindisp, perturb=settings.perturb,
        ray_index=ray_index,
    )
    pe_dir = None
    if settings.use_viewdirs and settings.encode_dir is not None:
        dir_src = rd if ray_directions_ablation is None else (
            ray_directions_ablation.reshape(-1, 3)
        )
        pe_dir = settings.encode_dir(_direction_branch_input(dir_src, near, far))

    if _fused_render_eligible(
        model_coarse, ro, z_vals, pe_dir, expressions, latent_code, settings
    ):
        from nerface_tpu.ops.pallas.fused_mlp import fused_paper_render

        _cond, _dir_contrib, _small = _fused_conditioning(
            model_coarse, params_coarse, pe_dir, expressions, latent_code
        )
        fc = fused_paper_render(
            params_coarse, ro, rd, z_vals, _dir_contrib, _cond,
            background=background_prior,
            white_background=settings.white_background,
            num_encoding_fn_xyz=settings.encode_xyz.num_encoding_functions,
            log_sampling_xyz=settings.encode_xyz.log_sampling,
            out_weights=True,
            small=_small,
        )
        rgb_coarse, disp_coarse, acc_coarse = fc["rgb"], fc["disp"], fc["acc"]
        weights, depth_coarse = fc["weights"], fc["depth"]
    else:
        radiance_coarse = _apply_model(
            model_coarse, params_coarse, ro, rd, z_vals, settings.encode_xyz,
            pe_dir, expressions, latent_code, dtype, settings.fused,
        )
        radiance_coarse = inject_background(radiance_coarse, background_prior)

        rgb_coarse, disp_coarse, acc_coarse, weights, depth_coarse = (
            volume_render_radiance_field(
                radiance_coarse,
                z_vals,
                rd,
                radiance_field_noise_std=settings.radiance_field_noise_std,
                white_background=settings.white_background,
                background_prior=background_prior,
                noise_key=k_noise_c,
                return_depth=True,
                ray_index=ray_index,
            )
        )

    out: Dict[str, Any] = {
        "rgb_coarse": rgb_coarse,
        "disp_coarse": disp_coarse,
        "acc_coarse": acc_coarse,
        "depth_coarse": depth_coarse,
        "rgb_fine": None,
        "disp_fine": None,
        "acc_fine": None,
        "depth_fine": None,
    }

    if settings.num_fine > 0:
        if model_fine is None or params_fine is None:
            raise ValueError("num_fine > 0 requires a fine model")
        # ---- hierarchical resample ----------------------------------------
        z_mid = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
        z_samples = sample_pdf(
            k_pdf,
            z_mid,
            weights[..., 1:-1],
            settings.num_fine,
            det=(not settings.perturb),
            ray_index=ray_index,
        )
        z_all = merge_sorted_zvals(z_vals, z_samples)
        if _fused_render_eligible(
            model_fine, ro, z_all, pe_dir, expressions, latent_code, settings
        ):
            from nerface_tpu.ops.pallas.fused_mlp import fused_paper_render

            cond, dir_contrib, small = _fused_conditioning(
                model_fine, params_fine, pe_dir, expressions, latent_code
            )
            fr = fused_paper_render(
                params_fine, ro, rd, z_all, dir_contrib, cond,
                background=background_prior,
                white_background=settings.white_background,
                num_encoding_fn_xyz=settings.encode_xyz.num_encoding_functions,
                log_sampling_xyz=settings.encode_xyz.log_sampling,
                small=small,
            )
            out.update(
                rgb_fine=fr["rgb"], disp_fine=fr["disp"],
                acc_fine=fr["acc"], depth_fine=fr["depth"],
            )
            # full per-sample fine weights never leave this function's
            # consumers (only bg_weight does) — not materialized here
            out["weights"] = None
            out["bg_weight"] = fr["bg_weight"]
            return out

        radiance_fine = _apply_model(
            model_fine, params_fine, ro, rd, z_all, settings.encode_xyz,
            pe_dir, expressions, latent_code, dtype, settings.fused,
        )
        radiance_fine = inject_background(radiance_fine, background_prior)

        rgb_fine, disp_fine, acc_fine, weights, depth_fine = (
            volume_render_radiance_field(
                radiance_fine,
                z_all,
                rd,
                radiance_field_noise_std=settings.radiance_field_noise_std,
                white_background=settings.white_background,
                background_prior=background_prior,
                noise_key=k_noise_f,
                return_depth=True,
                ray_index=ray_index,
            )
        )
        out.update(
            rgb_fine=rgb_fine, disp_fine=disp_fine, acc_fine=acc_fine,
            depth_fine=depth_fine,
        )

    # Reference: final return value is weights[:, -1] of the *last* rendered
    # pass (`train_utils.py:150,162`) = background-sample weight per ray.
    out["weights"] = weights
    out["bg_weight"] = weights[..., -1]
    return out


def run_one_iter_of_nerf(
    height: int,
    width: int,
    model_coarse,
    model_fine,
    params_coarse,
    params_fine,
    ray_origins: jnp.ndarray,
    ray_directions: jnp.ndarray,
    settings: RenderSettings,
    key: Optional[jax.Array] = None,
    expressions: Optional[jnp.ndarray] = None,
    background_prior: Optional[jnp.ndarray] = None,
    latent_code: Optional[jnp.ndarray] = None,
    ray_directions_ablation: Optional[jnp.ndarray] = None,
    mode: str = "train",
    dtype=None,
    focal=None,
) -> Tuple:
    """API-compatible wrapper returning the reference's 7-tuple
    (rgb_coarse, disp_coarse, acc_coarse, rgb_fine, disp_fine, acc_fine,
    bg_weight), image-shaped in validation mode (`train_utils.py:270-290`).

    `height`/`width` shape the validation restore; ray tensors may be
    (H, W, 3) or flat (R, 3). With `settings.no_ndc=False` (LLFF), rays are
    projected to NDC and near/far become 0/1 (`train_utils.py:198-207`) —
    `focal` is required then.
    """
    img_shape = ray_directions.shape[:-1]
    if not settings.no_ndc:
        if focal is None:
            raise ValueError("NDC rendering requires `focal`")
        ray_origins, ray_directions = ndc_rays(
            height, width, focal, 1.0,
            ray_origins.reshape(-1, 3), ray_directions.reshape(-1, 3),
        )
        settings = dataclasses.replace(settings, no_ndc=True, near=0.0, far=1.0)
    out = render_rays(
        model_coarse,
        model_fine,
        params_coarse,
        params_fine,
        ray_origins.reshape(-1, 3),
        ray_directions.reshape(-1, 3),
        settings,
        key=key,
        expressions=expressions,
        latent_code=latent_code,
        background_prior=(
            background_prior.reshape(-1, 3) if background_prior is not None else None
        ),
        ray_directions_ablation=(
            ray_directions_ablation.reshape(-1, 3)
            if ray_directions_ablation is not None
            else None
        ),
        dtype=dtype,
    )
    results = [
        out["rgb_coarse"], out["disp_coarse"], out["acc_coarse"],
        out["rgb_fine"], out["disp_fine"], out["acc_fine"], out["bg_weight"],
    ]
    if mode == "validation":
        shapes = [
            img_shape + (3,), img_shape, img_shape,
            img_shape + (3,), img_shape, img_shape, img_shape,
        ]
        results = [
            r.reshape(s) if r is not None else None for r, s in zip(results, shapes)
        ]
    return tuple(results)
