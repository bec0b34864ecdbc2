"""Hand-assembled value-and-grad for the fused one-pass training kernel.

`jax.value_and_grad` over the XLA render path is the parity reference
(`train/step.py`); this module is the production fast path for the flagship
`ConditionalBlendshapePaperNeRFModel`. The loss cotangent is formed inside
the training kernel (`ops/pallas/fused_train.py`), which returns gradients
w.r.t. its kernel-layout inputs; here we

1. run `jax.vjp` over `prefold_paper_params` (the differentiable f32 map
   from the real parameter tree — torch-layout weights, latent-code table,
   trainable background — to the kernel bundle),
2. drive both passes (coarse → hierarchical resample → fine) with exactly
   the pipeline's RNG schedule (same key splits, same per-ray fold_in
   draws — see `render/pipeline.py:272` and `ops/sampling.py`), and
3. feed the kernel's f32 gradients through the pullback, adding the
   latent-regularizer gradient via `jax.vjp(safe_norm, ·)`.

Loss semantics identical to `train/step.py:_compute_losses`
(`train_transformed_rays.py:336-400`): coarse+fine MSE, latent regularizer
×10, supervised background term on the fine background weight. Gradient
parity vs `jax.grad` of the XLA path is pinned by tests/test_fused_train.py.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from nerface_tpu.config.flags import FeatureFlags
from nerface_tpu.ops.math import mse2psnr_jnp
from nerface_tpu.ops.safe import safe_norm
from nerface_tpu.ops.sampling import (
    merge_sorted_zvals,
    per_ray_normal,
    sample_pdf,
    stratified_zvals,
)
from nerface_tpu.render.pipeline import RenderSettings, _direction_branch_input


def fused_train_eligible(
    model_coarse, model_fine, settings: RenderSettings, flags: FeatureFlags,
    num_rays: int, dtype,
) -> bool:
    """Trace-time check: can this (models, settings, flags, batch shape)
    train through the one-pass fused kernel with identical semantics?"""
    from nerface_tpu.ops.pallas.fused_train import fused_train_available
    from nerface_tpu.render.pipeline import _fused_variant

    if settings.fused == "off":
        return False
    if not (settings.fused == "on" or (settings.fused == "auto" and dtype == jnp.bfloat16)):
        return False
    small_c = _fused_variant(model_coarse)
    small_f = _fused_variant(model_fine)
    if small_c is None or small_c != small_f:
        return False
    if settings.num_fine <= 0 or not settings.no_ndc:
        return False
    if not settings.use_viewdirs or settings.encode_dir is None:
        return False
    if not settings.encode_xyz.include_input:
        return False
    for m in (model_coarse, model_fine):
        if m.dim_xyz != 3 + 6 * settings.encode_xyz.num_encoding_functions:
            return False
        if small_c and getattr(m, "dim_expression", 0) != 76:
            return False
    # latent vector must exist (from the table or the zeros ablation)
    if not (flags.train_latent_codes or flags.disable_latent_codes):
        return False
    return fused_train_available(num_rays, settings.num_coarse, settings.num_fine)


def fused_value_and_grad(
    params: Dict[str, Any],
    batch: Dict[str, jnp.ndarray],
    key: jax.Array,
    model_coarse,
    model_fine,
    settings: RenderSettings,
    flags: FeatureFlags,
    fixed_background: Optional[jnp.ndarray],
):
    """Drop-in for `jax.value_and_grad(loss_fn, has_aux=True)`: returns
    ((total, metrics), grads) with grads matching the `params` tree."""
    from nerface_tpu.ops.pallas.fused_train import (
        fused_train_pass,
        prefold_paper_params,
    )

    ro = batch["ray_origins"].reshape(-1, 3)
    rd = batch["ray_directions"].reshape(-1, 3)
    num_rays = ro.shape[0]
    ray_index = batch["ray_index"].reshape(-1).astype(jnp.int32)
    target = batch["target_rgb"][..., :3]

    expression = batch["expression"]
    if flags.disable_expressions:
        expression = jnp.zeros_like(expression)

    train_latent = flags.train_latent_codes and not flags.disable_latent_codes
    train_bg = bool(flags.train_background) and params.get("background") is not None
    sup_bg = bool(flags.supervised_train_background)

    near = jnp.full((num_rays, 1), settings.near, dtype=ro.dtype)
    far = jnp.full((num_rays, 1), settings.far, dtype=ro.dtype)
    k_strat, k_noise_c, k_pdf, k_noise_f = jax.random.split(key, 4)

    z_vals = stratified_zvals(
        k_strat, near, far, settings.num_coarse,
        lindisp=settings.lindisp, perturb=settings.perturb,
        ray_index=ray_index,
    )
    pe_dir = settings.encode_dir(_direction_branch_input(rd, near, far))

    L = settings.encode_xyz.num_encoding_functions
    std = float(settings.radiance_field_noise_std)
    noise_c = (
        per_ray_normal(k_noise_c, ray_index, settings.num_coarse)
        if std > 0.0 else None
    )

    # --- differentiable prefold: params tree -> kernel bundles --------------
    from nerface_tpu.render.pipeline import _fused_variant

    small = bool(_fused_variant(model_coarse))
    # smaller variant: expression block starts after the DECLARED dir width
    dir_off = (256 + model_coarse.dim_dir) if small else 0

    def make_bundles(p):
        if train_latent:
            latent = p["latent_codes"][batch["latent_index"]]
        else:  # disable_latent_codes ablation: constant zeros
            latent = jnp.zeros((32,), jnp.float32)
        cond = jnp.concatenate([expression * (1.0 / 3.0), latent])
        bc = prefold_paper_params(
            p["coarse"], cond, pe_dir, L, small=small, dir_expr_offset=dir_off
        )
        bf = prefold_paper_params(
            p["fine"], cond, pe_dir, L, small=small, dir_expr_offset=dir_off
        )
        bgp = None
        if train_bg:
            bgp = p["background"].reshape(-1, 3)[batch["pixel_indices"]]
        return bc, bf, bgp, latent

    (bc, bf, bgp, latent), pullback = jax.vjp(make_bundles, params)

    background_prior = bgp
    if background_prior is None and flags.fixed_background:
        if "background_rgb" in batch:
            background_prior = batch["background_rgb"]
        elif fixed_background is not None:
            background_prior = fixed_background.reshape(-1, 3)[
                batch["pixel_indices"]
            ]

    loss_scale = 2.0 / (3.0 * num_rays)
    common = dict(
        noise_std=std,
        white_background=settings.white_background,
        loss_scale=loss_scale,
        num_encoding_fn_xyz=L,
        log_sampling_xyz=settings.encode_xyz.log_sampling,
        train_bg=train_bg,
        small=small,
    )

    # --- coarse pass ---------------------------------------------------------
    outs_c, g_bc, g_bg_c = fused_train_pass(
        bc, ro, rd, z_vals, target,
        background=background_prior, noise=noise_c, sup_bg_scale=0.0,
        **common,
    )

    # --- hierarchical resample (stop-gradient, same draws as pipeline) ------
    z_mid = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
    z_samples = sample_pdf(
        k_pdf, z_mid, outs_c["weights"][..., 1:-1], settings.num_fine,
        det=(not settings.perturb), ray_index=ray_index,
    )
    z_all = merge_sorted_zvals(z_vals, z_samples)

    s_all = settings.num_coarse + settings.num_fine
    noise_f = (
        per_ray_normal(k_noise_f, ray_index, s_all) if std > 0.0 else None
    )

    # --- fine pass ------------------------------------------------------------
    sup_scale = (0.001 / num_rays) if (sup_bg and background_prior is not None) else 0.0
    outs_f, g_bf, g_bg_f = fused_train_pass(
        bf, ro, rd, z_all, target,
        background=background_prior, noise=noise_f, sup_bg_scale=sup_scale,
        **common,
    )

    # --- losses / metrics (formulas identical to train/step.py) -------------
    coarse_loss = jnp.mean((outs_c["rgb"] - target) ** 2)
    fine_loss = jnp.mean((outs_f["rgb"] - target) ** 2)
    loss = coarse_loss + fine_loss
    psnr = mse2psnr_jnp(loss)

    latent_code_loss = jnp.zeros(())
    latent_cot = jnp.zeros_like(latent)
    if train_latent:
        reg_val, reg_vjp = jax.vjp(safe_norm, latent)
        latent_code_loss = reg_val * 0.0005
        if flags.regularize_latent_codes:
            # total adds latent_code_loss × 10 → d latent = 0.005 · ∂‖l‖
            latent_cot = reg_vjp(jnp.asarray(0.005, latent.dtype))[0]

    background_loss = jnp.zeros(())
    bg_weight = outs_f["weights"][..., -1]
    if sup_bg and background_prior is not None:
        per_ray = jnp.sum((background_prior[..., :3] - target) ** 2, axis=-1)
        background_loss = jnp.mean(per_ray * bg_weight) * 0.001

    total = loss
    if flags.regularize_latent_codes:
        total = total + latent_code_loss * 10.0
    if sup_bg:
        total = total + background_loss

    # --- pull kernel gradients back to the parameter tree -------------------
    g_bg = None
    if train_bg:
        g_bg = g_bg_c + g_bg_f
    if not train_latent:
        latent_cot = jnp.zeros((32,), jnp.float32)
    grads = pullback((g_bc, g_bf, g_bg, latent_cot))[0]

    metrics = {
        "loss": loss,
        "coarse_loss": coarse_loss,
        "fine_loss": fine_loss,
        "psnr": psnr,
        "latent_code_loss": latent_code_loss,
        "background_loss": background_loss,
    }
    return (total, metrics), grads
