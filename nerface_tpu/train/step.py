"""The jitted training step.

Everything between the reference's `run_one_iter_of_nerf` call and
`optimizer.step()` (`train_transformed_rays.py:336-400`) — forward render,
losses, backward, Adam update, LR schedule — compiled into one XLA program
with device-side RNG. Loss semantics reproduced exactly:

* coarse MSE + fine MSE against target RGB (:355-362,382);
* latent regularizer ‖code‖·0.0005, added ×10 when enabled (:370-372,386);
* optional supervised background loss: per-ray squared-error summed over
  RGB, weighted by the fine background weight, mean ×0.001 (:375-380);
* PSNR computed from (coarse+fine) MSE *before* regularizers (:383).

Data-parallel scale-out: `make_train_step(..., mesh=...)` shards the ray
axis of each batch across devices with shard_map; parameter/optimizer
state is replicated and gradients are psum'd over the mesh — XLA emits the
all-reduce over ICI.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import optax

from nerface_tpu.config.flags import FeatureFlags
from nerface_tpu.ops.math import mse2psnr_jnp
from nerface_tpu.ops.safe import safe_norm
from nerface_tpu.render.pipeline import RenderSettings, render_rays
from nerface_tpu.train.state import TrainState


def _compute_losses(
    params: Dict[str, Any],
    batch: Dict[str, jnp.ndarray],
    key: jax.Array,
    model_coarse,
    model_fine,
    settings: RenderSettings,
    flags: FeatureFlags,
    fixed_background: Optional[jnp.ndarray],
    dtype=None,
):
    expression = batch["expression"]
    if flags.disable_expressions:
        expression = jnp.zeros_like(expression)

    latent_code = None
    if flags.train_latent_codes and not flags.disable_latent_codes:
        latent_code = params["latent_codes"][batch["latent_index"]]
    elif flags.disable_latent_codes:
        latent_code = jnp.zeros((32,), jnp.float32)

    background_prior = None
    if flags.train_background and params["background"] is not None:
        bg_flat = params["background"].reshape(-1, 3)
        background_prior = bg_flat[batch["pixel_indices"]]
    elif flags.fixed_background:
        if "background_rgb" in batch:
            background_prior = batch["background_rgb"]
        elif fixed_background is not None:
            bg_flat = fixed_background.reshape(-1, 3)
            background_prior = bg_flat[batch["pixel_indices"]]

    out = render_rays(
        model_coarse,
        model_fine,
        params["coarse"],
        params["fine"],
        batch["ray_origins"],
        batch["ray_directions"],
        settings,
        key=key,
        expressions=expression,
        latent_code=latent_code,
        background_prior=background_prior,
        dtype=dtype,
        ray_index=batch.get("ray_index"),
    )

    target = batch["target_rgb"][..., :3]
    coarse_loss = jnp.mean((out["rgb_coarse"][..., :3] - target) ** 2)
    fine_loss = (
        jnp.mean((out["rgb_fine"][..., :3] - target) ** 2)
        if out["rgb_fine"] is not None
        else None
    )
    loss = coarse_loss + (fine_loss if fine_loss is not None else 0.0)
    psnr = mse2psnr_jnp(loss)

    latent_code_loss = jnp.zeros(())
    if flags.train_latent_codes and not flags.disable_latent_codes:
        # safe_norm: torch's subgradient-0-at-origin convention — the codes
        # start at exactly zero (`train_transformed_rays.py:181-186`).
        latent_code_loss = safe_norm(latent_code) * 0.0005

    background_loss = jnp.zeros(())
    if flags.supervised_train_background and background_prior is not None:
        per_ray = jnp.sum((background_prior[..., :3] - target) ** 2, axis=-1)
        background_loss = jnp.mean(per_ray * out["bg_weight"]) * 0.001

    total = loss
    if flags.regularize_latent_codes:
        total = total + latent_code_loss * 10.0
    if flags.supervised_train_background:
        total = total + background_loss

    metrics = {
        "loss": loss,
        "coarse_loss": coarse_loss,
        "fine_loss": fine_loss if fine_loss is not None else jnp.zeros(()),
        "psnr": psnr,
        "latent_code_loss": latent_code_loss,
        "background_loss": background_loss,
    }
    return total, metrics


def _build_step_fn(
    model_coarse,
    model_fine,
    settings: RenderSettings,
    flags: FeatureFlags,
    optimizer: optax.GradientTransformation,
    mesh: Optional[jax.sharding.Mesh] = None,
    data_axis: str = "data",
    dtype=None,
):
    """The un-jitted `step(state, batch, key) -> (state, metrics)` — shared
    by the per-step jit (`make_train_step`) and the K-steps-per-dispatch
    scan (`make_train_megastep`)."""

    def loss_fn(params, batch, key, fixed_background):
        return _compute_losses(
            params, batch, key, model_coarse, model_fine, settings, flags,
            fixed_background, dtype=dtype,
        )

    def value_and_grad(params, batch, key, fixed_background):
        """Gradients via the one-pass fused training kernel when eligible
        (flagship model, fused on/auto+bf16 — see train/fused.py), else
        jax.grad over the XLA parity path. Both see identical RNG draws."""
        from nerface_tpu.train.fused import (
            fused_train_eligible,
            fused_value_and_grad,
        )

        if fused_train_eligible(
            model_coarse, model_fine, settings, flags,
            batch["ray_origins"].shape[0], dtype,
        ):
            return fused_value_and_grad(
                params, batch, key, model_coarse, model_fine, settings,
                flags, fixed_background,
            )
        return jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, key, fixed_background
        )

    def step_fn(state: TrainState, batch: Dict[str, jnp.ndarray], key: jax.Array):
        # Global per-ray indices key all random draws (stratification, pdf
        # samples, sigma noise) — see ops/sampling.py. Sharding slices this
        # arange, so each shard draws with its rays' GLOBAL indices and an
        # N-device step reproduces the single-device step bit-exactly.
        if "ray_index" not in batch:
            batch = dict(batch)
            batch["ray_index"] = jnp.arange(
                batch["ray_origins"].shape[0], dtype=jnp.int32
            )
        if mesh is not None:
            from jax.sharding import PartitionSpec as P
            from jax import shard_map

            from nerface_tpu.train.distributed import RAY_KEYS as ray_keys

            in_specs = (
                {k: P(data_axis) if k in ray_keys else P() for k in batch},
            )

            def sharded_grads(b):
                (total, metrics), grads = value_and_grad(
                    state.params, b, key, state.fixed_background
                )
                grads = jax.lax.pmean(grads, data_axis)
                metrics = jax.lax.pmean(metrics, data_axis)
                # psnr is -10·log10(mse): mean-of-log != log-of-mean, so
                # recompute it from the pmean'd loss to match what a
                # single device computes over the full batch
                metrics["psnr"] = mse2psnr_jnp(metrics["loss"])
                total = jax.lax.pmean(total, data_axis)
                return total, metrics, grads

            total, metrics, grads = shard_map(
                sharded_grads,
                mesh=mesh,
                in_specs=in_specs,
                out_specs=(P(), P(), P()),
                check_vma=False,
            )(batch)
        else:
            (total, metrics), grads = value_and_grad(
                state.params, batch, key, state.fixed_background
            )

        updates, new_opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            fixed_background=state.fixed_background,
        )
        metrics["total_loss"] = total
        return new_state, metrics

    return step_fn


def make_train_step(
    model_coarse,
    model_fine,
    settings: RenderSettings,
    flags: FeatureFlags,
    optimizer: optax.GradientTransformation,
    mesh: Optional[jax.sharding.Mesh] = None,
    data_axis: str = "data",
    dtype=None,
    donate: bool = True,
):
    """Build the jitted `step(state, batch, key) -> (state, metrics)`.

    With a mesh, the batch's ray axis is sharded over `data_axis`
    (parameters replicated, gradients psum'd); without one, single-device.
    """
    step_fn = _build_step_fn(
        model_coarse, model_fine, settings, flags, optimizer,
        mesh=mesh, data_axis=data_axis, dtype=dtype,
    )
    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def make_train_megastep(
    model_coarse,
    model_fine,
    settings: RenderSettings,
    flags: FeatureFlags,
    optimizer: optax.GradientTransformation,
    mesh: Optional[jax.sharding.Mesh] = None,
    data_axis: str = "data",
    dtype=None,
    donate: bool = True,
    sample_fn=None,
):
    """K-steps-per-dispatch execution of the SAME per-step math, as one
    `lax.scan` — the production fix for per-step host costs on a tunneled
    backend (BENCH_NOTES.md round 4: one dispatch + one host→device upload
    per K steps instead of per step).

    Bit-parity contract (pinned by tests/test_megastep.py): step i inside
    the scan draws `fold_in(base_key, i)` — exactly the key the sequential
    loop (`train/loop.py`) folds — so a K-window run reproduces K
    sequential `make_train_step` calls bit-for-bit.

    Without `sample_fn`:
        mega(state, batches, base_key, start_iter) -> (state, metrics)
    where `batches` is a host-stacked batch pytree with leading axis K
    (scan slices it), `start_iter` is a traced int32 scalar (no recompile
    across windows), and `metrics` carries every step's scalars stacked on
    a leading K axis (row k = step start_iter+k; the loop logs row K-1 at
    cadence boundaries without pulling intermediate rows).

    With `sample_fn` (an UN-jitted device-side sampler, e.g.
    `DeviceRayFeed.unjit_sampler()`):
        mega(state, base_key, feed_base, start_iter, n_steps) -> (state, metrics)
    draws batch k inside the scan with `fold_in(feed_base, start_iter+k)`
    (the device feed's counter-keyed stream) — zero per-step host work or
    transfer. `n_steps` is static (one compile per distinct window size).
    """
    step_fn = _build_step_fn(
        model_coarse, model_fine, settings, flags, optimizer,
        mesh=mesh, data_axis=data_axis, dtype=dtype,
    )

    if sample_fn is None:

        def mega(state, batches, base_key, start_iter):
            n = jax.tree.leaves(batches)[0].shape[0]

            def body(st, xs):
                k, b = xs
                sub = jax.random.fold_in(base_key, start_iter + k)
                return step_fn(st, b, sub)

            return jax.lax.scan(
                body, state, (jnp.arange(n, dtype=jnp.int32), batches)
            )

        return jax.jit(mega, donate_argnums=(0,) if donate else ())

    def mega_dev(state, base_key, feed_base, start_iter, n_steps):
        def body(st, k):
            batch = sample_fn(jax.random.fold_in(feed_base, start_iter + k))
            sub = jax.random.fold_in(base_key, start_iter + k)
            return step_fn(st, batch, sub)

        return jax.lax.scan(
            body, state, jnp.arange(n_steps, dtype=jnp.int32)
        )

    return jax.jit(
        mega_dev, static_argnums=(4,), donate_argnums=(0,) if donate else ()
    )
