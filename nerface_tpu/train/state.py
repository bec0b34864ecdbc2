"""Training state: one pytree carrying everything the jitted step mutates.

Logical schema mirrors the reference checkpoint dict
(`train_transformed_rays.py:554-572`): coarse/fine model params, the
optimizer state, the (n_train, 32) latent-code table, and the background
image (trainable or fixed) — plus the step counter.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import optax

from nerface_tpu.config.flags import FeatureFlags

LATENT_DIM = 32


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    step: jnp.ndarray  # scalar int32
    params: Dict[str, Any]  # {"coarse": ..., "fine": ... or None,
    #                          "latent_codes": (n_train, 32) or None,
    #                          "background": (H, W, 3) or None}
    opt_state: Any
    fixed_background: Optional[jnp.ndarray]  # (H, W, 3) non-trainable or None


def build_optimizer(cfg) -> optax.GradientTransformation:
    """Adam over all trainable leaves with the reference's exponential LR.

    `cfg.optimizer.type` is honored for the optax equivalents of the torch
    optimizers the reference can name (Adam/AdamW/SGD/RMSprop).
    """
    from nerface_tpu.train.optim import flat_adam
    from nerface_tpu.train.schedule import from_cfg as sched_from_cfg

    schedule = sched_from_cfg(cfg)
    opt_type = str(cfg.optimizer.type).lower()
    table = {
        # Measured (one-pass fused train step, v5e): flat-buffer Adam
        # (train/optim.py) times identically to per-tensor optax.adam —
        # the per-tensor launches fully overlap the Pallas train kernels —
        # and trips a donation aliasing bug at production batch size on
        # the tunneled backend. Per-tensor Adam stays the default;
        # "flat_adam" remains available by name.
        "adam": optax.adam,
        "flat_adam": flat_adam,
        "adamw": optax.adamw,
        "sgd": optax.sgd,
        "rmsprop": optax.rmsprop,
    }
    if opt_type not in table:
        raise ValueError(f"unsupported optimizer type: {cfg.optimizer.type}")
    return table[opt_type](learning_rate=schedule)


def create_train_state(
    key: jax.Array,
    model_coarse,
    model_fine,
    cfg,
    flags: FeatureFlags,
    n_train: int,
    background: Optional[jnp.ndarray] = None,
) -> tuple:
    """Initialize params/optimizer. Returns (state, optimizer).

    Latent codes start at zeros(n_train, 32)
    (`train_transformed_rays.py:181-186`); a trainable background starts
    from the provided image (mean of train frames upstream) while a fixed
    background is carried outside the trainable tree.
    """
    kc, kf = jax.random.split(key)
    params: Dict[str, Any] = {"coarse": model_coarse.init(kc)}
    params["fine"] = model_fine.init(kf) if model_fine is not None else None

    if flags.train_latent_codes and not flags.disable_latent_codes:
        params["latent_codes"] = jnp.zeros((n_train, LATENT_DIM), jnp.float32)
    else:
        params["latent_codes"] = None

    fixed_bg = None
    if flags.train_background and background is not None:
        params["background"] = jnp.asarray(background)
    else:
        params["background"] = None
        if flags.fixed_background and background is not None:
            fixed_bg = jnp.asarray(background)

    optimizer = build_optimizer(cfg)
    opt_state = optimizer.init(params)
    state = TrainState(
        step=jnp.asarray(0, jnp.int32),
        params=params,
        opt_state=opt_state,
        fixed_background=fixed_bg,
    )
    return state, optimizer
