"""Learning-rate schedule.

The reference updates the LR *after* each optimizer step
(`train_transformed_rays.py:393-400`): iteration 0 runs at `lr`, and
iteration k ≥ 1 runs at `lr · lr_decay_factor^((k-1) / (lr_decay·1000))`
(canonical values lr=5e-4, lr_decay=250, factor=0.1). Here the same curve
— including that one-step application offset — is an optax schedule
evaluated inside the jitted step (optax passes the 0-based pre-increment
step count).
"""

from __future__ import annotations

import jax.numpy as jnp


def exponential_lr(lr_init: float, lr_decay: float, lr_decay_factor: float = 0.1):
    num_decay_steps = lr_decay * 1000.0

    def schedule(step):
        # post-step application point: step k uses the LR set after k-1
        eff = jnp.maximum(jnp.asarray(step, jnp.float32) - 1.0, 0.0)
        return lr_init * (lr_decay_factor ** (eff / num_decay_steps))

    return schedule


def from_cfg(cfg):
    return exponential_lr(
        float(cfg.optimizer.lr),
        float(cfg.scheduler.lr_decay),
        float(cfg.scheduler.lr_decay_factor),
    )
