"""Learning-rate schedule.

The reference applies `lr · lr_decay_factor^(i / (lr_decay·1000))` to every
param group every step (`train_transformed_rays.py:394-400`; canonical
values lr=5e-4, lr_decay=250, factor=0.1). Here the same curve is an optax
schedule evaluated inside the jitted step.
"""

from __future__ import annotations



def exponential_lr(lr_init: float, lr_decay: float, lr_decay_factor: float = 0.1):
    num_decay_steps = lr_decay * 1000.0

    def schedule(step):
        return lr_init * (lr_decay_factor ** (step / num_decay_steps))

    return schedule


def from_cfg(cfg):
    return exponential_lr(
        float(cfg.optimizer.lr),
        float(cfg.scheduler.lr_decay),
        float(cfg.scheduler.lr_decay_factor),
    )
