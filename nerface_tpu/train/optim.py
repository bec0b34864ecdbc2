"""Flat-buffer Adam: the whole moment update as a handful of fused ops.

The reference steps `torch.optim.Adam` over ~50 parameter tensors
(`train_transformed_rays.py:188-200`). A per-tensor Adam on TPU costs ~100
small kernel launches per step (~1.4 ms measured on v5e — comparable to
10% of the fused train step). Here the moments live as single flat (N,)
buffers; update() ravels the gradient tree once (one concat), runs the
Adam arithmetic on three flat arrays (a few large fused elementwise
kernels), and slices the update tree back out. Math is bit-identical to
`optax.adam` (bias-corrected moments, eps outside the sqrt, matching
torch.optim.Adam's `exp_avg / (sqrt(exp_avg_sq) + eps)` layout).

State is a `FlatAdamState(count, mu, nu)` with FLAT mu/nu;
`flat_moments_to_tree` / `tree_to_flat_moments` convert to/from the
params-shaped tree for the torch checkpoint interop
(`train/checkpoint.py`), which needs per-tensor `exp_avg`/`exp_avg_sq`.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Union

import jax
import jax.numpy as jnp
import optax
from jax.flatten_util import ravel_pytree


class FlatAdamState(NamedTuple):
    count: jnp.ndarray  # scalar int32
    mu: jnp.ndarray     # (N,) first moment, flat
    nu: jnp.ndarray     # (N,) second moment, flat


def flat_adam(
    learning_rate: Union[float, Callable],
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
) -> optax.GradientTransformation:
    """optax-compatible Adam over a single flat buffer."""

    def init_fn(params):
        flat, _ = ravel_pytree(params)
        zeros = jnp.zeros_like(flat)
        return FlatAdamState(jnp.zeros((), jnp.int32), zeros, zeros)

    def update_fn(updates, state, params=None):
        del params
        g, unravel = ravel_pytree(updates)
        count = state.count + 1
        mu = b1 * state.mu + (1.0 - b1) * g
        nu = b2 * state.nu + (1.0 - b2) * (g * g)
        c = count.astype(jnp.float32)
        mu_hat = mu / (1.0 - jnp.power(b1, c))
        nu_hat = nu / (1.0 - jnp.power(b2, c))
        # schedules see the PRE-increment count, like optax's
        # scale_by_schedule (0-based step index)
        lr = (
            learning_rate(state.count)
            if callable(learning_rate) else learning_rate
        )
        upd = (-lr) * mu_hat / (jnp.sqrt(nu_hat) + eps)
        return unravel(upd), FlatAdamState(count, mu, nu)

    return optax.GradientTransformation(init_fn, update_fn)


def flat_adam_donation_unsafe(opt_state) -> bool:
    """True when donating this optimizer state into the jitted step is
    known-broken: FlatAdamState's big flat moment buffers trip an XLA
    donation-aliasing RUNTIME failure on the tunneled `axon` TPU backend
    at production batch size (BENCH_NOTES.md round-2 "Measured no-ops";
    minimal repro: tools/perf/flat_adam_donation_repro.py).  The train
    loop consults this to fall back to non-donating dispatch — flat_adam
    times identically to per-tensor Adam anyway, so nothing is lost."""
    leaves = jax.tree_util.tree_flatten(
        opt_state, is_leaf=lambda x: isinstance(x, FlatAdamState)
    )[0]
    has_flat = any(isinstance(leaf, FlatAdamState) for leaf in leaves)
    return has_flat and jax.default_backend() == "axon"


def flat_moments_to_tree(state: FlatAdamState, params_template):
    """(mu_tree, nu_tree) shaped like `params_template` — for the torch
    optimizer-state export."""
    _, unravel = ravel_pytree(params_template)
    return unravel(state.mu), unravel(state.nu)


def tree_to_flat_moments(
    state: FlatAdamState, mu_tree, nu_tree, count
) -> FlatAdamState:
    """Rebuild a FlatAdamState from params-shaped moment trees — for the
    torch optimizer-state import."""
    mu, _ = ravel_pytree(mu_tree)
    nu, _ = ravel_pytree(nu_tree)
    return FlatAdamState(
        jnp.asarray(count, dtype=jnp.asarray(state.count).dtype), mu, nu
    )
