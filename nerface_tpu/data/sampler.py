"""Face-bbox importance ray sampling.

Equivalent of the reference's probability maps + per-step categorical draw
(`train_transformed_rays.py:229-239,320-322`): per train frame, probability
mass p=0.9 spread uniformly inside the head bbox and 0.1 outside,
normalized over all H·W pixels; each step draws `num_rays` pixels *without
replacement* from that distribution.

The reference uses `np.random.choice(..., replace=False, p=...)`, whose
sequential algorithm is O(n·k) and a real per-step host cost at 262k
pixels. We draw via Gumbel top-k instead: adding i.i.d. Gumbel noise to
log-probabilities and taking the top k is distributionally identical to
successive sampling without replacement proportional to p (the
Plackett–Luce construction), and is a vectorized O(n) + argpartition.
A device-side jit variant is provided for fully on-device feeds.
"""

from __future__ import annotations

import numpy as np


def build_importance_maps(
    bboxes: np.ndarray, H: int, W: int, indices: np.ndarray, p: float = 0.9
) -> np.ndarray:
    """(len(indices), H*W) float64 probability maps (one per train frame)."""
    maps = np.empty((len(indices), H * W), np.float64)
    for row, i in enumerate(indices):
        h0, h1, w0, w1 = [int(v) for v in bboxes[i]]
        probs = np.full((H, W), 1.0 - p)
        probs[h0:h1, w0:w1] = p
        probs /= probs.sum()
        maps[row] = probs.reshape(-1)
    return maps


def sample_ray_indices(
    rng: np.random.RandomState,
    prob_map: np.ndarray,
    num_rays: int,
) -> np.ndarray:
    """Draw `num_rays` pixel indices without replacement ~ prob_map
    (Gumbel top-k; distributionally equal to np.random.choice w/o
    replacement with p=prob_map)."""
    # log p with -inf on zero-mass pixels
    with np.errstate(divide="ignore"):
        logp = np.log(prob_map)
    gumbel = -np.log(-np.log(rng.random_sample(prob_map.shape)))
    keys = logp + gumbel
    idx = np.argpartition(keys, -num_rays)[-num_rays:]
    return idx


def sample_ray_indices_device(key, prob_map, num_rays: int):
    """Device-side jit-safe variant (jax.random.gumbel + lax.top_k)."""
    import jax
    import jax.numpy as jnp

    logp = jnp.log(prob_map)
    g = jax.random.gumbel(key, prob_map.shape, dtype=prob_map.dtype)
    _, idx = jax.lax.top_k(logp + g, num_rays)
    return idx
