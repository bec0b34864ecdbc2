"""Frequency positional encoding.

Behavioral equivalent of `nerf_helpers.py:195-249` (`positional_encoding`,
`get_embedding_function`): optional input passthrough, log- or
linear-spaced frequency bands, interleaved sin/cos per band.

TPU note: the encoding is laid out band-major ([x, sin(f0 x), cos(f0 x),
sin(f1 x), ...], matching the reference's concat order exactly) and computed
as one fused broadcast-multiply + sin/cos over a static (num_bands,) vector,
which XLA fuses into the consuming matmul's producer. Output feature dim is
static: D * (include_input + 2 * num_encoding_functions).
"""

from __future__ import annotations

import functools
from typing import Callable

import jax.numpy as jnp
import numpy as np


def _frequency_bands(num_encoding_functions: int, log_sampling: bool) -> np.ndarray:
    if log_sampling:
        return 2.0 ** np.linspace(
            0.0, num_encoding_functions - 1, num_encoding_functions, dtype=np.float32
        )
    return np.linspace(
        2.0 ** 0.0,
        2.0 ** (num_encoding_functions - 1),
        num_encoding_functions,
        dtype=np.float32,
    )


def positional_encoding(
    tensor: jnp.ndarray,
    num_encoding_functions: int = 6,
    include_input: bool = True,
    log_sampling: bool = True,
) -> jnp.ndarray:
    """Encode `tensor` (..., D) -> (..., D * (include_input + 2*N)).

    Concat order matches the reference: [input?, sin(f0·x), cos(f0·x),
    sin(f1·x), cos(f1·x), ...] where each term is the full D-dim vector.
    """
    if num_encoding_functions == 0:
        return tensor if include_input else tensor[..., :0]
    bands = jnp.asarray(_frequency_bands(num_encoding_functions, log_sampling), tensor.dtype)
    # (..., 1, D) * (N, 1) -> (..., N, D)
    scaled = tensor[..., None, :] * bands[:, None]
    sin = jnp.sin(scaled)
    cos = jnp.cos(scaled)
    # Interleave per band: (..., N, 2, D) -> (..., N*2*D)
    enc = jnp.stack([sin, cos], axis=-2)
    enc = enc.reshape(*tensor.shape[:-1], 2 * num_encoding_functions * tensor.shape[-1])
    if include_input:
        return jnp.concatenate([tensor, enc], axis=-1)
    return enc


def encoding_dim(input_dim: int, num_encoding_functions: int, include_input: bool) -> int:
    """Static feature size of `positional_encoding` output."""
    if num_encoding_functions == 0:
        return input_dim if include_input else 0
    return input_dim * ((1 if include_input else 0) + 2 * num_encoding_functions)


def get_embedding_function(
    num_encoding_functions: int = 6,
    include_input: bool = True,
    log_sampling: bool = True,
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Factory mirroring `nerf_helpers.py:242-249`."""
    return functools.partial(
        positional_encoding,
        num_encoding_functions=num_encoding_functions,
        include_input=include_input,
        log_sampling=log_sampling,
    )
