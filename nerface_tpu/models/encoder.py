"""Auxiliary modules: the image CNN encoder and the latent-code
discriminator probe.

Equivalents of `models.py:1098-1126` (`ImageEncoder`: Bx3x256x256 ->
Bx128x1x1 conv/pool stack feeding `ConditionalAutoEncoderNeRFModel`) and
`models.py:1233-1248` (`DiscriminatorModel`: latent -> expression
adversarial probe; instantiated nowhere in the reference train script but
part of the model surface).

Parameter names mirror the torch Sequential state_dict
(`cnn_layers.{0,3,6,9,12}.weight`, `model.{0,2,4}.weight`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from nerface_tpu.models.mlp import Params, add_linear, linear


def _conv_init(key, name, params, in_ch, out_ch, ksize):
    """torch.nn.Conv2d default init (kaiming_uniform a=sqrt(5))."""
    wkey, bkey = jax.random.split(key)
    fan_in = in_ch * ksize * ksize
    bound = 1.0 / np.sqrt(fan_in)
    params[name + ".weight"] = jax.random.uniform(
        wkey, (out_ch, in_ch, ksize, ksize), minval=-bound, maxval=bound
    )
    params[name + ".bias"] = jax.random.uniform(
        bkey, (out_ch,), minval=-bound, maxval=bound
    )


def _conv2d(params: Params, name: str, x: jnp.ndarray, stride: int, padding: int):
    """NCHW conv with torch-layout weights (out, in, kh, kw)."""
    w = params[name + ".weight"]
    b = params[name + ".bias"]
    y = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return y + b[None, :, None, None]


def _maxpool2(x: jnp.ndarray):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, 2, 2), (1, 1, 2, 2), "VALID"
    )


class ImageEncoder:
    """Bx3x256x256 -> Bx128x1x1 (`models.py:1098-1126`)."""

    # (sequential index, in_ch, out_ch, ksize, stride, padding, pool_after)
    _convs = [
        (0, 3, 8, 4, 2, 1, True),
        (3, 8, 16, 4, 2, 1, True),
        (6, 16, 32, 4, 2, 1, True),
        (9, 32, 64, 4, 2, 1, True),
        (12, 64, 128, 1, 1, 0, False),
    ]

    def init(self, key) -> Params:
        params: Params = {}
        keys = jax.random.split(key, len(self._convs))
        for k, (idx, ci, co, ks, _, _, _) in zip(keys, self._convs):
            _conv_init(k, f"cnn_layers.{idx}", params, ci, co, ks)
        return params

    def apply(self, params: Params, x: jnp.ndarray) -> jnp.ndarray:
        for idx, _, _, _, stride, pad, pool in self._convs[:-1]:
            x = jax.nn.relu(_conv2d(params, f"cnn_layers.{idx}", x, stride, pad))
            if pool:
                x = _maxpool2(x)
        idx, _, _, _, stride, pad, _ = self._convs[-1]
        x = _conv2d(params, f"cnn_layers.{idx}", x, stride, pad)
        return jnp.tanh(x)


class DiscriminatorModel:
    """latent(32) -> expression(76) probe (`models.py:1233-1248`)."""

    def __init__(self, dim_latent: int = 32, dim_expressions: int = 76):
        self.dim_latent = dim_latent
        self.dim_expressions = dim_expressions

    def init(self, key) -> Params:
        params: Params = {}
        k = jax.random.split(key, 3)
        add_linear(params, k[0], "model.0", self.dim_latent, self.dim_latent * 2)
        add_linear(params, k[1], "model.2", self.dim_latent * 2, self.dim_latent * 2)
        add_linear(params, k[2], "model.4", self.dim_latent * 2, self.dim_expressions)
        return params

    def apply(self, params: Params, x: jnp.ndarray) -> jnp.ndarray:
        x = jax.nn.leaky_relu(linear(params, "model.0", x), negative_slope=0.2)
        x = jax.nn.leaky_relu(linear(params, "model.2", x), negative_slope=0.2)
        return jnp.tanh(linear(params, "model.4", x))
