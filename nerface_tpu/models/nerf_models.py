"""The NeRF model family: all 13 radiance-field MLP variants of the
reference (`nerface_code/nerf-pytorch/nerf/models.py`), as pure functions
over torch-named parameter dicts.

Each class mirrors one reference nn.Module (file:line cited per class),
including quirks that affect checkpoints (e.g. `PaperNeRFModel` creates 4
view-direction layers but uses only 3, `models.py:157-161` vs :180-182).

Batch structure: `apply(params, pe_xyz, pe_dir, expr, latent)` accepts
either flat rows (pe_xyz (N, Dx), pe_dir (N, Dd)) — the reference's layout
after `run_network`'s expand+flatten (`train_utils.py:9-18`) — or the
structured TPU layout (pe_xyz (R, S, Dx), pe_dir (R, Dd)) where the
view-direction branch input is computed once per ray and broadcast over
samples, and per-frame expression/latent-code contributions are folded to
single vectors (see models/mlp.py). Both paths compute the same math.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from nerface_tpu.models.mlp import (
    Params,
    add_linear,
    cond_contribution,
    linear,
    linear_cols,
    relu,
)

EXPR_DIM = 76


def _split_keys(key: jax.Array, n: int):
    return list(jax.random.split(key, n))


def _xyz_dim(num_encoding_fn_xyz: int, include_input_xyz: bool) -> int:
    return (3 if include_input_xyz else 0) + 2 * 3 * num_encoding_fn_xyz


def _dir_dim(num_encoding_fn_dir: int, include_input_dir: bool) -> int:
    return (3 if include_input_dir else 0) + 2 * 3 * num_encoding_fn_dir


def _flatten_xyz(pe_xyz: jnp.ndarray):
    """(R, S, D) -> ((R*S, D), (R, S)) | (N, D) -> ((N, D), None)."""
    if pe_xyz.ndim == 3:
        r, s, d = pe_xyz.shape
        return pe_xyz.reshape(r * s, d), (r, s)
    return pe_xyz, None


def _per_ray_dir_contrib(
    params: Params, name: str, pe_dir: jnp.ndarray, col_start: int, structure, dtype
):
    """Columns [col_start:...] of layer `name` applied to pe_dir.

    With structured input, computed per ray (R, out) and returned with a
    broadcastable sample axis; otherwise per row (N, out).
    """
    dd = pe_dir.shape[-1]
    contrib = linear_cols(params, name, pe_dir, col_start, col_start + dd, dtype=dtype)
    if structure is not None:
        r, s = structure
        return contrib[:, None, :]  # (R, 1, out) broadcasts over samples
    return contrib


class _ModelBase:
    takes_expression = False
    takes_latent = False

    def init(self, key: jax.Array) -> Params:
        raise NotImplementedError

    def apply(self, params, pe_xyz, pe_dir, expr=None, latent=None, dtype=None):
        raise NotImplementedError

    def __call__(self, params, pe_xyz, pe_dir, expr=None, latent=None, dtype=None):
        return self.apply(params, pe_xyz, pe_dir, expr, latent, dtype)


class VeryTinyNeRFModel(_ModelBase):
    """Three-layer toy NeRF (`models.py:4-31`)."""

    def __init__(self, filter_size=128, num_encoding_functions=6, use_viewdirs=True, **_):
        self.filter_size = filter_size
        self.dim_xyz = 3 + 3 * 2 * num_encoding_functions
        self.dim_dir = (3 + 3 * 2 * num_encoding_functions) if use_viewdirs else 0
        self.use_viewdirs = use_viewdirs

    def init(self, key):
        params: Params = {}
        k = _split_keys(key, 3)
        add_linear(params, k[0], "layer1", self.dim_xyz + self.dim_dir, self.filter_size)
        add_linear(params, k[1], "layer2", self.filter_size, self.filter_size)
        add_linear(params, k[2], "layer3", self.filter_size, 4)
        return params

    def apply(self, params, pe_xyz, pe_dir, expr=None, latent=None, dtype=None):
        x, structure = _flatten_xyz(pe_xyz)
        h = linear_cols(params, "layer1", x, 0, self.dim_xyz, dtype=dtype, with_bias=True)
        if structure is not None:
            h = h.reshape(*structure, -1)
        if self.use_viewdirs and self.dim_dir:
            h = h + _per_ray_dir_contrib(params, "layer1", pe_dir, self.dim_xyz, structure, dtype)
        x = relu(h)
        x = relu(linear(params, "layer2", x, dtype=dtype))
        return linear(params, "layer3", x, dtype=dtype)


class MultiHeadNeRFModel(_ModelBase):
    """Separate sigma/RGB heads (`models.py:34-78`)."""

    def __init__(self, hidden_size=128, num_encoding_functions=6, use_viewdirs=True, **_):
        self.hidden_size = hidden_size
        self.dim_xyz = 3 + 3 * 2 * num_encoding_functions
        self.dim_dir = (3 + 3 * 2 * num_encoding_functions) if use_viewdirs else 0
        self.use_viewdirs = use_viewdirs

    def init(self, key):
        params: Params = {}
        k = _split_keys(key, 6)
        h = self.hidden_size
        add_linear(params, k[0], "layer1", self.dim_xyz, h)
        add_linear(params, k[1], "layer2", h, h)
        add_linear(params, k[2], "layer3_1", h, 1)
        add_linear(params, k[3], "layer3_2", h, h)
        add_linear(params, k[4], "layer4", self.dim_dir + h, h)
        add_linear(params, k[5], "layer5", h, h)
        kk = jax.random.split(k[5])[1]
        add_linear(params, kk, "layer6", h, 3)
        return params

    def apply(self, params, pe_xyz, pe_dir, expr=None, latent=None, dtype=None):
        x, structure = _flatten_xyz(pe_xyz)
        x = relu(linear(params, "layer1", x, dtype=dtype))
        x = relu(linear(params, "layer2", x, dtype=dtype))
        sigma = linear(params, "layer3_1", x, dtype=dtype)
        feat = relu(linear(params, "layer3_2", x, dtype=dtype))
        h = linear_cols(params, "layer4", feat, 0, self.hidden_size, dtype=dtype, with_bias=True)
        if structure is not None:
            h = h.reshape(*structure, -1)
            sigma = sigma.reshape(*structure, -1)
        if self.dim_dir:
            h = h + _per_ray_dir_contrib(params, "layer4", pe_dir, self.hidden_size, structure, dtype)
        x = relu(h)
        x = relu(linear(params, "layer5", x, dtype=dtype))
        rgb = linear(params, "layer6", x, dtype=dtype)
        return jnp.concatenate([rgb, sigma], axis=-1)


class ReplicateNeRFModel(_ModelBase):
    """NeRF supplementary-figure model (`models.py:81-121`)."""

    def __init__(
        self,
        hidden_size=256,
        num_layers=4,
        num_encoding_fn_xyz=6,
        num_encoding_fn_dir=4,
        include_input_xyz=True,
        include_input_dir=True,
        **_,
    ):
        self.hidden_size = hidden_size
        self.dim_xyz = _xyz_dim(num_encoding_fn_xyz, include_input_xyz)
        self.dim_dir = _dir_dim(num_encoding_fn_dir, include_input_dir)

    def init(self, key):
        params: Params = {}
        k = _split_keys(key, 7)
        h = self.hidden_size
        add_linear(params, k[0], "layer1", self.dim_xyz, h)
        add_linear(params, k[1], "layer2", h, h)
        add_linear(params, k[2], "layer3", h, h)
        add_linear(params, k[3], "fc_alpha", h, 1)
        add_linear(params, k[4], "layer4", h + self.dim_dir, h // 2)
        add_linear(params, k[5], "layer5", h // 2, h // 2)
        add_linear(params, k[6], "fc_rgb", h // 2, 3)
        return params

    def apply(self, params, pe_xyz, pe_dir, expr=None, latent=None, dtype=None):
        x, structure = _flatten_xyz(pe_xyz)
        x_ = relu(linear(params, "layer1", x, dtype=dtype))
        x_ = relu(linear(params, "layer2", x_, dtype=dtype))
        feat = linear(params, "layer3", x_, dtype=dtype)
        alpha = linear(params, "fc_alpha", x_, dtype=dtype)
        h = linear_cols(params, "layer4", feat, 0, self.hidden_size, dtype=dtype, with_bias=True)
        if structure is not None:
            h = h.reshape(*structure, -1)
            alpha = alpha.reshape(*structure, -1)
        h = h + _per_ray_dir_contrib(params, "layer4", pe_dir, self.hidden_size, structure, dtype)
        y = relu(h)
        y = relu(linear(params, "layer5", y, dtype=dtype))
        rgb = linear(params, "fc_rgb", y, dtype=dtype)
        return jnp.concatenate([rgb, alpha], axis=-1)


class PaperNeRFModel(_ModelBase):
    """NeRF paper Fig. 7 model (`models.py:124-184`).

    Quirks kept: hidden size hardcoded to 256/128; `layers_dir` has 4
    entries but the forward pass uses only the first 3 (:180-182) — the
    unused layer stays in the param dict for checkpoint parity.
    """

    n_xyz_layers = 6
    skip_at = 3

    def __init__(
        self,
        num_layers=8,
        hidden_size=256,
        skip_connect_every=4,
        num_encoding_fn_xyz=6,
        num_encoding_fn_dir=4,
        include_input_xyz=True,
        include_input_dir=True,
        use_viewdirs=True,
        **_,
    ):
        self.dim_xyz = _xyz_dim(num_encoding_fn_xyz, include_input_xyz)
        self.dim_dir = _dir_dim(num_encoding_fn_dir, include_input_dir)
        self.use_viewdirs = use_viewdirs

    def init(self, key):
        params: Params = {}
        k = _split_keys(key, self.n_xyz_layers + 8)
        add_linear(params, k[0], "layers_xyz.0", self.dim_xyz, 256)
        for i in range(1, self.n_xyz_layers):
            in_dim = self.dim_xyz + 256 if i == self.skip_at else 256
            add_linear(params, k[i], f"layers_xyz.{i}", in_dim, 256)
        add_linear(params, k[6], "fc_feat", 256, 256)
        add_linear(params, k[7], "fc_alpha", 256, 1)
        add_linear(params, k[8], "layers_dir.0", 256 + self.dim_dir, 128)
        for i in range(3):
            add_linear(params, k[9 + i], f"layers_dir.{i + 1}", 128, 128)
        add_linear(params, k[12], "fc_rgb", 128, 3)
        return params

    def apply(self, params, pe_xyz, pe_dir, expr=None, latent=None, dtype=None):
        xyz, structure = _flatten_xyz(pe_xyz)
        x = xyz
        for i in range(self.n_xyz_layers):
            if i == self.skip_at:
                name = f"layers_xyz.{i}"
                x = (
                    linear_cols(params, name, xyz, 0, self.dim_xyz, dtype=dtype)
                    + linear_cols(
                        params, name, x, self.dim_xyz, self.dim_xyz + 256,
                        dtype=dtype, with_bias=True,
                    )
                )
            else:
                x = linear(params, f"layers_xyz.{i}", x, dtype=dtype)
            x = relu(x)
        feat = linear(params, "fc_feat", x, dtype=dtype)
        alpha = linear(params, "fc_alpha", feat, dtype=dtype)
        h = linear_cols(params, "layers_dir.0", feat, 0, 256, dtype=dtype, with_bias=True)
        if structure is not None:
            h = h.reshape(*structure, -1)
            alpha = alpha.reshape(*structure, -1)
        if self.use_viewdirs:
            h = h + _per_ray_dir_contrib(params, "layers_dir.0", pe_dir, 256, structure, dtype)
        x = relu(h)
        for i in range(1, 3):
            x = relu(linear(params, f"layers_dir.{i}", x, dtype=dtype))
        rgb = linear(params, "fc_rgb", x, dtype=dtype)
        return jnp.concatenate([rgb, alpha], axis=-1)


class ConditionalBlendshapePaperNeRFModel(_ModelBase):
    """The NeRFace paper model (`models.py:189-261`): PE(xyz) ⊕ expr·(1/3)
    ⊕ 32-d latent code into a 6×256 trunk with a concat-skip at layer 3,
    sigma head off fc_feat, 3×128 view-direction branch to RGB.

    The per-frame expression/latent contributions are folded to single
    vectors per layer instead of replicating them across all R·S sample
    rows like the reference (`models.py:239-242`) — identical math.
    """

    takes_expression = True
    takes_latent = True
    n_xyz_layers = 6
    skip_at = 3

    def __init__(
        self,
        num_layers=8,
        hidden_size=256,
        skip_connect_every=4,
        num_encoding_fn_xyz=6,
        num_encoding_fn_dir=4,
        include_input_xyz=True,
        include_input_dir=True,
        use_viewdirs=True,
        include_expression=True,
        latent_code_dim=32,
        **_,
    ):
        self.dim_xyz = _xyz_dim(num_encoding_fn_xyz, include_input_xyz)
        self.dim_dir = _dir_dim(num_encoding_fn_dir, include_input_dir)
        self.dim_expression = EXPR_DIM if include_expression else 0
        self.dim_latent_code = latent_code_dim
        self.use_viewdirs = use_viewdirs

    @property
    def dim_cond(self):
        return self.dim_expression + self.dim_latent_code

    def init(self, key):
        params: Params = {}
        k = _split_keys(key, 13)
        d_in = self.dim_xyz + self.dim_cond
        add_linear(params, k[0], "layers_xyz.0", d_in, 256)
        for i in range(1, self.n_xyz_layers):
            in_dim = d_in + 256 if i == self.skip_at else 256
            add_linear(params, k[i], f"layers_xyz.{i}", in_dim, 256)
        add_linear(params, k[6], "fc_feat", 256, 256)
        add_linear(params, k[7], "fc_alpha", 256, 1)
        add_linear(params, k[8], "layers_dir.0", 256 + self.dim_dir, 128)
        for i in range(3):
            add_linear(params, k[9 + i], f"layers_dir.{i + 1}", 128, 128)
        add_linear(params, k[12], "fc_rgb", 128, 3)
        return params

    def _cond_segments(self, expr, latent):
        segs = []
        if self.dim_expression:
            segs.append((expr * (1.0 / 3.0), self.dim_expression))
        segs.append((latent, self.dim_latent_code))
        return segs

    def apply(self, params, pe_xyz, pe_dir, expr=None, latent=None, dtype=None):
        xyz, structure = _flatten_xyz(pe_xyz)
        segs = self._cond_segments(expr, latent)
        dx = self.dim_xyz

        # layer 0: W @ [xyz; expr/3; latent] + b
        x = (
            linear_cols(params, "layers_xyz.0", xyz, 0, dx, dtype=dtype, with_bias=True)
            + cond_contribution(params, "layers_xyz.0", segs, dx, dtype=dtype)
        )
        x = relu(x)
        for i in range(1, self.n_xyz_layers):
            name = f"layers_xyz.{i}"
            if i == self.skip_at:
                # W @ [xyz; expr/3; latent; x] + b
                x = (
                    linear_cols(params, name, xyz, 0, dx, dtype=dtype, with_bias=True)
                    + cond_contribution(params, name, segs, dx, dtype=dtype)
                    + linear_cols(
                        params, name, x, dx + self.dim_cond, dx + self.dim_cond + 256,
                        dtype=dtype,
                    )
                )
            else:
                x = linear(params, name, x, dtype=dtype)
            x = relu(x)
        feat = linear(params, "fc_feat", x, dtype=dtype)
        alpha = linear(params, "fc_alpha", feat, dtype=dtype)
        h = linear_cols(params, "layers_dir.0", feat, 0, 256, dtype=dtype, with_bias=True)
        if structure is not None:
            h = h.reshape(*structure, -1)
            alpha = alpha.reshape(*structure, -1)
        if self.use_viewdirs:
            h = h + _per_ray_dir_contrib(params, "layers_dir.0", pe_dir, 256, structure, dtype)
        x = relu(h)
        for i in range(1, 3):
            x = relu(linear(params, f"layers_dir.{i}", x, dtype=dtype))
        rgb = linear(params, "fc_rgb", x, dtype=dtype)
        return jnp.concatenate([rgb, alpha], axis=-1)


class ConditionalBlendshapePaperSmallerNeRFModel(_ModelBase):
    """Smaller paper model (`models.py:266-338`): 5 trunk layers, and the
    expression is re-injected into the view-direction branch (:330)."""

    takes_expression = True
    takes_latent = True
    n_xyz_layers = 5
    skip_at = 3

    def __init__(
        self,
        num_layers=8,
        hidden_size=256,
        skip_connect_every=4,
        num_encoding_fn_xyz=6,
        num_encoding_fn_dir=4,
        include_input_xyz=True,
        include_input_dir=True,
        use_viewdirs=True,
        include_expression=True,
        latent_code_dim=32,
        **_,
    ):
        self.dim_xyz = _xyz_dim(num_encoding_fn_xyz, include_input_xyz)
        self.dim_dir = _dir_dim(num_encoding_fn_dir, include_input_dir)
        self.dim_expression = EXPR_DIM if include_expression else 0
        self.dim_latent_code = latent_code_dim
        self.use_viewdirs = use_viewdirs

    @property
    def dim_cond(self):
        return self.dim_expression + self.dim_latent_code

    def init(self, key):
        params: Params = {}
        k = _split_keys(key, 12)
        d_in = self.dim_xyz + self.dim_cond
        add_linear(params, k[0], "layers_xyz.0", d_in, 256)
        for i in range(1, self.n_xyz_layers):
            in_dim = d_in + 256 if i == self.skip_at else 256
            add_linear(params, k[i], f"layers_xyz.{i}", in_dim, 256)
        add_linear(params, k[5], "fc_feat", 256, 256)
        add_linear(params, k[6], "fc_alpha", 256, 1)
        add_linear(
            params, k[7], "layers_dir.0", 256 + self.dim_dir + self.dim_expression, 128
        )
        for i in range(2):
            add_linear(params, k[8 + i], f"layers_dir.{i + 1}", 128, 128)
        add_linear(params, k[10], "fc_rgb", 128, 3)
        return params

    def apply(self, params, pe_xyz, pe_dir, expr=None, latent=None, dtype=None):
        xyz, structure = _flatten_xyz(pe_xyz)
        dx = self.dim_xyz
        segs = []
        if self.dim_expression:
            segs.append((expr * (1.0 / 3.0), self.dim_expression))
        segs.append((latent, self.dim_latent_code))

        x = (
            linear_cols(params, "layers_xyz.0", xyz, 0, dx, dtype=dtype, with_bias=True)
            + cond_contribution(params, "layers_xyz.0", segs, dx, dtype=dtype)
        )
        x = relu(x)
        for i in range(1, self.n_xyz_layers):
            name = f"layers_xyz.{i}"
            if i == self.skip_at:
                x = (
                    linear_cols(params, name, xyz, 0, dx, dtype=dtype, with_bias=True)
                    + cond_contribution(params, name, segs, dx, dtype=dtype)
                    + linear_cols(
                        params, name, x, dx + self.dim_cond, dx + self.dim_cond + 256,
                        dtype=dtype,
                    )
                )
            else:
                x = linear(params, name, x, dtype=dtype)
            x = relu(x)
        feat = linear(params, "fc_feat", x, dtype=dtype)
        alpha = linear(params, "fc_alpha", feat, dtype=dtype)
        # layers_dir.0 input: [feat; dirs; expr/3]
        h = linear_cols(params, "layers_dir.0", feat, 0, 256, dtype=dtype, with_bias=True)
        if structure is not None:
            h = h.reshape(*structure, -1)
            alpha = alpha.reshape(*structure, -1)
        if self.use_viewdirs:
            h = h + _per_ray_dir_contrib(params, "layers_dir.0", pe_dir, 256, structure, dtype)
            if self.dim_expression:
                h = h + cond_contribution(
                    params,
                    "layers_dir.0",
                    [(expr * (1.0 / 3.0), self.dim_expression)],
                    256 + self.dim_dir,
                    dtype=dtype,
                )
        x = relu(h)
        for i in range(1, 3):
            x = relu(linear(params, f"layers_dir.{i}", x, dtype=dtype))
        rgb = linear(params, "fc_rgb", x, dtype=dtype)
        return jnp.concatenate([rgb, alpha], axis=-1)


class _FlexibleFamily(_ModelBase):
    """Shared machinery for the FlexibleNeRFModel-shaped variants
    (`models.py:351-422` and the conditional offshoots): `layer1` +
    (num_layers-1) hidden layers with periodic concat-skips, then either a
    view-direction head (fc_feat/fc_alpha/layers_dir.0/fc_rgb) or fc_out.

    Subclasses define the conditioning folded into `layer1` and into the
    skip concat.
    """

    # Conditioning widths: input concat to layer1 beyond PE(xyz); extra
    # concat at skip layers beyond [x; xyz] (reference order: x, xyz, cond).
    cond_dim_layer1 = 0
    cond_dim_skip = 0
    # Dim the *init* reserves at skip layers (may differ from what forward
    # concatenates — a reference inconsistency kept for checkpoint parity;
    # see ConditionalBlendshapeLearnableCodeNeRFModel).
    cond_dim_skip_init = None

    def __init__(
        self,
        num_layers=4,
        hidden_size=128,
        skip_connect_every=4,
        num_encoding_fn_xyz=6,
        num_encoding_fn_dir=4,
        include_input_xyz=True,
        include_input_dir=True,
        use_viewdirs=True,
        **_,
    ):
        self.num_layers = num_layers
        self.hidden_size = hidden_size
        self.skip_connect_every = skip_connect_every
        self.dim_xyz = _xyz_dim(num_encoding_fn_xyz, include_input_xyz)
        self.dim_dir = _dir_dim(num_encoding_fn_dir, include_input_dir) if use_viewdirs else 0
        self.use_viewdirs = use_viewdirs

    # -- hooks ---------------------------------------------------------------

    def _cond_segments_layer1(self, expr, latent):
        return []

    def _cond_segments_skip(self, expr, latent):
        return []

    def _extra_init(self, params, key):
        pass

    def _prepare(self, params, expr, latent, dtype):
        """Optional preprocessing of the conditioning (e.g. expression
        compressor MLPs). Returns (expr, latent) actually concatenated."""
        return expr, latent

    # -- init / apply --------------------------------------------------------

    def _is_skip_init(self, i):
        return (
            i % self.skip_connect_every == 0 and i > 0 and i != self.num_layers - 1
        )

    def _is_skip_forward(self, i, n_hidden):
        return i % self.skip_connect_every == 0 and i > 0 and i != n_hidden - 1

    def init(self, key):
        params: Params = {}
        h = self.hidden_size
        n_hidden = self.num_layers - 1
        k = _split_keys(key, n_hidden + 6)
        skip_init = (
            self.cond_dim_skip if self.cond_dim_skip_init is None else self.cond_dim_skip_init
        )
        add_linear(params, k[0], "layer1", self.dim_xyz + self.cond_dim_layer1, h)
        for i in range(n_hidden):
            in_dim = self.dim_xyz + h + skip_init if self._is_skip_init(i) else h
            add_linear(params, k[1 + i], f"layers_xyz.{i}", in_dim, h)
        if self.use_viewdirs:
            add_linear(params, k[n_hidden + 1], "layers_dir.0", self.dim_dir + h, h // 2)
            add_linear(params, k[n_hidden + 2], "fc_alpha", h, 1)
            add_linear(params, k[n_hidden + 3], "fc_rgb", h // 2, 3)
            add_linear(params, k[n_hidden + 4], "fc_feat", h, h)
        else:
            add_linear(params, k[n_hidden + 1], "fc_out", h, 4)
        self._extra_init(params, k[n_hidden + 5])
        return params

    def apply(self, params, pe_xyz, pe_dir, expr=None, latent=None, dtype=None):
        xyz, structure = _flatten_xyz(pe_xyz)
        expr, latent = self._prepare(params, expr, latent, dtype)
        dx = self.dim_xyz
        h = self.hidden_size
        n_hidden = self.num_layers - 1

        segs1 = self._cond_segments_layer1(expr, latent)
        x = linear_cols(params, "layer1", xyz, 0, dx, dtype=dtype, with_bias=True)
        if segs1:
            x = x + cond_contribution(params, "layer1", segs1, dx, dtype=dtype)
        # Reference quirk: no activation after layer1 (`models.py:404,509`).
        for i in range(n_hidden):
            name = f"layers_xyz.{i}"
            if self._is_skip_forward(i, n_hidden):
                # concat order in the reference is (x, xyz[, cond]).
                y = (
                    linear_cols(params, name, x, 0, h, dtype=dtype, with_bias=True)
                    + linear_cols(params, name, xyz, h, h + dx, dtype=dtype)
                )
                segs_s = self._cond_segments_skip(expr, latent)
                if segs_s:
                    y = y + cond_contribution(params, name, segs_s, h + dx, dtype=dtype)
                x = y
            else:
                x = linear(params, name, x, dtype=dtype)
            x = relu(x)
        if self.use_viewdirs:
            feat = relu(linear(params, "fc_feat", x, dtype=dtype))
            alpha = linear(params, "fc_alpha", x, dtype=dtype)
            # layers_dir.0 input: [feat; view]  (`models.py:416`)
            y = linear_cols(params, "layers_dir.0", feat, 0, h, dtype=dtype, with_bias=True)
            if structure is not None:
                y = y.reshape(*structure, -1)
                alpha = alpha.reshape(*structure, -1)
            y = y + _per_ray_dir_contrib(params, "layers_dir.0", pe_dir, h, structure, dtype)
            x = relu(y)
            rgb = linear(params, "fc_rgb", x, dtype=dtype)
            return jnp.concatenate([rgb, alpha], axis=-1)
        out = linear(params, "fc_out", x, dtype=dtype)
        if structure is not None:
            out = out.reshape(*structure, -1)
        return out


class FlexibleNeRFModel(_FlexibleFamily):
    """`models.py:351-422`."""


class ConditionalNeRFModel(_FlexibleFamily):
    """`models.py:425-527` — dim_expression is force-set to 0 (:447), so
    the expression input is accepted and ignored."""

    takes_expression = True


class ConditionalBlendshapeNeRFModel(_FlexibleFamily):
    """`models.py:872-976`: expr·(1/3) concatenated at layer1 and at skips."""

    takes_expression = True

    def __init__(self, *args, include_expression=True, **kwargs):
        super().__init__(*args, **kwargs)
        self.dim_expression = EXPR_DIM if include_expression else 0
        self.cond_dim_layer1 = self.dim_expression
        self.cond_dim_skip = self.dim_expression

    def _cond_segments_layer1(self, expr, latent):
        if not self.dim_expression:
            return []
        return [(expr * (1.0 / 3.0), self.dim_expression)]

    _cond_segments_skip = _cond_segments_layer1


class ConditionalBlendshapeLearnableCodeNeRFModel(_FlexibleFamily):
    """`models.py:529-636`: expr·(1/3) ⊕ latent code at layer1.

    Reference inconsistency kept: skip-layer weights are sized for
    [xyz; h; expr; latent] (:572) but the forward concatenates only
    (x, xyz, expr) (:625); with the shipped configs (num_layers=4,
    skip_connect_every=4) no skip layer exists, so it never triggers.
    """

    takes_expression = True
    takes_latent = True

    def __init__(self, *args, include_expression=True, latent_code_dim=32, **kwargs):
        super().__init__(*args, **kwargs)
        self.dim_expression = EXPR_DIM if include_expression else 0
        self.dim_latent_code = latent_code_dim
        self.cond_dim_layer1 = self.dim_expression + self.dim_latent_code
        self.cond_dim_skip = self.dim_expression
        self.cond_dim_skip_init = self.dim_expression + self.dim_latent_code

    def _cond_segments_layer1(self, expr, latent):
        segs = []
        if self.dim_expression:
            segs.append((expr * (1.0 / 3.0), self.dim_expression))
        segs.append((latent, self.dim_latent_code))
        return segs

    def _cond_segments_skip(self, expr, latent):
        if not self.dim_expression:
            return []
        return [(expr * (1.0 / 3.0), self.dim_expression)]


class ConditionalCompressedBlendshapeLearnableCodeNeRFModel(_FlexibleFamily):
    """`models.py:639-747`: 76-dim expression compressed to 10 by a single
    linear layer (:670-671,714, no activation), then ⊕ latent code."""

    takes_expression = True
    takes_latent = True
    compressed_dim = 10

    def __init__(self, *args, include_expression=True, latent_code_dim=32, **kwargs):
        super().__init__(*args, **kwargs)
        self.dim_expression = self.compressed_dim if include_expression else 0
        self.dim_latent_code = latent_code_dim
        self.cond_dim_layer1 = self.dim_expression + self.dim_latent_code
        self.cond_dim_skip = self.dim_expression
        self.cond_dim_skip_init = self.dim_expression + self.dim_latent_code

    def _extra_init(self, params, key):
        add_linear(params, key, "layer_expr", EXPR_DIM, self.compressed_dim)

    def _prepare(self, params, expr, latent, dtype):
        if self.dim_expression and expr is not None:
            expr = linear(params, "layer_expr", expr, dtype=dtype)
        return expr, latent

    def _cond_segments_layer1(self, expr, latent):
        segs = []
        if self.dim_expression:
            segs.append((expr, self.dim_expression))  # no 1/3 scale (:714)
        segs.append((latent, self.dim_latent_code))
        return segs

    def _cond_segments_skip(self, expr, latent):
        if not self.dim_expression:
            return []
        return [(expr, self.dim_expression)]


class ConditionalCompressedBlendshapeNeRFModel(_FlexibleFamily):
    """`models.py:750-868`: expression compressed 76→38→20→20 with ReLU
    after every stage (:782-786,832-834), no latent code."""

    takes_expression = True
    compressed_dim = 20

    def __init__(self, *args, include_expression=True, **kwargs):
        super().__init__(*args, **kwargs)
        self.dim_expression = self.compressed_dim
        self.cond_dim_layer1 = self.dim_expression
        self.cond_dim_skip = self.dim_expression

    def _extra_init(self, params, key):
        k = _split_keys(key, 3)
        add_linear(params, k[0], "layers_expr.0", EXPR_DIM, 38)
        add_linear(params, k[1], "layers_expr.1", 38, 20)
        add_linear(params, k[2], "layers_expr.2", 20, 20)

    def _prepare(self, params, expr, latent, dtype):
        if expr is not None:
            for i in range(3):
                expr = relu(linear(params, f"layers_expr.{i}", expr, dtype=dtype))
        return expr, latent

    def _cond_segments_layer1(self, expr, latent):
        return [(expr, self.dim_expression)]

    _cond_segments_skip = _cond_segments_layer1


class ConditionalBlendshapeNeRFModel_v2(_FlexibleFamily):
    """`models.py:991-1095`: a 15-dim expression expanded 15→30→60 with
    ReLUs (:1019-1023,1067-1072); skips concat only (x, xyz) (:1084)."""

    takes_expression = True
    base_expr_dim = 15

    def __init__(self, *args, include_expression=True, **kwargs):
        super().__init__(*args, **kwargs)
        self.dim_expression = self.base_expr_dim * 4 if include_expression else 0
        self.cond_dim_layer1 = self.dim_expression
        self.cond_dim_skip = 0

    def _extra_init(self, params, key):
        k = _split_keys(key, 2)
        add_linear(params, k[0], "layers_expr.0", self.base_expr_dim, self.base_expr_dim * 2)
        add_linear(params, k[1], "layers_expr.1", self.base_expr_dim * 2, self.base_expr_dim * 4)

    def _prepare(self, params, expr, latent, dtype):
        if self.dim_expression and expr is not None:
            expr = expr * (1.0 / 3.0)
            expr = relu(linear(params, "layers_expr.0", expr, dtype=dtype))
            expr = relu(linear(params, "layers_expr.1", expr, dtype=dtype))
        return expr, latent

    def _cond_segments_layer1(self, expr, latent):
        if not self.dim_expression:
            return []
        return [(expr, self.dim_expression)]


class ConditionalAutoEncoderNeRFModel(_FlexibleFamily):
    """`models.py:1128-1230` — dim_expression force-set to 0 (:1150); the
    128-dim ImageEncoder code input is accepted and ignored, matching the
    released forward path."""

    takes_expression = True


MODELS: Dict[str, type] = {
    "VeryTinyNeRFModel": VeryTinyNeRFModel,
    "MultiHeadNeRFModel": MultiHeadNeRFModel,
    "ReplicateNeRFModel": ReplicateNeRFModel,
    "PaperNeRFModel": PaperNeRFModel,
    "ConditionalBlendshapePaperNeRFModel": ConditionalBlendshapePaperNeRFModel,
    "ConditionalBlendshapePaperSmallerNeRFModel": ConditionalBlendshapePaperSmallerNeRFModel,
    "FlexibleNeRFModel": FlexibleNeRFModel,
    "ConditionalNeRFModel": ConditionalNeRFModel,
    "ConditionalBlendshapeLearnableCodeNeRFModel": ConditionalBlendshapeLearnableCodeNeRFModel,
    "ConditionalCompressedBlendshapeLearnableCodeNeRFModel": ConditionalCompressedBlendshapeLearnableCodeNeRFModel,
    "ConditionalCompressedBlendshapeNeRFModel": ConditionalCompressedBlendshapeNeRFModel,
    "ConditionalBlendshapeNeRFModel": ConditionalBlendshapeNeRFModel,
    "ConditionalBlendshapeNeRFModel_v2": ConditionalBlendshapeNeRFModel_v2,
    "ConditionalAutoEncoderNeRFModel": ConditionalAutoEncoderNeRFModel,
}


def build_model(model_cfg, num_layers=None, hidden_size=None):
    """Instantiate a model from a `cfg.models.coarse`/`.fine` node.

    Mirrors the construction in the reference's entry scripts
    (`train_transformed_rays.py:100-124`): only these kwargs are passed —
    notably `skip_connect_every` is NOT forwarded (default 4 is used), and
    the fine model reuses the *coarse* num_layers/hidden_size; pass them
    explicitly to reproduce that.
    """
    cls = MODELS[model_cfg.type]
    return cls(
        num_encoding_fn_xyz=model_cfg.num_encoding_fn_xyz,
        num_encoding_fn_dir=model_cfg.num_encoding_fn_dir,
        include_input_xyz=model_cfg.include_input_xyz,
        include_input_dir=model_cfg.include_input_dir,
        use_viewdirs=model_cfg.use_viewdirs,
        num_layers=num_layers if num_layers is not None else model_cfg.num_layers,
        hidden_size=hidden_size if hidden_size is not None else model_cfg.hidden_size,
        include_expression=True,
    )
