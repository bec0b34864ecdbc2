"""Fused Pallas kernel for the FlexibleNeRFModel family.

Covers the conditional experiment configs that don't use the paper
architecture (`models.py:351-560`: FlexibleNeRFModel and the
ConditionalBlendshape / LearnableCode / Compressed offshoots). Every one
of the reference's config instantiations uses num_layers=4,
hidden_size=256, skip_connect_every=3 — at which the periodic concat-skip
NEVER activates (the configs themselves note "won't take affect unless
num_layers > skip_connect_every") — so the kernel implements the
skip-free shape: layer1 (NO activation — reference quirk, `models.py:404`)
→ (num_layers−1) relu'd hidden layers → viewdirs head with the sigma
taken off the trunk (not off feat: `models.py:414-415`). Eligibility in
`render/pipeline.py` falls back to XLA whenever a skip layer would
engage.

All per-frame conditioning (expression, latent code, compressed
expression — whatever the subclass folds into layer1) arrives as ONE
(1, H) vector `v0` = bias + conditioning columns @ cond, computed
differentiably on the JAX side; the kernel itself is conditioning-
agnostic. Like the paper-model kernel, sample positions (ro + rd·z) and
their positional encoding are computed in VMEM. Backward is a custom VJP
with flash-style recompute and f32 weight-gradient accumulation across
the sequential grid.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from nerface_tpu.ops.pallas.fused_mlp import (
    _PALLAS_OK,
    _const_spec,
    _encode_in_kernel,
    _interpret,
    _pick_fwd_rays_per_tile,
    _pick_rays_per_tile,
    _points_in_kernel,
    fused_paper_mlp_available,
)

if _PALLAS_OK:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu


def _dot(a, b):
    return jax.lax.dot_general(
        a.astype(jnp.bfloat16), b, (((a.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _dot_t(x, gy):
    # dW = x^T @ gy
    return jax.lax.dot_general(
        x.astype(jnp.bfloat16), gy.astype(jnp.bfloat16),
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )


def _dot_bt(gy, w):
    # dx = gy @ W^T
    return jax.lax.dot_general(
        gy.astype(jnp.bfloat16), w, (((gy.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _m(x):
    return x.astype(jnp.float32) > 0


def _weight_names(n_hidden: int):
    wn = ["w1a", "w1b"] + [f"wh{i}" for i in range(n_hidden)] + [
        "wf", "wa", "wd0", "wrgb",
    ]
    bn = [f"bh{i}" for i in range(n_hidden)] + ["bf", "ba", "bd0", "brgb"]
    return tuple(wn), tuple(bn)


def _weight_shapes(n_hidden: int, h: int, d_enc: int):
    shapes = {"w1a": (3, h), "w1b": (d_enc, h)}
    for i in range(n_hidden):
        shapes[f"wh{i}"] = (h, h)
        shapes[f"bh{i}"] = (1, h)
    shapes.update({
        "wf": (h, h), "bf": (1, h),
        "wa": (h, 1), "ba": (1, 1),
        "wd0": (h, h // 2), "bd0": (1, h // 2),
        "wrgb": (h // 2, 3), "brgb": (1, 3),
    })
    return shapes


def _unpack(refs, n_hidden):
    wn, bn = _weight_names(n_hidden)
    W = {}
    i = 0
    for name in wn + bn:
        W[name] = refs[i][:]
        i += 1
    return W, i


def _forward(x3, enc, v0, dir_c, W, n_hidden, n_rays, n_samples, h):
    tile = x3.shape[0]
    a = _dot(x3, W["w1a"]) + _dot(enc, W["w1b"]) + v0  # layer1: NO relu
    acts = [a]
    for i in range(n_hidden):
        a = jax.nn.relu(_dot(a, W[f"wh{i}"]) + W[f"bh{i}"])
        acts.append(a)
    feat = jax.nn.relu(_dot(a, W["wf"]) + W["bf"])
    alpha = _dot(a, W["wa"]) + W["ba"]  # sigma off the trunk (models.py:415)
    hd = _dot(feat, W["wd0"]) + W["bd0"]
    hd = (
        hd.reshape(n_rays, n_samples, h // 2) + dir_c[:, None, :]
    ).reshape(tile, h // 2)
    x0 = jax.nn.relu(hd)
    rgb = _dot(x0, W["wrgb"]) + W["brgb"]
    bf = jnp.bfloat16
    saved = dict(
        acts=[t.astype(bf) for t in acts],
        feat=feat.astype(bf), x0=x0.astype(bf),
    )
    return rgb, alpha, saved


def _fwd_kernel(n_rays, n_samples, n_hidden, h, *refs):
    ro_ref, rd_ref, z_ref, dir_ref, v0_ref, C_ref, phase_ref = refs[:7]
    W, used = _unpack(refs[7:], n_hidden)
    out_ref = refs[7 + used]
    x3 = _points_in_kernel(ro_ref, rd_ref, z_ref, n_rays, n_samples)
    enc = _encode_in_kernel(x3, C_ref[:], phase_ref[:])
    rgb, alpha, _ = _forward(
        x3, enc, v0_ref[:], dir_ref[:], W, n_hidden, n_rays, n_samples, h
    )
    out_ref[:] = jnp.concatenate([rgb, alpha], -1).reshape(n_rays, n_samples, 4)


def _bwd_kernel(n_rays, n_samples, n_hidden, h, *refs):
    ro_ref, rd_ref, z_ref, dir_ref, v0_ref, C_ref, phase_ref = refs[:7]
    wn, bn = _weight_names(n_hidden)
    W, used = _unpack(refs[7:], n_hidden)
    g_ref = refs[7 + used]
    outs = refs[8 + used:]
    d_w = {name: outs[i] for i, name in enumerate(wn)}
    nw = len(wn)
    d_b = {name: outs[nw + i] for i, name in enumerate(bn)}
    nb = nw + len(bn)
    d_v0_ref, d_dir_ref = outs[nb], outs[nb + 1]

    tile = n_rays * n_samples
    x3 = _points_in_kernel(ro_ref, rd_ref, z_ref, n_rays, n_samples)
    enc = _encode_in_kernel(x3, C_ref[:], phase_ref[:])
    _, _, s = _forward(
        x3, enc, v0_ref[:], dir_ref[:], W, n_hidden, n_rays, n_samples, h
    )
    acts, feat, x0 = s["acts"], s["feat"], s["x0"]

    g = g_ref[:].reshape(tile, 4)
    g_rgb, g_alpha = g[:, :3], g[:, 3:4]

    gw, gb = {}, {}
    gx0 = _dot_bt(g_rgb, W["wrgb"]) * _m(x0)
    gw["wrgb"] = _dot_t(x0, g_rgb)
    gb["brgb"] = jnp.sum(g_rgb, axis=0, keepdims=True)
    g_pre_feat = _dot_bt(gx0, W["wd0"])  # cotangent of wf·a+bf pre-relu...
    gw["wd0"] = _dot_t(feat, gx0)
    gb["bd0"] = jnp.sum(gx0, axis=0, keepdims=True)
    d_dir_ref[:] = jnp.sum(gx0.reshape(n_rays, n_samples, h // 2), axis=1)
    g_pre_feat = g_pre_feat * _m(feat)

    ga = _dot_bt(g_pre_feat, W["wf"]) + _dot_bt(g_alpha, W["wa"])
    gw["wf"] = _dot_t(acts[n_hidden], g_pre_feat)
    gb["bf"] = jnp.sum(g_pre_feat, axis=0, keepdims=True)
    gw["wa"] = _dot_t(acts[n_hidden], g_alpha)
    gb["ba"] = jnp.sum(g_alpha, axis=0, keepdims=True)

    for i in range(n_hidden - 1, -1, -1):
        g_pre = ga * _m(acts[i + 1])
        gw[f"wh{i}"] = _dot_t(acts[i], g_pre)
        gb[f"bh{i}"] = jnp.sum(g_pre, axis=0, keepdims=True)
        ga = _dot_bt(g_pre, W[f"wh{i}"])
    # layer1 has no activation: ga is the pre-activation cotangent directly
    gw["w1a"] = _dot_t(x3, ga)
    gw["w1b"] = _dot_t(enc.astype(jnp.bfloat16), ga)
    d_v0 = jnp.sum(ga, axis=0, keepdims=True)

    first = pl.program_id(0) == 0

    @pl.when(first)
    def _():
        for name in wn:
            d_w[name][:] = gw[name]
        for name in bn:
            d_b[name][:] = gb[name]
        d_v0_ref[:] = d_v0

    @pl.when(jnp.logical_not(first))
    def _():
        for name in wn:
            d_w[name][:] += gw[name]
        for name in bn:
            d_b[name][:] += gb[name]
        d_v0_ref[:] += d_v0


def _ray_specs(tr, n_samples, h):
    return [
        pl.BlockSpec((tr, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tr, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tr, n_samples), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tr, h // 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]


def _in_specs(tr, n_samples, n_hidden, h, d_enc):
    shapes = _weight_shapes(n_hidden, h, d_enc)
    wn, bn = _weight_names(n_hidden)
    return _ray_specs(tr, n_samples, h) + [
        _const_spec((1, h)),
        _const_spec((3, d_enc)),
        _const_spec((1, d_enc)),
    ] + [_const_spec(shapes[n]) for n in wn + bn]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _fused_flex(n_samples, rays_per_tile, n_hidden, h,
                ro, rd, z, dir_c, v0, C, phase, *weights):
    out, _ = _fused_flex_fwd(
        n_samples, rays_per_tile, n_hidden, h, ro, rd, z, dir_c, v0, C,
        phase, *weights
    )
    return out


def _fused_flex_fwd(n_samples, rays_per_tile, n_hidden, h,
                    ro, rd, z, dir_c, v0, C, phase, *weights):
    n_rays = ro.shape[0]
    d_enc = C.shape[-1]
    tr = _pick_fwd_rays_per_tile(n_rays, n_samples)
    if n_rays % tr:
        tr = rays_per_tile
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, tr, n_samples, n_hidden, h),
        grid=(n_rays // tr,),
        in_specs=_in_specs(tr, n_samples, n_hidden, h, d_enc),
        out_specs=pl.BlockSpec(
            (tr, n_samples, 4), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_rays, n_samples, 4), jnp.float32),
        interpret=_interpret(),
    )(ro, rd, z, dir_c, v0, C, phase, *weights)
    return out, (ro, rd, z, dir_c, v0, C, phase, weights)


def _fused_flex_bwd(n_samples, rays_per_tile, n_hidden, h, residuals, g):
    ro, rd, z, dir_c, v0, C, phase, weights = residuals
    n_rays = ro.shape[0]
    d_enc = C.shape[-1]
    tr = rays_per_tile
    shapes = _weight_shapes(n_hidden, h, d_enc)
    wn, bn = _weight_names(n_hidden)

    in_specs = _in_specs(tr, n_samples, n_hidden, h, d_enc) + [
        pl.BlockSpec((tr, n_samples, 4), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shapes = (
        [jax.ShapeDtypeStruct(shapes[n], jnp.float32) for n in wn + bn]
        + [
            jax.ShapeDtypeStruct((1, h), jnp.float32),           # d_v0
            jax.ShapeDtypeStruct((n_rays, h // 2), jnp.float32),  # d_dir
        ]
    )
    out_specs = (
        [_const_spec(shapes[n]) for n in wn + bn]
        + [
            _const_spec((1, h)),
            pl.BlockSpec((tr, h // 2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ]
    )
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, tr, n_samples, n_hidden, h),
        grid=(n_rays // tr,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=_interpret(),
    )(ro, rd, z, dir_c, v0, C, phase, *weights, g)

    nb = len(wn) + len(bn)
    d_weights = tuple(
        outs[i].astype(w.dtype) for i, w in zip(range(nb), weights)
    )
    d_v0, d_dir = outs[nb], outs[nb + 1]
    return (
        jnp.zeros_like(ro), jnp.zeros_like(rd), jnp.zeros_like(z),
        d_dir, d_v0, jnp.zeros_like(C), jnp.zeros_like(phase),
    ) + d_weights


_fused_flex.defvjp(_fused_flex_fwd, _fused_flex_bwd)


def fused_flex_mlp(
    params,
    ray_origins: jnp.ndarray,    # (R, 3)
    ray_directions: jnp.ndarray,  # (R, 3)
    z_vals: jnp.ndarray,         # (R, S)
    dir_contrib: jnp.ndarray,    # (R, H/2): pe_dir through layers_dir.0 cols
    v0: jnp.ndarray,             # (1, H): layer1 bias + conditioning fold
    n_hidden: int,
    hidden_size: int,
    num_encoding_fn_xyz: int,
    log_sampling_xyz: bool = True,
    rays_per_tile: int = 0,
) -> jnp.ndarray:
    """Fused forward of a skip-free FlexibleNeRFModel-family trunk; returns
    (R, S, 4) radiance. Differentiable w.r.t. params, v0 and dir_contrib
    (hence whatever conditioning the caller folded into them)."""
    from nerface_tpu.ops.encoding import _encoding_matrix

    n_rays, n_samples = z_vals.shape
    if rays_per_tile <= 0:
        rays_per_tile = _pick_rays_per_tile(n_rays, n_samples)
    d_pe = 3 + 2 * num_encoding_fn_xyz * 3
    C_np, phase_np = _encoding_matrix(3, num_encoding_fn_xyz, log_sampling_xyz)
    C = jnp.asarray(C_np)
    phase = jnp.asarray(phase_np)[None, :]

    def w(name):
        return params[name + ".weight"]

    def b(name):
        return params[name + ".bias"]

    bf16 = jnp.bfloat16
    h = hidden_size
    mats = [w("layer1")[:, :3].T, w("layer1")[:, 3:d_pe].T]
    for i in range(n_hidden):
        mats.append(w(f"layers_xyz.{i}").T)
    mats += [
        w("fc_feat").T, w("fc_alpha").T,
        w("layers_dir.0")[:, :h].T, w("fc_rgb").T,
    ]
    biases = [b(f"layers_xyz.{i}")[None, :] for i in range(n_hidden)]
    biases += [
        b("fc_feat")[None, :], b("fc_alpha")[None, :],
        b("layers_dir.0")[None, :], b("fc_rgb")[None, :],
    ]
    weights = tuple(m.astype(bf16) for m in mats) + tuple(biases)
    return _fused_flex(
        n_samples, rays_per_tile, n_hidden, h,
        ray_origins, ray_directions, z_vals, dir_contrib, v0, C, phase,
        *weights
    )


def flex_fused_eligible(model, encode_xyz, pe_dir) -> bool:
    """Static checks shared by the dispatch in render/pipeline.py."""
    from nerface_tpu.models.nerf_models import _FlexibleFamily

    if not isinstance(model, _FlexibleFamily):
        return False
    if not model.use_viewdirs or pe_dir is None:
        return False
    if not encode_xyz.include_input:
        return False
    if model.dim_xyz != 3 + 6 * encode_xyz.num_encoding_functions:
        return False
    if model.dim_dir < pe_dir.shape[-1]:
        return False
    if model.hidden_size % 256 or (model.hidden_size // 2) % 128:
        return False
    n_hidden = model.num_layers - 1
    # the kernel implements the skip-free shape only — every reference
    # config satisfies this (num_layers=4, skip_connect_every=3)
    if any(model._is_skip_forward(i, n_hidden) for i in range(n_hidden)):
        return False
    return True
