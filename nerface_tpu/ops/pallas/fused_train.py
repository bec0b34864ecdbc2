"""One-pass training kernel: radiance MLP forward + volume compositing +
analytic MSE-loss cotangent + full backward, per ray tile, in a single
Pallas kernel.

Motivation. The reference's training iteration (`train_transformed_rays.py:
336-400` + `train_utils.py:36-162` + `volume_rendering_utils.py:7-75`) is,
per pass, MLP-forward → composite → loss → autograd-backward. The previous
TPU mapping here ran a forward kernel, XLA compositing, then a backward
kernel that *recomputed* the forward flash-style — 4× the forward FLOPs per
step plus the (R, S, 4) radiance and its cotangent round-tripping HBM.

The loss is ray-local: MSE over rays plus per-ray background terms. Its
cotangent w.r.t. the composited rgb map — 2·(rgb−target)/(3R) — is
computable inside the kernel from the target pixel. So a single kernel per
pass can run the forward (activations stay in VMEM), composite, form the
loss gradient, and chain it all the way back to weight gradients without
ever leaving the chip: 3× forward FLOPs (fwd + dx + dW), no recompute, no
radiance/cotangent HBM traffic, no XLA glue between passes.

Gradient plumbing: the kernel returns gradients w.r.t. its *kernel-layout*
inputs (transposed weight blocks, folded conditioning vectors, the per-ray
dir contribution, optionally the background pixels). `prefold_paper_params`
is the pure-JAX, all-f32, differentiable map from torch-layout params +
conditioning to that kernel layout; `train/fused.py` runs `jax.vjp` over it
and feeds these kernel gradients through the pullback to recover gradients
for the real parameter tree (including the latent-code table and trainable
background). Weight-gradient precision: accumulated f32 in VMEM and handed
to the pullback in f32 — unlike the generic custom-VJP path, nothing is
rounded to bf16 on the way back.

Compositing backward is hand-derived (exclusive-cumprod transpose is the
same strictly-triangular matmul with the contraction flipped); validated
against `jax.grad` of the XLA parity path in tests/test_fused_train.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from nerface_tpu.ops.pallas import fused_mlp as _fm
from nerface_tpu.ops.pallas.fused_mlp import (
    _PALLAS_OK,
    BIAS_NAMES,
    CUMPROD_PRECISION,
    DIR_HIDDEN,
    HIDDEN,
    WEIGHT_NAMES,
    _const_spec,
    _encode_in_kernel,
    _interpret,
    _pick_rays_per_tile,
    _points_in_kernel,
    _ray_specs,
    _trunk_backward,
    _trunk_forward,
    _unpack_weight_refs,
    _weight_shapes,
    _weight_specs,
)

if _PALLAS_OK:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu


def _train_kernel(
    n_rays,
    n_samples,
    small,
    has_bg,
    train_bg,
    white_background,
    noise_std,
    loss_scale,
    sup_bg_scale,
    *refs,
):
    """Forward + composite + loss cotangent + backward for one ray tile.

    Static config: `loss_scale` = 2/(3·R_total) (the MSE cotangent scale
    over the full local batch), `noise_std` the sigma-noise std (0 = no
    noise input), `sup_bg_scale` = 0.001/R_total when the supervised
    background loss applies to this pass (fine pass only), else 0.
    """
    ro_ref, rd_ref, z_ref, dir_ref, cond0_ref, cond3_ref, C_ref, phase_ref = refs[:8]
    i = 8
    tgt_ref = refs[i]
    i += 1
    if has_bg:
        bg_ref = refs[i]
        i += 1
    if noise_std > 0.0:
        noise_ref = refs[i]
        i += 1
    tri_ref = refs[i]
    i += 1
    wn, bn = _fm._names(small)
    W, used = _unpack_weight_refs(refs[i:], small)
    outs = refs[i + used:]
    rgb_ref, w_out_ref = outs[0], outs[1]
    d_w = {name: outs[2 + k] for k, name in enumerate(wn)}
    nw = 2 + len(wn)
    d_b = {name: outs[nw + k] for k, name in enumerate(bn)}
    nb = nw + len(bn)
    d_cond0_ref, d_cond3_ref, d_dir_ref = outs[nb], outs[nb + 1], outs[nb + 2]
    d_bg_ref = outs[nb + 3] if train_bg else None

    tile = n_rays * n_samples

    # ---- forward: trunk + compositing (matches _render_kernel) ------------
    x3 = _points_in_kernel(ro_ref, rd_ref, z_ref, n_rays, n_samples)
    enc = _encode_in_kernel(x3, C_ref[:], phase_ref[:])
    rgb_raw, alpha_raw, a = _trunk_forward(
        x3, enc, dir_ref[:], cond0_ref[:], cond3_ref[:], W, n_rays, n_samples
    )
    rgb_raw = rgb_raw.reshape(n_rays, n_samples, 3)
    sigma = alpha_raw.reshape(n_rays, n_samples)

    z = z_ref[:]
    rd = rd_ref[:]
    d = jnp.concatenate(
        [z[:, 1:] - z[:, :-1], jnp.full((n_rays, 1), 1e10, z.dtype)], axis=-1
    )
    rd_norm = jnp.sqrt(jnp.sum(rd * rd, axis=-1, keepdims=True))
    d = d * rd_norm

    is_last = (
        jax.lax.broadcasted_iota(jnp.int32, (n_rays, n_samples), 1)
        == n_samples - 1
    )
    m_last = is_last.astype(jnp.float32)

    sig = jax.nn.sigmoid(rgb_raw)
    if has_bg:
        m_last3 = m_last[..., None]
        rgb_act = sig * (1.0 - m_last3) + bg_ref[:][:, None, :] * m_last3
    else:
        rgb_act = sig

    if noise_std > 0.0:
        sigma_n = sigma + noise_ref[:] * noise_std
    else:
        sigma_n = sigma
    relu_mask = (sigma_n > 0.0).astype(jnp.float32)
    sigma_a = sigma_n * relu_mask + jnp.where(is_last, 1e-6, 0.0)

    one_minus_alpha = jnp.exp(-sigma_a * d)
    alpha = 1.0 - one_minus_alpha
    log_t = jnp.log(one_minus_alpha + 1e-10)
    # exclusive cumprod: trans = exp(log_t @ U), U strictly upper
    # triangular; HIGHEST so log_t isn't bf16-rounded by the default
    # single-pass f32 matmul (~0.1-1% transmittance error otherwise)
    trans = jnp.exp(
        jax.lax.dot_general(
            log_t, tri_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=CUMPROD_PRECISION,
        )
    )
    weights = alpha * trans

    rgb_map = jnp.sum(weights[..., None] * rgb_act, axis=1)
    if white_background:
        acc_map = jnp.sum(weights, axis=1, keepdims=True)
        rgb_map = rgb_map + (1.0 - acc_map)

    rgb_ref[:] = rgb_map
    w_out_ref[:] = weights

    # ---- loss cotangent (ray-local, formed in-kernel) ----------------------
    # total = mean_{R,3}((rgb−t)²)·[coarse+fine share]  → d rgb = 2(rgb−t)/(3R)
    g_rgb_map = (rgb_map - tgt_ref[:]) * loss_scale  # (tr, 3)

    # ---- backward through compositing --------------------------------------
    # rgb_map = Σ_s w·rgb_act (+ (1−Σ w) if white_background)
    g_w = jnp.sum(rgb_act * g_rgb_map[:, None, :], axis=-1)  # (tr, S)
    if white_background:
        g_acc = -jnp.sum(g_rgb_map, axis=-1, keepdims=True)  # (tr, 1)
        g_w = g_w + g_acc
    if sup_bg_scale > 0.0:
        # bg_loss = mean_r(Σ_c (bg−t)² · w_last)·0.001:
        # d w_last += sup_bg_scale·per_ray;  d bg += sup_bg_scale·w_last·2(bg−t)
        diff_bg = bg_ref[:] - tgt_ref[:]
        per_ray = jnp.sum(diff_bg * diff_bg, axis=-1, keepdims=True)  # (tr,1)
        g_w = g_w + per_ray * sup_bg_scale * m_last
        if train_bg:
            w_last = weights[:, n_samples - 1:n_samples]
            g_bg_sup = 2.0 * diff_bg * w_last * sup_bg_scale
    g_rgb_act = weights[..., None] * g_rgb_map[:, None, :]  # (tr, S, 3)

    # w = alpha · trans
    g_alpha_c = g_w * trans
    g_trans = g_w * alpha
    # trans_i = exp(Σ_{j<i} log_t_j)  →  g_log_t_j = Σ_{i>j} g_trans_i·trans_i
    # = (g_trans ⊙ trans) @ Uᵀ — the same triangular matrix, contraction on
    # its second axis.
    g_log_t = jax.lax.dot_general(
        g_trans * trans, tri_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=CUMPROD_PRECISION,
    )
    # log_t = log(omae + 1e-10); alpha = 1 − omae
    g_omae = g_log_t / (one_minus_alpha + 1e-10) - g_alpha_c
    # omae = exp(−sigma_a·d): multiply by omae FIRST — omae underflows to
    # exactly 0 on the 1e10 background dist, killing the huge 1/(ω+1e-10)
    # factor before it meets d=1e10 (0·1e10 is fine; inf·0 would NaN).
    g_sigma_a = -(one_minus_alpha * g_omae) * d
    g_sigma = g_sigma_a * relu_mask  # (tr, S)

    # rgb_act: sigmoid for all but the bg-overwritten last sample
    g_sig = g_rgb_act * sig * (1.0 - sig)
    if has_bg:
        g_rgb_raw = g_sig * (1.0 - m_last3)
        g_bg = jnp.sum(g_rgb_act * m_last3, axis=1)  # (tr, 3)
        if sup_bg_scale > 0.0 and train_bg:
            g_bg = g_bg + g_bg_sup
    else:
        g_rgb_raw = g_sig

    # ---- backward through the trunk ----------------------------------------
    grads_w, grads_b, d_cond0, d_cond3, d_dir = _trunk_backward(
        x3, enc, a, W,
        g_rgb_raw.reshape(tile, 3), g_sigma.reshape(tile, 1),
        n_rays, n_samples,
    )
    d_dir_ref[:] = d_dir
    if train_bg:
        d_bg_ref[:] = g_bg

    first = pl.program_id(0) == 0

    @pl.when(first)
    def _():
        for name in wn:
            d_w[name][:] = grads_w[name]
        for name in bn:
            d_b[name][:] = grads_b[name]
        d_cond0_ref[:] = d_cond0
        d_cond3_ref[:] = d_cond3

    @pl.when(jnp.logical_not(first))
    def _():
        for name in wn:
            d_w[name][:] += grads_w[name]
        for name in bn:
            d_b[name][:] += grads_b[name]
        d_cond0_ref[:] += d_cond0
        d_cond3_ref[:] += d_cond3


def prefold_paper_params(
    params, cond, pe_dir, num_encoding_fn_xyz: int, small: bool = False,
    dir_expr_offset: int = 0,
):
    """Differentiable, all-f32 map from torch-layout paper-model params to
    the kernel input bundle: (cond0, cond3, dir_contrib, *weights, *biases).

    `cond` is the per-frame [expr/3; latent] vector; `pe_dir` the (R, Dd)
    encoded direction-branch input. With `small` the smaller paper variant
    is laid out (no layers_xyz.5), and a nonzero `dir_expr_offset` (the
    input column where the expression block starts: 256 + declared dir
    width) folds the expression part of `cond` into `dir_contrib` — the
    smaller model's dir branch consumes [feat; dirs; expr/3]
    (`models.py:330`).
    The conditioning folds and the weight transposes happen here so
    `jax.vjp` over this function chains the kernel's f32 gradients back to
    the real parameter tree.
    """
    from nerface_tpu.models.mlp import linear_cols

    d_pe = 3 + 2 * num_encoding_fn_xyz * 3
    dc = cond.shape[-1]

    cond0, cond3, weights = _fm._layout_weights(
        params, cond, d_pe, dc, small, cast=None
    )
    dd = pe_dir.shape[-1]
    dir_contrib = linear_cols(params, "layers_dir.0", pe_dir, HIDDEN, HIDDEN + dd)
    if dir_expr_offset:
        # expression per-frame constant: one (128,) vector broadcast per ray
        w_dir = params["layers_dir.0.weight"]
        expr3 = cond[: dc - 32]  # [expr/3; latent(32)] layout
        n_expr = dc - 32
        dir_contrib = dir_contrib + (
            w_dir[:, dir_expr_offset:dir_expr_offset + n_expr] @ expr3
        )
    return (cond0, cond3, dir_contrib) + weights


def fused_train_pass(
    bundle,
    ray_origins: jnp.ndarray,     # (R, 3) f32
    ray_directions: jnp.ndarray,  # (R, 3) f32
    z_vals: jnp.ndarray,          # (R, S) f32 sample depths
    target: jnp.ndarray,          # (R, 3) f32 target pixels
    *,
    background=None,              # (R, 3) f32 or None
    noise=None,                   # (R, S) f32 sigma-noise draws or None
    noise_std: float = 0.0,
    white_background: bool = False,
    loss_scale: float,
    sup_bg_scale: float = 0.0,
    train_bg: bool = False,
    num_encoding_fn_xyz: int = 10,
    log_sampling_xyz: bool = True,
    small: bool = False,
):
    """One training pass (coarse or fine) through the fused kernel.

    `bundle` is `prefold_paper_params(...)` output (all f32). Returns
    (outs, grads, d_bg) where outs = {"rgb": (R,3), "weights": (R,S)},
    `grads` mirrors `bundle`'s structure (f32 cotangents for the vjp
    pullback), and d_bg is the (R, 3) background-pixel gradient when
    `train_bg` else None.
    """
    from nerface_tpu.ops.encoding import _encoding_matrix

    _fm.check_pe_mode(log_sampling_xyz)
    n_rays, n_samples = z_vals.shape
    tr = _pick_rays_per_tile(n_rays, n_samples)
    grid = (n_rays // tr,)

    wn, bn = _fm._names(small)
    cond0, cond3, dir_contrib = bundle[0], bundle[1], bundle[2]
    weights_f32 = bundle[3:]
    bf16 = jnp.bfloat16
    n_w = len(wn)
    weights = tuple(x.astype(bf16) for x in weights_f32[:n_w]) + tuple(
        weights_f32[n_w:]
    )

    C_np, phase_np = _encoding_matrix(3, num_encoding_fn_xyz, log_sampling_xyz)
    C = jnp.asarray(C_np)
    phase = jnp.asarray(phase_np)[None, :]
    tri = jnp.triu(jnp.ones((n_samples, n_samples), jnp.float32), k=1)
    d_enc = C.shape[-1]
    shapes = _weight_shapes(d_enc)

    has_bg = background is not None
    has_noise = noise_std > 0.0
    if has_noise and noise is None:
        raise ValueError("noise_std > 0 requires a noise array")

    in_specs = _ray_specs(tr, n_samples) + [
        _const_spec((1, HIDDEN)),
        _const_spec((1, HIDDEN)),
        _const_spec((3, d_enc)),
        _const_spec((1, d_enc)),
        pl.BlockSpec((tr, 3), lambda i: (i, 0), memory_space=_vmem()),
    ]
    args = [ray_origins, ray_directions, z_vals, dir_contrib, cond0, cond3,
            C, phase, target]
    if has_bg:
        in_specs.append(
            pl.BlockSpec((tr, 3), lambda i: (i, 0), memory_space=_vmem())
        )
        args.append(background)
    if has_noise:
        in_specs.append(
            pl.BlockSpec((tr, n_samples), lambda i: (i, 0), memory_space=_vmem())
        )
        args.append(noise)
    in_specs.append(_const_spec((n_samples, n_samples)))
    args.append(tri)
    in_specs += _weight_specs(d_enc, small)
    args += list(weights)

    out_specs = [
        pl.BlockSpec((tr, 3), lambda i: (i, 0), memory_space=_vmem()),
        pl.BlockSpec((tr, n_samples), lambda i: (i, 0), memory_space=_vmem()),
    ]
    out_shapes = [
        jax.ShapeDtypeStruct((n_rays, 3), jnp.float32),
        jax.ShapeDtypeStruct((n_rays, n_samples), jnp.float32),
    ]
    for name in wn + bn:
        out_specs.append(_const_spec(shapes[name]))
        out_shapes.append(jax.ShapeDtypeStruct(shapes[name], jnp.float32))
    out_specs += [
        _const_spec((1, HIDDEN)),
        _const_spec((1, HIDDEN)),
        pl.BlockSpec((tr, DIR_HIDDEN), lambda i: (i, 0), memory_space=_vmem()),
    ]
    out_shapes += [
        jax.ShapeDtypeStruct((1, HIDDEN), jnp.float32),
        jax.ShapeDtypeStruct((1, HIDDEN), jnp.float32),
        jax.ShapeDtypeStruct((n_rays, DIR_HIDDEN), jnp.float32),
    ]
    if train_bg:
        out_specs.append(
            pl.BlockSpec((tr, 3), lambda i: (i, 0), memory_space=_vmem())
        )
        out_shapes.append(jax.ShapeDtypeStruct((n_rays, 3), jnp.float32))

    res = pl.pallas_call(
        functools.partial(
            _train_kernel, tr, n_samples, small, has_bg, train_bg,
            white_background, noise_std if has_noise else 0.0,
            loss_scale, sup_bg_scale,
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=_interpret(),
    )(*args)

    outs = {"rgb": res[0], "weights": res[1]}
    k = 2
    d_weights = tuple(res[k + j] for j in range(n_w + len(bn)))
    k += n_w + len(bn)
    d_cond0, d_cond3, d_dir = res[k], res[k + 1], res[k + 2]
    d_bg = res[k + 3] if train_bg else None
    grads = (d_cond0, d_cond3, d_dir) + d_weights
    return outs, grads, d_bg


def _vmem():
    return pltpu.VMEM


def fused_train_available(num_rays: int, num_coarse: int, num_fine: int) -> bool:
    """The fused train path needs the tile picker to produce valid tiles
    for both passes (coarse S and merged coarse+fine S)."""
    if not _PALLAS_OK:
        return False
    tr_c = _pick_rays_per_tile(num_rays, num_coarse)
    tr_f = _pick_rays_per_tile(num_rays, num_coarse + num_fine)
    # availability checked through the module so tests can monkeypatch
    # fused_mlp.fused_paper_mlp_available once for every fused entry point
    return (
        _fm.fused_paper_mlp_available(num_rays, tr_c)
        and _fm.fused_paper_mlp_available(num_rays, tr_f)
    )
