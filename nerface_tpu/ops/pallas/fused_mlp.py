"""Fused Pallas kernel for the NeRFace paper-model MLP.

The radiance-field MLP (reference `models.py:189-261`) is the framework's
hot loop: each train step evaluates it over ~400k samples, each 512² eval
frame over ~34M. Under plain XLA every layer's (S, 256) activation round-
trips HBM between matmuls; this kernel keeps ALL weights (~1.1 MB bf16) and
the per-tile activations resident in VMEM and evaluates the whole network —
trunk with concat-skip, σ head, view-direction branch — in one pass per
sample tile. bf16 on the MXU with f32 accumulation; parameters stay f32
outside.

The per-frame conditioning (expression ⊕ latent code) and biases of the
layers they feed are pre-folded into two (256,) vectors (`cond0`, `cond3`)
on the JAX side — see `models/mlp.py` — and the per-ray view-direction
contribution enters as a precomputed (R, 128) vector added after the
fc_feat → layers_dir.0 matmul. The kernel's per-sample inputs are just the
ray geometry (origins, directions, depths): sample positions ro + rd·z AND
their positional encoding are computed in VMEM, so neither the (R, S, 3)
points nor the (R, S, 63) PE array ever exists in HBM.

Backward is a custom VJP: a second kernel recomputes the forward per tile
(flash-style) and accumulates weight/bias/conditioning gradients in f32
VMEM across the sequential TPU grid (constant out index_map + accumulate).
Gradients for the conditioning vectors and dir contribution chain back to
the latent-code table / full weight matrices through the JAX-side folds.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

try:  # pallas import can fail on exotic backends; gate cleanly
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False

HIDDEN = 256
DIR_HIDDEN = 128
# Weight order shared by fwd/bwd. Layer 0 and the skip layer are split into
# raw-xyz rows (w0a/w3xa) and encoding rows (w0b/w3xb) because the kernel
# computes the positional encoding in VMEM and never materializes the
# concatenated [xyz, enc] input.
WEIGHT_NAMES = (
    "w0a", "w0b", "w1", "w2", "w3xa", "w3xb", "w3h", "w4", "w5", "wf", "wa",
    "wd0", "wd1", "wd2", "wrgb",
)
BIAS_NAMES = ("b1", "b2", "b4", "b5", "bf", "ba", "bd0", "bd1", "bd2", "brgb")
# The smaller paper variant (`models.py:266-338`) drops one post-skip trunk
# layer (w5/b5); everything else — conditioning folds, skip wiring, heads —
# is shared. Its dir-branch expression input folds into the per-ray
# dir-contribution vector on the JAX side, so the kernel never sees it.
WEIGHT_NAMES_SMALL = tuple(n for n in WEIGHT_NAMES if n != "w5")
BIAS_NAMES_SMALL = tuple(n for n in BIAS_NAMES if n != "b5")


def _names(small: bool):
    if small:
        return WEIGHT_NAMES_SMALL, BIAS_NAMES_SMALL
    return WEIGHT_NAMES, BIAS_NAMES


def fused_paper_mlp_available(num_rays: int, rays_per_tile: int) -> bool:
    if not _PALLAS_OK:
        return False
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    return rays_per_tile >= 8 and num_rays % rays_per_tile == 0


def _interpret() -> bool:
    """Interpreter mode on non-TPU backends (CPU tests, virtual meshes)."""
    return jax.default_backend() not in ("tpu", "axon")


import os as _os

# In-kernel matmul precision knobs (read once at import; probe scripts run
# each mode in a subprocess). Production default is DEFAULT — the single-
# pass bf16-operand f32-accumulate MXU mode the round-3 loop-level parity
# rehearsal (PARITY.md) and the 1M-iteration / 512² quality runs
# (BENCH_NOTES.md) were validated with. Throughput cost and end-to-end
# quality of each mode are recorded in BENCH_NOTES.md "In-kernel
# precision" (measured by tools/perf/pe_precision_probe.py). The f32
# XLA parity path keeps Precision.HIGHEST in its own ops
# (ops/encoding.py, render/pipeline.py) where bit-parity is the contract.
# NOTE: the fused resample's cdf matmul is pinned at HIGHEST regardless of
# these knobs — it carries an exact-match contract with ops/sampling
# (see _resample_kernel).
_PE_ALLOWED = ("DEFAULT", "HIGHEST", "SPLIT")
_CUMPROD_ALLOWED = ("DEFAULT", "HIGH", "HIGHEST")
_PE_MODE = _os.environ.get("NERFACE_PE_PRECISION", "DEFAULT")
if _PE_MODE not in _PE_ALLOWED:
    raise ValueError(
        f"NERFACE_PE_PRECISION={_PE_MODE!r} is not a valid PE precision "
        f"mode; allowed values: {', '.join(_PE_ALLOWED)}"
    )
_CUMPROD_MODE = _os.environ.get("NERFACE_CUMPROD_PRECISION", "DEFAULT")
if _CUMPROD_MODE not in _CUMPROD_ALLOWED:
    raise ValueError(
        f"NERFACE_CUMPROD_PRECISION={_CUMPROD_MODE!r} is not a valid "
        f"lax.Precision name; allowed values: {', '.join(_CUMPROD_ALLOWED)}"
    )
CUMPROD_PRECISION = getattr(jax.lax.Precision, _CUMPROD_MODE)


def check_pe_mode(log_sampling_xyz: bool) -> None:
    """SPLIT's f32-grade-argument guarantee relies on the encoding matrix
    C having power-of-two entries (exact in bf16), which holds only for
    log-sampled frequency bands; linspace bands (log_sampling=False) round
    in the bf16 operand pass and silently lose the claimed accuracy."""
    if _PE_MODE == "SPLIT" and not log_sampling_xyz:
        raise ValueError(
            "NERFACE_PE_PRECISION=SPLIT requires log-sampled xyz frequency "
            "bands (powers of two, exact in bf16); this model uses "
            "log_sampling=False linspace bands. Use NERFACE_PE_PRECISION="
            "HIGHEST for exact arguments with linear bands."
        )


def _dot(a, b):
    """bf16 MXU matmul with f32 accumulation."""
    return jax.lax.dot_general(
        a.astype(jnp.bfloat16),
        b,
        (((a.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _encode_in_kernel(x3, C, phase):
    """Positional encoding in VMEM: enc = sin(x @ C + phase).

    Precision (NERFACE_PE_PRECISION, default DEFAULT — see knob note
    above): the MXU's single-pass f32 matmul rounds operands to bf16,
    which at the 2^9 top band perturbs the sin argument by up to
    ~0.35 rad — but top-band PE features feed a bf16 network, and the
    end-to-end evidence (bf16 rehearsal, 512² runs) was all gathered in
    this mode; HIGHEST (6 passes) measures −6% train step for no
    measured output change. SPLIT is the middle ground kept for probing:
    a two-pass bf16 split of x3 (hi = bf16(x3), lo = x3 − hi) gives
    f32-grade arguments (~0.004 rad top-band error) at −2.6% step cost —
    valid only with log-sampled bands, where C's entries are powers of
    two and exact in bf16 (check_pe_mode rejects SPLIT otherwise)."""
    dims = (((1,), (0,)), ((), ()))
    if _PE_MODE == "SPLIT":
        hi = x3.astype(jnp.bfloat16).astype(jnp.float32)
        lo = x3 - hi
        t = jax.lax.dot_general(
            hi, C, dims, preferred_element_type=jnp.float32
        ) + jax.lax.dot_general(
            lo, C, dims, preferred_element_type=jnp.float32
        )
    else:
        t = jax.lax.dot_general(
            x3, C, dims, preferred_element_type=jnp.float32,
            precision=getattr(jax.lax.Precision, _PE_MODE),
        )
    return jnp.sin(t + phase)


def _trunk_forward(x3, enc, dir_c, cond0, cond3, W, n_rays, n_samples):
    """Shared fwd math. x3: (TILE, 3) raw points; enc: (TILE, 2·N·3) their
    sin/cos encoding; dir_c: (TR, 128); cond0/cond3: (1, 256). W: dict of
    bf16 (in, out) weights + f32 biases. Returns every activation needed by
    the backward pass."""
    tile = x3.shape[0]
    h0 = jax.nn.relu(_dot(x3, W["w0a"]) + _dot(enc, W["w0b"]) + cond0)
    h1 = jax.nn.relu(_dot(h0, W["w1"]) + W["b1"])
    h2 = jax.nn.relu(_dot(h1, W["w2"]) + W["b2"])
    h3 = jax.nn.relu(
        _dot(x3, W["w3xa"]) + _dot(enc, W["w3xb"]) + _dot(h2, W["w3h"]) + cond3
    )
    h4 = jax.nn.relu(_dot(h3, W["w4"]) + W["b4"])
    if "w5" in W:  # paper model: one more post-skip layer than smaller
        h5 = jax.nn.relu(_dot(h4, W["w5"]) + W["b5"])
    else:
        h5 = h4
    feat = _dot(h5, W["wf"]) + W["bf"]
    alpha = _dot(feat, W["wa"]) + W["ba"]
    hd_pre = _dot(feat, W["wd0"]) + W["bd0"]
    hd_pre = (
        hd_pre.reshape(n_rays, n_samples, DIR_HIDDEN) + dir_c[:, None, :]
    ).reshape(tile, DIR_HIDDEN)
    x0 = jax.nn.relu(hd_pre)
    x1 = jax.nn.relu(_dot(x0, W["wd1"]) + W["bd1"])
    x2 = jax.nn.relu(_dot(x1, W["wd2"]) + W["bd2"])
    rgb = _dot(x2, W["wrgb"]) + W["brgb"]
    # Activations saved for backward in bf16: they are only consumed as
    # bf16 dot operands and (> 0) relu masks, and it halves VMEM pressure.
    # x0 = relu(hd_pre) is NOT saved — the backward recomputes it from
    # hd_pre with one VPU max, which buys a full (TILE, 128) slot of VMEM
    # toward bigger ray tiles.
    bf = jnp.bfloat16
    acts = dict(
        h0=h0.astype(bf), h1=h1.astype(bf), h2=h2.astype(bf),
        h3=h3.astype(bf), h4=h4.astype(bf), h5=h5.astype(bf),
        feat=feat.astype(bf), hd_pre=hd_pre.astype(bf),
        x1=x1.astype(bf), x2=x2.astype(bf),
    )
    return rgb, alpha, acts


def _unpack_weight_refs(refs, small: bool = False):
    """Kernel refs -> dict. Weights bf16 as-is; biases f32 rows."""
    wn, bn = _names(small)
    W = {}
    i = 0
    for name in wn:
        W[name] = refs[i][:]
        i += 1
    for name in bn:
        W[name] = refs[i][:]
        i += 1
    return W, i


def _points_in_kernel(ro_ref, rd_ref, z_ref, n_rays, n_samples):
    """pts = ro + rd·z computed in VMEM — materializing the (R, S, 3)
    points array in HBM costs ~40 ms/frame at eval scale because the
    3-wide minor dim pads to 128 lanes."""
    ro = ro_ref[:]
    rd = rd_ref[:]
    z = z_ref[:]
    pts = ro[:, None, :] + rd[:, None, :] * z[:, :, None]
    return pts.reshape(n_rays * n_samples, 3)


def _fwd_kernel(n_rays, n_samples, small, *refs):
    ro_ref, rd_ref, z_ref, dir_ref, cond0_ref, cond3_ref, C_ref, phase_ref = refs[:8]
    W, used = _unpack_weight_refs(refs[8:], small)
    out_ref = refs[8 + used]

    x3 = _points_in_kernel(ro_ref, rd_ref, z_ref, n_rays, n_samples)
    enc = _encode_in_kernel(x3, C_ref[:], phase_ref[:])
    rgb, alpha, _ = _trunk_forward(
        x3, enc, dir_ref[:], cond0_ref[:], cond3_ref[:], W, n_rays, n_samples
    )
    out = jnp.concatenate([rgb, alpha], axis=-1)
    out_ref[:] = out.reshape(n_rays, n_samples, 4)


def _trunk_backward(x3, enc, a, W, g_rgb, g_alpha, n_rays, n_samples):
    """Shared backward math through the trunk + heads. x3/enc as in
    `_trunk_forward`; `a` its saved activations; g_rgb (tile, 3) and
    g_alpha (tile, 1) the head cotangents. Returns (grads_w, grads_b,
    d_cond0, d_cond3, d_dir) where d_dir is the per-ray (n_rays, 128)
    dir-contribution gradient."""
    enc_bf = enc.astype(jnp.bfloat16)

    def dot_t_acc(x, gy):
        # dW = x^T @ gy, bf16 operands, f32 accumulation
        return jax.lax.dot_general(
            x.astype(jnp.bfloat16),
            gy.astype(jnp.bfloat16),
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def m(x):
        # relu mask in f32 — Mosaic cannot lower bf16 cmpf
        return x.astype(jnp.float32) > 0

    def dot_bt(gy, w):
        # dx = gy @ W^T
        return jax.lax.dot_general(
            gy.astype(jnp.bfloat16),
            w,
            (((gy.ndim - 1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    grads_w = {}
    grads_b = {}

    # rgb head
    grads_w["wrgb"] = dot_t_acc(a["x2"], g_rgb)
    grads_b["brgb"] = jnp.sum(g_rgb, axis=0, keepdims=True)
    gx2 = dot_bt(g_rgb, W["wrgb"]) * m(a["x2"])
    grads_w["wd2"] = dot_t_acc(a["x1"], gx2)
    grads_b["bd2"] = jnp.sum(gx2, axis=0, keepdims=True)
    gx1 = dot_bt(gx2, W["wd2"]) * m(a["x1"])
    # x0 = relu(hd_pre), recomputed (bf16 max) instead of stored
    x0 = jnp.maximum(a["hd_pre"], jnp.zeros((), a["hd_pre"].dtype))
    grads_w["wd1"] = dot_t_acc(x0, gx1)
    grads_b["bd1"] = jnp.sum(gx1, axis=0, keepdims=True)
    gx0 = dot_bt(gx1, W["wd1"]) * m(a["hd_pre"])
    grads_w["wd0"] = dot_t_acc(a["feat"], gx0)
    grads_b["bd0"] = jnp.sum(gx0, axis=0, keepdims=True)
    # per-ray dir contribution grad: sum over samples
    d_dir = jnp.sum(gx0.reshape(n_rays, n_samples, DIR_HIDDEN), axis=1)

    # sigma head
    grads_w["wa"] = dot_t_acc(a["feat"], g_alpha)
    grads_b["ba"] = jnp.sum(g_alpha, axis=0, keepdims=True)

    gfeat = dot_bt(g_alpha, W["wa"]) + dot_bt(gx0, W["wd0"])
    grads_w["wf"] = dot_t_acc(a["h5"], gfeat)
    grads_b["bf"] = jnp.sum(gfeat, axis=0, keepdims=True)

    if "w5" in W:
        gh5 = dot_bt(gfeat, W["wf"]) * m(a["h5"])
        grads_w["w5"] = dot_t_acc(a["h4"], gh5)
        grads_b["b5"] = jnp.sum(gh5, axis=0, keepdims=True)
        gh4 = dot_bt(gh5, W["w5"]) * m(a["h4"])
    else:  # smaller variant: fc_feat consumes h4 directly
        gh4 = dot_bt(gfeat, W["wf"]) * m(a["h4"])
    grads_w["w4"] = dot_t_acc(a["h3"], gh4)
    grads_b["b4"] = jnp.sum(gh4, axis=0, keepdims=True)
    gh3 = dot_bt(gh4, W["w4"]) * m(a["h3"])
    grads_w["w3xa"] = dot_t_acc(x3, gh3)
    grads_w["w3xb"] = dot_t_acc(enc_bf, gh3)
    grads_w["w3h"] = dot_t_acc(a["h2"], gh3)
    d_cond3 = jnp.sum(gh3, axis=0, keepdims=True)
    gh2 = dot_bt(gh3, W["w3h"]) * m(a["h2"])
    grads_w["w2"] = dot_t_acc(a["h1"], gh2)
    grads_b["b2"] = jnp.sum(gh2, axis=0, keepdims=True)
    gh1 = dot_bt(gh2, W["w2"]) * m(a["h1"])
    grads_w["w1"] = dot_t_acc(a["h0"], gh1)
    grads_b["b1"] = jnp.sum(gh1, axis=0, keepdims=True)
    gh0 = dot_bt(gh1, W["w1"]) * m(a["h0"])
    grads_w["w0a"] = dot_t_acc(x3, gh0)
    grads_w["w0b"] = dot_t_acc(enc_bf, gh0)
    d_cond0 = jnp.sum(gh0, axis=0, keepdims=True)
    return grads_w, grads_b, d_cond0, d_cond3, d_dir


def _bwd_kernel(n_rays, n_samples, small, *refs):
    ro_ref, rd_ref, z_ref, dir_ref, cond0_ref, cond3_ref, C_ref, phase_ref = refs[:8]
    wn, bn = _names(small)
    W, used = _unpack_weight_refs(refs[8:], small)
    g_ref = refs[8 + used]
    outs = refs[9 + used:]
    # Output order: dW per weight name, db per bias name, dcond0, dcond3,
    # ddir (per-tile block).
    d_w = {name: outs[i] for i, name in enumerate(wn)}
    nw = len(wn)
    d_b = {name: outs[nw + i] for i, name in enumerate(bn)}
    nb = nw + len(bn)
    d_cond0_ref, d_cond3_ref, d_dir_ref = outs[nb], outs[nb + 1], outs[nb + 2]

    tile = n_rays * n_samples
    x3 = _points_in_kernel(ro_ref, rd_ref, z_ref, n_rays, n_samples)
    enc = _encode_in_kernel(x3, C_ref[:], phase_ref[:])
    _, _, a = _trunk_forward(
        x3, enc, dir_ref[:], cond0_ref[:], cond3_ref[:], W, n_rays, n_samples
    )

    g = g_ref[:].reshape(tile, 4)
    grads_w, grads_b, d_cond0, d_cond3, d_dir = _trunk_backward(
        x3, enc, a, W, g[:, :3], g[:, 3:4], n_rays, n_samples
    )
    d_dir_ref[:] = d_dir

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


def _const_spec(shape):
    return pl.BlockSpec(shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)


def _weight_specs(d_enc, small: bool = False):
    wn, bn = _names(small)
    shapes = _weight_shapes(d_enc)
    return [_const_spec(shapes[n]) for n in wn + bn]


def _weight_shapes(d_enc):
    return {
        "w0a": (3, HIDDEN),
        "w0b": (d_enc, HIDDEN),
        "w1": (HIDDEN, HIDDEN),
        "w2": (HIDDEN, HIDDEN),
        "w3xa": (3, HIDDEN),
        "w3xb": (d_enc, HIDDEN),
        "w3h": (HIDDEN, HIDDEN),
        "w4": (HIDDEN, HIDDEN),
        "w5": (HIDDEN, HIDDEN),
        "wf": (HIDDEN, HIDDEN),
        "wa": (HIDDEN, 1),
        "wd0": (HIDDEN, DIR_HIDDEN),
        "wd1": (DIR_HIDDEN, DIR_HIDDEN),
        "wd2": (DIR_HIDDEN, DIR_HIDDEN),
        "wrgb": (DIR_HIDDEN, 3),
        "b1": (1, HIDDEN),
        "b2": (1, HIDDEN),
        "b4": (1, HIDDEN),
        "b5": (1, HIDDEN),
        "bf": (1, HIDDEN),
        "ba": (1, 1),
        "bd0": (1, DIR_HIDDEN),
        "bd1": (1, DIR_HIDDEN),
        "bd2": (1, DIR_HIDDEN),
        "brgb": (1, 3),
    }


def _pick_rays_per_tile(n_rays: int, n_samples: int, target: int = 1024) -> int:
    """Ray-tile size: a multiple of 8 (f32 sublane tiling on the 2-D
    per-ray blocks) dividing n_rays, with TR*n_samples around `target`.

    Backward tiles stay near 1024 samples (11 live activations + weight
    gradients must fit VMEM); forward-only tiles go to ~2048 (only 2-3
    activations live), which matters for full-frame eval where a small
    tile turns into thousands of grid steps of fixed overhead."""
    tr = max(8, (target // n_samples // 8) * 8)
    while tr > 8 and n_rays % tr:
        tr -= 8
    return tr


def _pick_fwd_rays_per_tile(n_rays: int, n_samples: int) -> int:
    return _pick_rays_per_tile(n_rays, n_samples, target=4096)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _fused(n_samples: int, rays_per_tile: int, small: bool, ro, rd, z, dir_c, cond0, cond3, C, phase, *weights):
    out, _ = _fused_fwd(
        n_samples, rays_per_tile, small, ro, rd, z, dir_c, cond0, cond3, C,
        phase, *weights
    )
    return out


def _ray_specs(tr, n_samples):
    return [
        pl.BlockSpec((tr, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tr, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tr, n_samples), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tr, DIR_HIDDEN), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]


def _fused_fwd(n_samples, rays_per_tile, small, ro, rd, z, dir_c, cond0, cond3, C, phase, *weights):
    n_rays = ro.shape[0]
    d_enc = C.shape[-1]
    # forward-only: larger tiles amortize per-grid-step overhead
    tr = _pick_fwd_rays_per_tile(n_rays, n_samples)
    if n_rays % tr:
        tr = rays_per_tile
    grid = (n_rays // tr,)

    in_specs = _ray_specs(tr, n_samples) + [
        _const_spec((1, HIDDEN)),
        _const_spec((1, HIDDEN)),
        _const_spec((3, d_enc)),
        _const_spec((1, d_enc)),
    ] + _weight_specs(d_enc, small)

    out = pl.pallas_call(
        functools.partial(_fwd_kernel, tr, n_samples, small),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (tr, n_samples, 4), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_rays, n_samples, 4), jnp.float32),
        interpret=_interpret(),
    )(ro, rd, z, dir_c, cond0, cond3, C, phase, *weights)
    return out, (ro, rd, z, dir_c, cond0, cond3, C, phase, weights)


def _fused_bwd(n_samples, rays_per_tile, small, residuals, g):
    ro, rd, z, dir_c, cond0, cond3, C, phase, weights = residuals
    n_rays = ro.shape[0]
    d_enc = C.shape[-1]
    tr = rays_per_tile
    grid = (n_rays // tr,)
    shapes = _weight_shapes(d_enc)

    in_specs = _ray_specs(tr, n_samples) + [
        _const_spec((1, HIDDEN)),
        _const_spec((1, HIDDEN)),
        _const_spec((3, d_enc)),
        _const_spec((1, d_enc)),
    ] + _weight_specs(d_enc, small) + [
        pl.BlockSpec((tr, n_samples, 4), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
    ]

    wn, bn = _names(small)
    out_shapes = (
        [jax.ShapeDtypeStruct(shapes[n], jnp.float32) for n in wn]
        + [jax.ShapeDtypeStruct(shapes[n], jnp.float32) for n in bn]
        + [
            jax.ShapeDtypeStruct((1, HIDDEN), jnp.float32),  # d_cond0
            jax.ShapeDtypeStruct((1, HIDDEN), jnp.float32),  # d_cond3
            jax.ShapeDtypeStruct((n_rays, DIR_HIDDEN), jnp.float32),  # d_dir
        ]
    )
    out_specs = (
        [_const_spec(shapes[n]) for n in wn]
        + [_const_spec(shapes[n]) for n in bn]
        + [
            _const_spec((1, HIDDEN)),
            _const_spec((1, HIDDEN)),
            pl.BlockSpec((tr, DIR_HIDDEN), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ]
    )

    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, tr, n_samples, small),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=_interpret(),
    )(ro, rd, z, dir_c, cond0, cond3, C, phase, *weights, g)

    nw = len(wn)
    nb = nw + len(bn)
    d_weights = tuple(
        outs[i].astype(w.dtype)
        for i, w in zip(range(nb), weights)
    )
    d_cond0 = outs[nb]
    d_cond3 = outs[nb + 1]
    d_dir = outs[nb + 2]
    # ray geometry carries no trainable grads
    return (
        jnp.zeros_like(ro), jnp.zeros_like(rd), jnp.zeros_like(z),
        d_dir, d_cond0, d_cond3,
        jnp.zeros_like(C), jnp.zeros_like(phase),
    ) + d_weights


_fused.defvjp(_fused_fwd, _fused_bwd)


def _layout_weights(params, cond, d_pe, dc, small, cast=None):
    """Torch-layout params + per-frame cond -> (cond0, cond3, weights tuple)
    in kernel layout: transposed (in, out) matrices ordered per
    `_names(small)`, biases as (1, out) rows, conditioning columns of the
    two skip layers folded into cond0/cond3. `cast` (e.g. bf16) applies to
    the matrix weights only; None keeps f32 (the differentiable prefold).
    """

    def w(name):
        return params[name + ".weight"]

    def b(name):
        return params[name + ".bias"]

    cond0 = (w("layers_xyz.0")[:, d_pe:d_pe + dc] @ cond + b("layers_xyz.0"))[None, :]
    cond3 = (w("layers_xyz.3")[:, d_pe:d_pe + dc] @ cond + b("layers_xyz.3"))[None, :]
    mats = [
        w("layers_xyz.0")[:, :3].T,           # w0a (xyz rows)
        w("layers_xyz.0")[:, 3:d_pe].T,       # w0b (enc rows)
        w("layers_xyz.1").T,
        w("layers_xyz.2").T,
        w("layers_xyz.3")[:, :3].T,           # w3xa
        w("layers_xyz.3")[:, 3:d_pe].T,       # w3xb
        w("layers_xyz.3")[:, d_pe + dc:].T,   # w3h
        w("layers_xyz.4").T,
    ]
    biases = [
        b("layers_xyz.1")[None, :],
        b("layers_xyz.2")[None, :],
        b("layers_xyz.4")[None, :],
    ]
    if not small:
        mats.append(w("layers_xyz.5").T)
        biases.append(b("layers_xyz.5")[None, :])
    mats += [
        w("fc_feat").T,
        w("fc_alpha").T,
        w("layers_dir.0")[:, :HIDDEN].T,
        w("layers_dir.1").T,
        w("layers_dir.2").T,
        w("fc_rgb").T,
    ]
    biases += [
        b("fc_feat")[None, :],
        b("fc_alpha")[None, :],
        b("layers_dir.0")[None, :],
        b("layers_dir.1")[None, :],
        b("layers_dir.2")[None, :],
        b("fc_rgb")[None, :],
    ]
    if cast is not None:
        mats = [m.astype(cast) for m in mats]
    return cond0, cond3, tuple(mats) + tuple(biases)


def fused_paper_mlp(
    params,
    ray_origins: jnp.ndarray,   # (R, 3) f32
    ray_directions: jnp.ndarray,  # (R, 3) f32
    z_vals: jnp.ndarray,        # (R, S) f32 sample depths
    dir_contrib: jnp.ndarray,   # (R, 128) f32 — pe_dir @ W_dir0[:, 256:].T
    cond: jnp.ndarray,          # (108,) = [expr/3; latent] per-frame vector
    num_encoding_fn_xyz: int = 10,
    log_sampling_xyz: bool = True,
    rays_per_tile: int = 0,
    small: bool = False,
) -> jnp.ndarray:
    """Fused forward of ConditionalBlendshapePaperNeRFModel (or, with
    `small`, ConditionalBlendshapePaperSmallerNeRFModel — one fewer
    post-skip trunk layer, `models.py:266-338`); returns (R, S, 4)
    radiance [rgb, sigma]. Sample positions (ro + rd·z) AND their
    positional encoding are computed inside the kernel — neither the
    (R, S, 3) points nor the (R, S, 63) PE array ever exists in HBM.
    Differentiable w.r.t. params and cond (and hence the latent-code
    table). The smaller variant's dir-branch expression input must be
    pre-folded into `dir_contrib` by the caller."""
    from nerface_tpu.ops.encoding import _encoding_matrix

    check_pe_mode(log_sampling_xyz)
    n_rays, n_samples = z_vals.shape
    if rays_per_tile <= 0:
        rays_per_tile = _pick_rays_per_tile(n_rays, n_samples)
    dc = cond.shape[-1]
    d_pe = 3 + 2 * num_encoding_fn_xyz * 3

    C_np, phase_np = _encoding_matrix(3, num_encoding_fn_xyz, log_sampling_xyz)
    C = jnp.asarray(C_np)
    phase = jnp.asarray(phase_np)[None, :]

    cond0, cond3, weights = _layout_weights(
        params, cond, d_pe, dc, small, cast=jnp.bfloat16
    )
    return _fused(
        n_samples, rays_per_tile, small, ray_origins, ray_directions, z_vals,
        dir_contrib, cond0, cond3, C, phase, *weights
    )


# -- fused render (forward-only): MLP + volume compositing in one kernel ----

def _render_kernel(n_rays, n_samples, small, has_bg, white_background,
                   out_weights, *refs):
    """Evaluate the radiance field AND composite it per ray tile — the
    (R, S, 4) radiance never exists in HBM. Eval-path only (no VJP; sigma
    noise must be 0). cumprod_exclusive is computed as
    exp(log(1-alpha+1e-10) @ U) with U strictly upper triangular — a tiny
    (S, S) MXU matmul instead of a scan, which Mosaic cannot lower.
    Outputs are separate refs per map (Mosaic rejects packing maps of
    different widths into one concatenated output)."""
    ro_ref, rd_ref, z_ref, dir_ref, cond0_ref, cond3_ref, C_ref, phase_ref = refs[:8]
    i = 8
    if has_bg:
        bg_ref = refs[i]
        i += 1
    tri_ref = refs[i]
    i += 1
    W, used = _unpack_weight_refs(refs[i:], small)
    rgb_ref, disp_ref, acc_ref, depth_ref, bgw_ref = refs[i + used:i + used + 5]
    w_ref = refs[i + used + 5] if out_weights else None

    x3 = _points_in_kernel(ro_ref, rd_ref, z_ref, n_rays, n_samples)
    enc = _encode_in_kernel(x3, C_ref[:], phase_ref[:])
    rgb_raw, alpha_raw, _ = _trunk_forward(
        x3, enc, dir_ref[:], cond0_ref[:], cond3_ref[:], W, n_rays, n_samples
    )
    rgb = rgb_raw.reshape(n_rays, n_samples, 3)
    sigma = alpha_raw.reshape(n_rays, n_samples)

    z = z_ref[:]
    rd = rd_ref[:]
    # dists: z-deltas, 1e10 on the last sample, scaled by |rd|
    # (`volume_rendering_utils.py:17-27`)
    d = jnp.concatenate(
        [z[:, 1:] - z[:, :-1], jnp.full((n_rays, 1), 1e10, z.dtype)], axis=-1
    )
    rd_norm = jnp.sqrt(jnp.sum(rd * rd, axis=-1, keepdims=True))
    d = d * rd_norm

    is_last = (
        jax.lax.broadcasted_iota(jnp.int32, (n_rays, n_samples), 1)
        == n_samples - 1
    )
    rgb_act = jax.nn.sigmoid(rgb)
    if has_bg:
        # background injection: the LAST sample's rgb is the raw background
        # pixel, no sigmoid (`train_utils.py:95-96`, `vru.py:29-31`).
        # Arithmetic select: Mosaic can't insert a minor dim on the bool mask.
        m_last = is_last.astype(jnp.float32)[..., None]
        rgb_act = rgb_act * (1.0 - m_last) + bg_ref[:][:, None, :] * m_last
    sigma_a = jax.nn.relu(sigma) + jnp.where(is_last, 1e-6, 0.0)

    # one_minus_alpha computed directly as exp(-sigma*d): writing it as
    # `1.0 - alpha + 1e-10` lets Mosaic reassociate to (1+1e-10) - alpha,
    # which rounds to exactly 0 when alpha == 1 and log() returns -inf
    one_minus_alpha = jnp.exp(-sigma_a * d)
    alpha = 1.0 - one_minus_alpha
    log_t = jnp.log(one_minus_alpha + 1e-10)
    # exclusive cumprod via strictly-upper-triangular matmul; HIGHEST so
    # log_t isn't bf16-rounded before the contraction (the default
    # single-pass f32 matmul costs up to ~0.1-1% of transmittance)
    trans = jnp.exp(
        jax.lax.dot_general(
            log_t, tri_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=CUMPROD_PRECISION,
        )
    )
    weights = alpha * trans

    rgb_map = jnp.sum(weights[..., None] * rgb_act, axis=1)
    depth_map = jnp.sum(weights * z, axis=1, keepdims=True)
    acc_map = jnp.sum(weights, axis=1, keepdims=True)
    disp_map = 1.0 / jnp.maximum(
        1e-10, depth_map / jnp.maximum(acc_map, 1e-38)
    )
    if white_background:
        rgb_map = rgb_map + (1.0 - acc_map)

    rgb_ref[:] = rgb_map
    disp_ref[:] = disp_map
    acc_ref[:] = acc_map
    depth_ref[:] = depth_map
    bgw_ref[:] = weights[:, n_samples - 1:n_samples]
    if out_weights:
        # full per-sample weights — needed by the coarse pass for the
        # hierarchical inverse-CDF resample
        w_ref[:] = weights


def fused_paper_render(
    params,
    ray_origins: jnp.ndarray,
    ray_directions: jnp.ndarray,
    z_vals: jnp.ndarray,
    dir_contrib: jnp.ndarray,
    cond: jnp.ndarray,
    background=None,
    white_background: bool = False,
    num_encoding_fn_xyz: int = 10,
    log_sampling_xyz: bool = True,
    out_weights: bool = False,
    small: bool = False,
):
    """Forward-only fused render: radiance evaluation + alpha compositing
    per ray tile. Returns dict(rgb (R,3), disp, acc, depth, bg_weight
    (R,)) — plus per-sample "weights" (R, S) when `out_weights` (the
    coarse pass needs them for resampling). Semantics identical to
    inject_background + volume_render_radiance_field at noise_std=0."""
    from nerface_tpu.ops.encoding import _encoding_matrix

    check_pe_mode(log_sampling_xyz)
    n_rays, n_samples = z_vals.shape
    tr = _pick_fwd_rays_per_tile(n_rays, n_samples)
    if n_rays % tr:
        tr = _pick_rays_per_tile(n_rays, n_samples)
    dc = cond.shape[-1]
    d_pe = 3 + 2 * num_encoding_fn_xyz * 3

    C_np, phase_np = _encoding_matrix(3, num_encoding_fn_xyz, log_sampling_xyz)
    C = jnp.asarray(C_np)
    phase = jnp.asarray(phase_np)[None, :]
    # strictly upper triangular: column i sums log-terms j < i
    tri = jnp.triu(jnp.ones((n_samples, n_samples), jnp.float32), k=1)

    cond0, cond3, weights = _layout_weights(
        params, cond, d_pe, dc, small, cast=jnp.bfloat16
    )

    has_bg = background is not None
    grid = (n_rays // tr,)
    d_enc = C.shape[-1]
    in_specs = _ray_specs(tr, n_samples) + [
        _const_spec((1, HIDDEN)),
        _const_spec((1, HIDDEN)),
        _const_spec((3, d_enc)),
        _const_spec((1, d_enc)),
    ]
    args = [ray_origins, ray_directions, z_vals, dir_contrib, cond0, cond3,
            C, phase]
    if has_bg:
        in_specs.append(
            pl.BlockSpec((tr, 3), lambda i: (i, 0), memory_space=pltpu.VMEM)
        )
        args.append(background)
    in_specs.append(_const_spec((n_samples, n_samples)))
    args.append(tri)
    in_specs += _weight_specs(d_enc, small)
    args += list(weights)

    def _out(width):
        return (
            pl.BlockSpec((tr, width), lambda i: (i, 0), memory_space=pltpu.VMEM),
            jax.ShapeDtypeStruct((n_rays, width), jnp.float32),
        )

    outs = [_out(3), _out(1), _out(1), _out(1), _out(1)]
    if out_weights:
        outs.append(_out(n_samples))
    out_specs, out_shapes = zip(*outs)
    res = pl.pallas_call(
        functools.partial(
            _render_kernel, tr, n_samples, small, has_bg, white_background,
            out_weights,
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=list(out_specs),
        out_shape=list(out_shapes),
        interpret=_interpret(),
    )(*args)
    rgb, disp, acc, depth, bgw = res[:5]
    out = {
        "rgb": rgb,
        "disp": disp[:, 0],
        "acc": acc[:, 0],
        "depth": depth[:, 0],
        "bg_weight": bgw[:, 0],
    }
    if out_weights:
        out["weights"] = res[5]
    return out


# -- fused hierarchical resample: inverse-CDF draw + sorted merge ------------

def _resample_kernel(n_coarse, n_fine, sorted_u, *refs):
    """Per ray tile: CDF from coarse weights, inverse-CDF draw at the given
    u's, and the sorted union with the coarse depths — no HBM one-hots, no
    general sort. Matches ops/sampling.sample_pdf + merge_sorted_zvals
    exactly (same u's are passed in, so RNG semantics are identical).

    Techniques (Mosaic has no scan/sort/gather): cumsum as a triangular
    matmul; searchsorted as compare+sum; gathers on the monotone cdf/bins
    via masked max/min. The merge: with `sorted_u` (the det/validation
    path — u is a linspace, so the inverse-CDF samples come out sorted)
    both lists are sorted and ranks are two one-sided counts
    (rank_zi = i + #{s < z_i}, rank_sq = q + #{z <= s_q}); otherwise the
    general counting rank (rank_i = #{v_j < v_i} + ties with j < i).
    Either way the placement is a masked-sum scatter."""
    z_ref, w_ref, u_ref, tri_ref = refs[:4]
    out_ref = refs[4]

    z = z_ref[:]                       # (tr, Sc)
    u = u_ref[:]                       # (tr, Sf) or (1, Sf) det broadcast
    if u.shape[0] == 1:
        u = jnp.broadcast_to(u, (z.shape[0], u.shape[-1]))
    w = w_ref[:][:, 1:-1] + 1e-5       # (tr, Sc-2) — sample_pdf's weights[1:-1]
    pdf = w / jnp.sum(w, axis=-1, keepdims=True)
    # cdf = [0, cumsum(pdf)] as pdf @ U with U[j, i] = 1 if j < i.
    # Pinned at HIGHEST (not CUMPROD_PRECISION): this site carries the
    # exact-match contract with ops/sampling.sample_pdf stated above —
    # a bf16-operand pass rounds the cdf by ~1e-3..4e-3, which shifts
    # searchsorted bins and diverges fine-sample placement from the XLA
    # sampler. It is also the cheapest of the three precision sites.
    cdf = jax.lax.dot_general(
        pdf, tri_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )                                   # (tr, Sc-1)
    bins = 0.5 * (z[:, 1:] + z[:, :-1])  # (tr, Sc-1) z-midpoints

    # searchsorted(side='right'): inds in [1, Sc-1]
    cmp = (u[:, :, None] >= cdf[:, None, :]).astype(jnp.float32)  # (tr,Sf,Sc-1)
    big = jnp.float32(1e10)

    def masked_max(x):
        # x monotone nonneg: max over selected == value at index inds-1
        return jnp.max(cmp * x[:, None, :], axis=-1)

    def masked_min(x):
        # min over ~selected == value at index inds; empty -> x[..., -1]
        m = jnp.min((1.0 - cmp) * x[:, None, :] + cmp * big, axis=-1)
        return jnp.minimum(m, x[:, -1:])

    cdf_below = masked_max(cdf)
    bins_below = masked_max(bins)
    cdf_above = masked_min(cdf)
    bins_above = masked_min(bins)

    denom = cdf_above - cdf_below
    denom = jnp.where(denom < 1e-5, jnp.ones_like(denom), denom)
    t = (u - cdf_below) / denom
    z_samples = bins_below + t * (bins_above - bins_below)  # (tr, Sf)

    s_total = n_coarse + n_fine
    kk = jax.lax.broadcasted_iota(jnp.int32, (1, 1, s_total), 2)
    if sorted_u:
        # both lists sorted: one-sided counts, z wins ties (< vs <=) so
        # ranks are a permutation; scatter each list at its rank.
        n_lt = jnp.sum(
            (z_samples[:, None, :] < z[:, :, None]).astype(jnp.float32),
            axis=-1,
        ).astype(jnp.int32)                                 # (tr, Sc)
        rank_z = jax.lax.broadcasted_iota(jnp.int32, z.shape, 1) + n_lt
        n_le = jnp.sum(
            (z[:, None, :] <= z_samples[:, :, None]).astype(jnp.float32),
            axis=-1,
        ).astype(jnp.int32)                                 # (tr, Sf)
        rank_s = (
            jax.lax.broadcasted_iota(jnp.int32, z_samples.shape, 1) + n_le
        )
        sel_z = (rank_z[:, :, None] == kk).astype(jnp.float32)
        sel_s = (rank_s[:, :, None] == kk).astype(jnp.float32)
        out_ref[:] = jnp.sum(sel_z * z[:, :, None], axis=1) + jnp.sum(
            sel_s * z_samples[:, :, None], axis=1
        )
    else:
        # sorted union of z (sorted) and z_samples (unsorted)
        v = jnp.concatenate([z, z_samples], axis=-1)        # (tr, S)
        less = (v[:, None, :] < v[:, :, None]).astype(jnp.float32)
        eq = (v[:, None, :] == v[:, :, None]).astype(jnp.float32)
        jj = jax.lax.broadcasted_iota(jnp.int32, (s_total, s_total), 1)
        ii = jax.lax.broadcasted_iota(jnp.int32, (s_total, s_total), 0)
        tie = (jj < ii).astype(jnp.float32)                 # j < i
        rank = jnp.sum(less + eq * tie[None], axis=-1).astype(jnp.int32)
        sel = (rank[:, :, None] == kk).astype(jnp.float32)  # (tr, S_i, S_k)
        out_ref[:] = jnp.sum(sel * v[:, :, None], axis=1)


def fused_resample(
    z_vals: jnp.ndarray,     # (R, Sc) coarse depths (sorted)
    weights: jnp.ndarray,    # (R, Sc) coarse compositing weights
    u: jnp.ndarray,          # (R, Sf) draws in [0, 1], or (Sf,) shared
    sorted_u: bool = False,  # True when u is nondecreasing per ray (det)
) -> jnp.ndarray:
    """Hierarchical resample + sorted merge in one kernel; returns
    (R, Sc+Sf) depths. Gradient-stopped like the reference (detached
    samples, `train_utils.py:124`) — forward-only.

    Two regimes:
    * `sorted_u=True` — the det path (validation/eval: u is a linspace,
      passed once as (Sf,) and broadcast in-kernel, costing no HBM).
      Samples come out sorted, so the merge is two one-sided rank counts
      + scatter.
    * `sorted_u=False` — general draws; the O(S²) counting-rank merge.

    EXPERIMENTAL / UNWIRED: both regimes are parity-exact vs
    sample_pdf+merge (4e-6 on chip) but measured SLOWER than the XLA
    path at eval scale (53.5 vs 10.0 ms at 65k rays — BENCH_NOTES.md
    "Fused resample"), so NOTHING in render/ or eval/ calls this; the
    production pipeline always uses sample_pdf + merge_sorted_zvals.
    Kept in-tree with tests (test_pallas.py) as the measured dead end
    it is."""
    n_rays, n_coarse = z_vals.shape
    n_fine = u.shape[-1]
    # (tr, Sf, Sc) broadcast compares + (tr, ·, Sc+Sf) scatter one-hots
    # live simultaneously: tr=16 at 64+64 stays within the 16M VMEM scope.
    tr = _pick_rays_per_tile(n_rays, n_coarse + n_fine, target=2048)
    # U[j, i] = 1 if j < i over (Sc-2, Sc-1): cumsum with a leading zero
    tri = jnp.triu(
        jnp.ones((n_coarse - 2, n_coarse - 1), jnp.float32), k=1
    )
    grid = (n_rays // tr,)
    if u.ndim == 1:  # shared det draws: one (1, Sf) block for every tile
        u2 = u[None, :]
        u_spec = _const_spec((1, n_fine))
    else:
        u2 = u
        u_spec = pl.BlockSpec(
            (tr, n_fine), lambda i: (i, 0), memory_space=pltpu.VMEM
        )
    out = pl.pallas_call(
        functools.partial(_resample_kernel, n_coarse, n_fine, sorted_u),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tr, n_coarse), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tr, n_coarse), lambda i: (i, 0), memory_space=pltpu.VMEM),
            u_spec,
            _const_spec((n_coarse - 2, n_coarse - 1)),
        ],
        out_specs=pl.BlockSpec(
            (tr, n_coarse + n_fine), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_rays, n_coarse + n_fine), jnp.float32),
        interpret=_interpret(),
    )(z_vals, weights, u2, tri)
    return jax.lax.stop_gradient(out)
