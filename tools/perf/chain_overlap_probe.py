"""Perf probe — does splitting a dependent matmul→relu chain into TWO
independent half-tile chains let Mosaic overlap VPU (relu) with MXU
(matmul)? Decides whether the fused kernels should be restructured into
interleaved sub-tiles. Run from the repo root on the TPU."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 1024
GRID = 384
DEPTH = 12  # matmul+relu pairs per grid step ~ fwd+bwd trunk work


def _dot(a, b):
    return jax.lax.dot_general(
        a.astype(jnp.bfloat16), b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def kernel_single(x_ref, w_ref, o_ref):
    a = x_ref[:]
    w = w_ref[:]
    for _ in range(DEPTH):
        a = jax.nn.relu(_dot(a, w))
    o_ref[:] = a


def kernel_twochain(x_ref, w_ref, o_ref):
    h = TILE // 2
    a = x_ref[0:h, :]
    b = x_ref[h:TILE, :]
    w = w_ref[:]
    for _ in range(DEPTH):
        a2 = _dot(a, w)
        b2 = _dot(b, w)
        a = jax.nn.relu(a2)
        b = jax.nn.relu(b2)
    o_ref[0:h, :] = a
    o_ref[h:TILE, :] = b


def kernel_fourchain(x_ref, w_ref, o_ref):
    q = TILE // 4
    parts = [x_ref[i * q:(i + 1) * q, :] for i in range(4)]
    w = w_ref[:]
    for _ in range(DEPTH):
        dots = [_dot(p, w) for p in parts]
        parts = [jax.nn.relu(d) for d in dots]
    for i in range(4):
        o_ref[i * q:(i + 1) * q, :] = parts[i]


def kernel_bwd_mix(x_ref, w_ref, o_ref):
    """Backward-style per layer: dx = dot(gy, w); mask-mult in f32;
    dW = x^T gy accumulated f32 — the real kernel's dominant bwd mix."""
    a = x_ref[:]
    w = w_ref[:]
    acc = jnp.zeros((256, 256), jnp.float32)
    for _ in range(DEPTH // 2):  # each iter = 2 matmuls -> same total FLOPs
        gy = _dot(a, w)
        gy = gy * (a > 0).astype(jnp.float32)
        acc += jax.lax.dot_general(
            a.astype(jnp.bfloat16), gy.astype(jnp.bfloat16),
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        a = gy
    o_ref[:] = a + jnp.broadcast_to(acc[:1, :], a.shape) * 0.0


def kernel_bias_sums(x_ref, w_ref, o_ref):
    """Chain + a bias-grad style (1, 256) row reduction per layer."""
    a = x_ref[:]
    w = w_ref[:]
    s = jnp.zeros((1, 256), jnp.float32)
    for _ in range(DEPTH):
        a = jax.nn.relu(_dot(a, w))
        s = s + jnp.sum(a, axis=0, keepdims=True)
    o_ref[:] = a + s * 0.0


def timeit(fn, k1=20, k2=80):
    for _ in range(3):
        out = fn()
    float(out.ravel()[0])
    t0 = time.perf_counter()
    for _ in range(k1):
        out = fn()
    float(out.ravel()[0])
    t1 = time.perf_counter()
    for _ in range(k2):
        out = fn()
    float(out.ravel()[0])
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / (k2 - k1)


def main():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(GRID * TILE, 256).astype(np.float32) * 0.05)
    w = (jnp.asarray(rng.randn(256, 256).astype(np.float32) * 0.06)
         .astype(jnp.bfloat16))
    xs = pl.BlockSpec((TILE, 256), lambda i: (i, 0), memory_space=pltpu.VMEM)
    ws = pl.BlockSpec((256, 256), lambda i: (0, 0), memory_space=pltpu.VMEM)
    oshape = jax.ShapeDtypeStruct((GRID * TILE, 256), jnp.float32)

    for name, kern in (("single chain", kernel_single),
                       ("two chains  ", kernel_twochain),
                       ("four chains ", kernel_fourchain),
                       ("bwd mix     ", kernel_bwd_mix),
                       ("bias sums   ", kernel_bias_sums)):
        call = jax.jit(lambda x, w, kern=kern: pl.pallas_call(
            kern, grid=(GRID,), in_specs=[xs, ws], out_specs=xs,
            out_shape=oshape)(x, w))
        dt = timeit(lambda: call(x, w))
        flops = GRID * DEPTH * TILE * 256 * 256 * 2
        print(f"{name}: {dt*1e3:7.3f} ms  ({flops/dt/1e12:6.1f} TFLOP/s)")


if __name__ == "__main__":
    main()
