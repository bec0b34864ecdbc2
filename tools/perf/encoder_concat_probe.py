"""Perf probe — is `x3 @ w0a + enc @ w0b` (two lane-padded K=3/K=60 MXU
passes) slower than `concat([x3, enc]) @ w0` (one K=63 pass) inside a
Pallas kernel at the train kernel's shapes? Decides the packed-encoder
refactor. Run from the repo root on the TPU."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 1024
GRID = 384          # ~ the train step's total grid steps
REPS = 8            # dots per grid step ~ trunk depth


def _dot(a, b):
    return jax.lax.dot_general(
        a.astype(jnp.bfloat16), b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def kernel_split(x3_ref, enc_ref, wa_ref, wb_ref, o_ref):
    x3, enc = x3_ref[:], enc_ref[:]
    wa, wb = wa_ref[:], wb_ref[:]
    acc = jnp.zeros((TILE, 256), jnp.float32)
    for _ in range(REPS):
        acc += _dot(x3, wa) + _dot(enc, wb)
    o_ref[:] = acc


def kernel_packed(x3_ref, enc_ref, w_ref, o_ref):
    x = jnp.concatenate([x3_ref[:], enc_ref[:]], axis=-1)
    w = w_ref[:]
    acc = jnp.zeros((TILE, 256), jnp.float32)
    for _ in range(REPS):
        acc += _dot(x, w)
    o_ref[:] = acc


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
    x3 = jnp.asarray(rng.randn(GRID * TILE, 3).astype(np.float32))
    enc = jnp.asarray(rng.randn(GRID * TILE, 60).astype(np.float32))
    wa = jnp.asarray(rng.randn(3, 256).astype(np.float32)).astype(jnp.bfloat16)
    wb = jnp.asarray(rng.randn(60, 256).astype(np.float32)).astype(jnp.bfloat16)
    wp = jnp.concatenate([wa, wb], axis=0)

    spec3 = pl.BlockSpec((TILE, 3), lambda i: (i, 0), memory_space=pltpu.VMEM)
    spec60 = pl.BlockSpec((TILE, 60), lambda i: (i, 0), memory_space=pltpu.VMEM)
    cw = lambda s: pl.BlockSpec(s, lambda i: (0, 0), memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((TILE, 256), lambda i: (i, 0), memory_space=pltpu.VMEM)
    oshape = jax.ShapeDtypeStruct((GRID * TILE, 256), jnp.float32)

    split = jax.jit(lambda: pl.pallas_call(
        kernel_split, grid=(GRID,),
        in_specs=[spec3, spec60, cw((3, 256)), cw((60, 256))],
        out_specs=ospec, out_shape=oshape,
    )(x3, enc, wa, wb))
    packed = jax.jit(lambda: pl.pallas_call(
        kernel_packed, grid=(GRID,),
        in_specs=[spec3, spec60, cw((63, 256))],
        out_specs=ospec, out_shape=oshape,
    )(x3, enc, wp))

    a, b = np.asarray(split()), np.asarray(packed())
    print(f"parity max rel: {np.abs(a-b).max()/np.abs(a).max():.2e}")
    ds = timeit(split)
    dp = timeit(packed)
    print(f"split  (2 dots): {ds*1e3:7.3f} ms for {GRID}x{REPS} layer evals")
    print(f"packed (concat): {dp*1e3:7.3f} ms")
    print(f"saving if packed everywhere: {(ds-dp)*1e3:.3f} ms "
          f"(~{(ds-dp)/ds*100:.0f}% of these dots)")


if __name__ == "__main__":
    main()
