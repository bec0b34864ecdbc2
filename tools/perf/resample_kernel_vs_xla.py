"""Perf probe — run from the repo root (`python tools/perf/<name>.py`);
numbers recorded in BENCH_NOTES.md / ROADMAP.md. Requires the TPU chip.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
"""Parity + timing: fused_resample(sorted_u det path) vs XLA sample_pdf+merge
at eval scale."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from nerface_tpu.ops.pallas.fused_mlp import fused_resample
from nerface_tpu.ops.sampling import merge_sorted_zvals, sample_pdf

R, SC, SF = 65536, 64, 64


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
    z = jnp.asarray(
        np.sort(0.2 + 0.6 * rng.rand(R, SC).astype(np.float32), axis=-1)
    )
    w = jnp.asarray(rng.rand(R, SC).astype(np.float32))
    u_det = jnp.linspace(0.0, 1.0, SF, dtype=jnp.float32)

    @jax.jit
    def xla_path(z, w):
        z_mid = 0.5 * (z[..., 1:] + z[..., :-1])
        zs = sample_pdf(None, z_mid, w[..., 1:-1], SF, det=True)
        return merge_sorted_zvals(z, zs)

    @jax.jit
    def kern_path(z, w):
        return fused_resample(z, w, u_det, sorted_u=True)

    ref = np.asarray(xla_path(z, w))
    out = np.asarray(kern_path(z, w))
    err = np.abs(out - ref).max()
    print(f"parity max|diff| = {err:.3e}")
    # every output row sorted?
    print("rows sorted:", bool((np.diff(out, axis=-1) >= 0).all()))

    dt_x = timeit(lambda: xla_path(z, w))
    dt_k = timeit(lambda: kern_path(z, w))
    print(f"XLA   : {dt_x*1e3:8.3f} ms for {R} rays")
    print(f"kernel: {dt_k*1e3:8.3f} ms for {R} rays")
    # 512^2 frame = 262144 rays
    print(f"per 512^2 frame: XLA {dt_x*4*1e3:.1f} ms vs kernel {dt_k*4*1e3:.1f} ms")


if __name__ == "__main__":
    main()
