"""Perf probe — run from the repo root (`python tools/perf/<name>.py`);
numbers recorded in BENCH_NOTES.md / ROADMAP.md. Requires the TPU chip.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
"""Split the XLA det-resample cost: sample_pdf vs jnp.sort merge, and try a
rank-scatter merge in pure XLA (both lists sorted in det mode)."""
import time

import jax
import jax.numpy as jnp
import numpy as np

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


def merge_rank_xla(z, zs):
    """Sorted union of two per-ray SORTED lists via one-sided rank counts
    and one-hot einsum scatter (MXU) instead of a general sort."""
    s_total = z.shape[-1] + zs.shape[-1]
    n_lt = jnp.sum(
        (zs[:, None, :] < z[:, :, None]).astype(jnp.float32), axis=-1
    ).astype(jnp.int32)
    rank_z = jnp.arange(z.shape[-1], dtype=jnp.int32)[None, :] + n_lt
    n_le = jnp.sum(
        (z[:, None, :] <= zs[:, :, None]).astype(jnp.float32), axis=-1
    ).astype(jnp.int32)
    rank_s = jnp.arange(zs.shape[-1], dtype=jnp.int32)[None, :] + n_le
    kk = jnp.arange(s_total, dtype=jnp.int32)
    sel_z = (rank_z[:, :, None] == kk).astype(jnp.float32)
    sel_s = (rank_s[:, :, None] == kk).astype(jnp.float32)
    return jnp.einsum(
        "rik,ri->rk", sel_z, z, precision=jax.lax.Precision.HIGHEST
    ) + jnp.einsum(
        "rik,ri->rk", sel_s, zs, precision=jax.lax.Precision.HIGHEST
    )


def main():
    rng = np.random.RandomState(0)
    z = jnp.asarray(
        np.sort(0.2 + 0.6 * rng.rand(R, SC).astype(np.float32), axis=-1)
    )
    w = jnp.asarray(rng.rand(R, SC).astype(np.float32))

    @jax.jit
    def pdf_only(z, w):
        z_mid = 0.5 * (z[..., 1:] + z[..., :-1])
        return sample_pdf(None, z_mid, w[..., 1:-1], SF, det=True)

    @jax.jit
    def full_sort(z, w):
        return merge_sorted_zvals(z, pdf_only(z, w))

    @jax.jit
    def full_rank(z, w):
        return merge_rank_xla(z, pdf_only(z, w))

    ref = np.asarray(full_sort(z, w))
    out = np.asarray(full_rank(z, w))
    print(f"rank-merge parity max|diff| = {np.abs(out - ref).max():.3e}")

    dt_p = timeit(lambda: pdf_only(z, w))
    dt_s = timeit(lambda: full_sort(z, w))
    dt_r = timeit(lambda: full_rank(z, w))
    print(f"sample_pdf only : {dt_p*1e3:8.3f} ms")
    print(f"pdf + sort merge: {dt_s*1e3:8.3f} ms")
    print(f"pdf + rank merge: {dt_r*1e3:8.3f} ms")
    print(f"per 512^2 frame: sort {4*dt_s*1e3:.1f} ms vs rank {4*dt_r*1e3:.1f} ms")


if __name__ == "__main__":
    main()
