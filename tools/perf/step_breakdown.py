"""Perf probe — run from the repo root (`python tools/perf/<name>.py`);
numbers recorded in BENCH_NOTES.md / ROADMAP.md. Requires the TPU chip.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
"""Slope-timed breakdown of the train step at the bench workload.

Variants:
  full        — the real step (bench.py workload)
  nograd_pipe — fused passes only, no prefold-vjp/Adam (kernel+resample time)
  kernels     — coarse+fine fused_train_pass with fixed z (no resample/RNG)
  resample    — stratified_zvals + sample_pdf + merge alone
"""
import time
import sys

import jax
import jax.numpy as jnp
import numpy as np

from nerface_tpu.config import CfgNode, FeatureFlags
from nerface_tpu.models import MODELS
from nerface_tpu.render.pipeline import EncodeSpec, RenderSettings
from nerface_tpu.train.state import create_train_state
from nerface_tpu.train.step import make_train_step

NUM_RAYS = 2048
NC = NF = 64


def timeit(fn, sync, k1=30, k2=130):
    for _ in range(5):
        out = fn()
    sync(out)
    t0 = time.perf_counter()
    for _ in range(k1):
        out = fn()
    sync(out)
    t1 = time.perf_counter()
    for _ in range(k2):
        out = fn()
    sync(out)
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / (k2 - k1)


def main():
    model = MODELS["ConditionalBlendshapePaperNeRFModel"](
        num_encoding_fn_xyz=10, num_encoding_fn_dir=4
    )
    cfg = CfgNode({
        "optimizer": {"type": "Adam", "lr": 5e-4},
        "scheduler": {"lr_decay": 250, "lr_decay_factor": 0.1},
    })
    flags = FeatureFlags()
    settings = RenderSettings(
        num_coarse=NC, num_fine=NF, perturb=True,
        radiance_field_noise_std=0.1, near=0.2, far=0.8,
        encode_xyz=EncodeSpec(10, True, True),
        encode_dir=EncodeSpec(4, False, True),
        fused="on",
    )
    state, opt = create_train_state(
        jax.random.PRNGKey(0), model, model, cfg, flags, n_train=16,
        background=jnp.zeros((512, 512, 3)),
    )
    step = make_train_step(model, model, settings, flags, opt,
                           dtype=jnp.bfloat16, donate=False)

    rng = np.random.RandomState(0)
    rd = rng.randn(NUM_RAYS, 3).astype(np.float32)
    rd[:, 2] = -np.abs(rd[:, 2]) - 0.5
    batch = {
        "ray_origins": jnp.zeros((NUM_RAYS, 3), jnp.float32),
        "ray_directions": jnp.asarray(rd),
        "target_rgb": jnp.asarray(rng.rand(NUM_RAYS, 3).astype(np.float32)),
        "background_rgb": jnp.asarray(rng.rand(NUM_RAYS, 3).astype(np.float32)),
        "expression": jnp.asarray(rng.randn(76).astype(np.float32) * 0.1),
        "latent_index": jnp.asarray(0, jnp.int32),
        "ray_index": jnp.arange(NUM_RAYS, dtype=jnp.int32),
    }
    batch = jax.device_put(batch)
    key = jax.random.PRNGKey(1)

    # --- full step (state threading like bench) ---
    st = [state]

    def full():
        s2, m = step(st[0], batch, key)
        st[0] = s2
        return m["total_loss"]

    dt = timeit(full, lambda x: float(x))
    print(f"full step:       {dt*1e3:8.3f} ms  ({NUM_RAYS/dt/1e3:.1f}k rays/s)")

    # --- value_and_grad only (no Adam) ---
    from nerface_tpu.train.fused import fused_value_and_grad

    @jax.jit
    def vag(params, b, k):
        (total, m), grads = fused_value_and_grad(
            params, b, k, model, model, settings, flags,
            state.fixed_background)
        return total, grads

    def vag_call():
        t, g = vag(state.params, batch, key)
        return t

    dt = timeit(vag_call, lambda x: float(x))
    print(f"value_and_grad:  {dt*1e3:8.3f} ms")

    # --- kernels only: coarse+fine passes with precomputed z, no vjp ------
    from nerface_tpu.ops.pallas.fused_train import (
        fused_train_pass, prefold_paper_params)
    from nerface_tpu.render.pipeline import _direction_branch_input
    from nerface_tpu.ops.sampling import (
        stratified_zvals, sample_pdf, merge_sorted_zvals, per_ray_normal)

    near = jnp.full((NUM_RAYS, 1), 0.2)
    far = jnp.full((NUM_RAYS, 1), 0.8)
    pe_dir = settings.encode_dir(_direction_branch_input(
        batch["ray_directions"], near, far))
    cond = jnp.concatenate([batch["expression"] / 3.0, jnp.zeros(32)])
    bc = prefold_paper_params(state.params["coarse"], cond, pe_dir, 10)
    bf = prefold_paper_params(state.params["fine"], cond, pe_dir, 10)
    ri = batch["ray_index"]
    k_strat, k_noise_c, k_pdf, k_noise_f = jax.random.split(key, 4)
    z_c = stratified_zvals(k_strat, near, far, NC, perturb=True, ray_index=ri)
    z_all = jnp.sort(jnp.concatenate(
        [z_c, jnp.linspace(0.21, 0.79, NF)[None, :].repeat(NUM_RAYS, 0)], -1), -1)
    noise_c = per_ray_normal(k_noise_c, ri, NC)
    noise_f = per_ray_normal(k_noise_f, ri, NC + NF)
    target = batch["target_rgb"]
    bgp = batch["background_rgb"]
    common = dict(noise_std=0.1, white_background=False,
                  loss_scale=2.0 / (3.0 * NUM_RAYS), num_encoding_fn_xyz=10,
                  log_sampling_xyz=True, train_bg=False, small=False)

    @jax.jit
    def kernels_only(bc, bf, z_c, z_all):
        oc, gc, _ = fused_train_pass(bc, batch["ray_origins"],
                                     batch["ray_directions"], z_c, target,
                                     background=bgp, noise=noise_c,
                                     sup_bg_scale=0.0, **common)
        of, gf, _ = fused_train_pass(bf, batch["ray_origins"],
                                     batch["ray_directions"], z_all, target,
                                     background=bgp, noise=noise_f,
                                     sup_bg_scale=0.0, **common)
        return oc["rgb"].sum() + of["rgb"].sum() + sum(
            g.sum() for g in jax.tree.leaves((gc, gf)))

    dt = timeit(lambda: kernels_only(bc, bf, z_c, z_all), lambda x: float(x))
    print(f"kernels only:    {dt*1e3:8.3f} ms")

    # --- resample glue alone ---
    @jax.jit
    def resample(key, w):
        k_strat, k_noise_c, k_pdf, k_noise_f = jax.random.split(key, 4)
        z_vals = stratified_zvals(k_strat, near, far, NC, perturb=True,
                                  ray_index=ri)
        z_mid = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
        z_samples = sample_pdf(k_pdf, z_mid, w[..., 1:-1], NF, det=False,
                               ray_index=ri)
        z_all = merge_sorted_zvals(z_vals, z_samples)
        nc = per_ray_normal(k_noise_c, ri, NC)
        nf = per_ray_normal(k_noise_f, ri, NC + NF)
        return z_all.sum() + nc.sum() + nf.sum()

    w = jnp.abs(jnp.asarray(rng.rand(NUM_RAYS, NC).astype(np.float32)))
    dt = timeit(lambda: resample(key, w), lambda x: float(x))
    print(f"resample+rng:    {dt*1e3:8.3f} ms")

    # --- prefold vjp alone ---
    def mk(p):
        lat = p["latent_codes"][0]
        c = jnp.concatenate([batch["expression"] / 3.0, lat])
        return (prefold_paper_params(p["coarse"], c, pe_dir, 10),
                prefold_paper_params(p["fine"], c, pe_dir, 10))

    @jax.jit
    def prefold_rt(p, gb):
        out, pb = jax.vjp(mk, p)
        g = pb(gb)[0]
        return sum(x.sum() for x in jax.tree.leaves(g))

    gb = jax.tree.map(jnp.ones_like, mk(state.params))
    dt = timeit(lambda: prefold_rt(state.params, gb), lambda x: float(x))
    print(f"prefold+vjp:     {dt*1e3:8.3f} ms")


if __name__ == "__main__":
    main()
