"""Perf probe — run from the repo root (`python tools/perf/<name>.py`);
numbers recorded in BENCH_NOTES.md / ROADMAP.md. Requires the TPU chip.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
"""Sweep the train-kernel ray-tile target: kernels-only timing per target."""
import time

import jax
import jax.numpy as jnp
import numpy as np

import nerface_tpu.ops.pallas.fused_train as ft
import nerface_tpu.ops.pallas.fused_mlp as fm
from nerface_tpu.config import CfgNode, FeatureFlags
from nerface_tpu.models import MODELS
from nerface_tpu.render.pipeline import EncodeSpec, RenderSettings, _direction_branch_input
from nerface_tpu.train.state import create_train_state
from nerface_tpu.ops.sampling import stratified_zvals, per_ray_normal

NUM_RAYS = 2048
NC = NF = 64


def timeit(fn, k1=30, k2=130):
    for _ in range(5):
        out = fn()
    float(out)
    t0 = time.perf_counter()
    for _ in range(k1):
        out = fn()
    float(out)
    t1 = time.perf_counter()
    for _ in range(k2):
        out = fn()
    float(out)
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
    rng = np.random.RandomState(0)
    rd = rng.randn(NUM_RAYS, 3).astype(np.float32)
    rd[:, 2] = -np.abs(rd[:, 2]) - 0.5
    rd = jnp.asarray(rd)
    ro = jnp.zeros((NUM_RAYS, 3), jnp.float32)
    target = jnp.asarray(rng.rand(NUM_RAYS, 3).astype(np.float32))
    bgp = jnp.asarray(rng.rand(NUM_RAYS, 3).astype(np.float32))
    expr = jnp.asarray(rng.randn(76).astype(np.float32) * 0.1)
    ri = jnp.arange(NUM_RAYS, dtype=jnp.int32)
    key = jax.random.PRNGKey(1)

    near = jnp.full((NUM_RAYS, 1), 0.2)
    far = jnp.full((NUM_RAYS, 1), 0.8)
    pe_dir = settings.encode_dir(_direction_branch_input(rd, near, far))
    cond = jnp.concatenate([expr / 3.0, jnp.zeros(32)])
    bc = ft.prefold_paper_params(state.params["coarse"], cond, pe_dir, 10)
    bf = ft.prefold_paper_params(state.params["fine"], cond, pe_dir, 10)
    k_strat, k_noise_c, k_pdf, k_noise_f = jax.random.split(key, 4)
    z_c = stratified_zvals(k_strat, near, far, NC, perturb=True, ray_index=ri)
    z_all = jnp.sort(jnp.concatenate(
        [z_c, jnp.linspace(0.21, 0.79, NF)[None, :].repeat(NUM_RAYS, 0)], -1), -1)
    noise_c = per_ray_normal(k_noise_c, ri, NC)
    noise_f = per_ray_normal(k_noise_f, ri, NC + NF)
    common = dict(noise_std=0.1, white_background=False,
                  loss_scale=2.0 / (3.0 * NUM_RAYS), num_encoding_fn_xyz=10,
                  log_sampling_xyz=True, train_bg=False, small=False)

    orig = fm._pick_rays_per_tile

    for target_sz in (512, 1024, 2048, 4096):
        def picker(n_rays, n_samples, target=1024, _t=target_sz):
            return orig(n_rays, n_samples, target=_t)

        ft._pick_rays_per_tile = picker

        @jax.jit
        def kernels_only(bc, bf, z_c, z_all):
            oc, gc, _ = ft.fused_train_pass(bc, ro, rd, z_c, target,
                                            background=bgp, noise=noise_c,
                                            sup_bg_scale=0.0, **common)
            of, gf, _ = ft.fused_train_pass(bf, ro, rd, z_all, target,
                                            background=bgp, noise=noise_f,
                                            sup_bg_scale=0.0, **common)
            return oc["rgb"].sum() + of["rgb"].sum() + sum(
                g.sum() for g in jax.tree.leaves((gc, gf)))

        try:
            dt = timeit(lambda: kernels_only(bc, bf, z_c, z_all))
            tr_c = picker(NUM_RAYS, NC)
            tr_f = picker(NUM_RAYS, NC + NF)
            print(f"target={target_sz:5d} (tr_c={tr_c:3d}, tr_f={tr_f:3d}): "
                  f"{dt*1e3:7.3f} ms")
        except Exception as e:
            print(f"target={target_sz:5d}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}")

    ft._pick_rays_per_tile = orig


if __name__ == "__main__":
    main()
