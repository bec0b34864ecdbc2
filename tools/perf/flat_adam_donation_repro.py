#!/usr/bin/env python
"""Minimal repro: flat_adam + donate_argnums on the tunneled axon backend.

BENCH_NOTES.md (round 2) records that `optimizer.type: flat_adam` trips a
donation-aliasing RUNTIME failure at the production batch size (2048 rays,
64+64 samples) when the train step is jitted with `donate_argnums=(0,)` on
the tunneled TPU — while per-tensor optax.adam with identical donation is
fine, and flat_adam without donation is fine.  This probe reproduces the
failure in isolation so the fence in `train/loop.py`
(`optim.flat_adam_donation_unsafe`) has a checkable artifact.

Run on the real TPU:  python tools/perf/flat_adam_donation_repro.py
Expected on axon:  "donating: FAILED (<error>)" then "non-donating: OK".
On CPU both variants pass (the aliasing failure is backend-specific).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np


def build(donate: bool):
    from nerface_tpu.config import CfgNode, FeatureFlags
    from nerface_tpu.models import MODELS
    from nerface_tpu.render.pipeline import EncodeSpec, RenderSettings
    from nerface_tpu.train.state import create_train_state
    from nerface_tpu.train.step import make_train_step

    model = MODELS["ConditionalBlendshapePaperNeRFModel"](
        num_encoding_fn_xyz=10, num_encoding_fn_dir=4
    )
    cfg = CfgNode({
        "optimizer": {"type": "flat_adam", "lr": 5e-4},
        "scheduler": {"lr_decay": 250, "lr_decay_factor": 0.1},
    })
    flags = FeatureFlags()
    settings = RenderSettings(
        num_coarse=64, num_fine=64, perturb=True,
        radiance_field_noise_std=0.1, near=0.2, far=0.8,
        encode_xyz=EncodeSpec(10, True, True),
        encode_dir=EncodeSpec(4, False, True),
        fused="on",
    )
    state, opt = create_train_state(
        jax.random.PRNGKey(0), model, model, cfg, flags, n_train=16,
        background=jnp.zeros((512, 512, 3)),
    )
    step = make_train_step(
        model, model, settings, flags, opt, dtype=jnp.bfloat16, donate=donate
    )
    return state, step


def run(donate: bool, n_rays: int = 2048, steps: int = 3) -> None:
    state, step = build(donate)
    rng = np.random.RandomState(0)
    rd = rng.randn(n_rays, 3).astype(np.float32)
    rd[:, 2] = -np.abs(rd[:, 2]) - 0.5
    batch = jax.device_put({
        "ray_origins": jnp.zeros((n_rays, 3), jnp.float32),
        "ray_directions": jnp.asarray(rd),
        "target_rgb": jnp.asarray(rng.rand(n_rays, 3).astype(np.float32)),
        "background_rgb": jnp.asarray(rng.rand(n_rays, 3).astype(np.float32)),
        "expression": jnp.asarray(rng.randn(76).astype(np.float32) * 0.1),
        "latent_index": jnp.asarray(0, jnp.int32),
    })
    key = jax.random.PRNGKey(1)
    for _ in range(steps):
        key, sub = jax.random.split(key)
        state, metrics = step(state, batch, sub)
    # host-read sync (block_until_ready does not wait on axon)
    loss = float(metrics["total_loss"])
    assert np.isfinite(loss), loss


def main():
    print(f"backend: {jax.default_backend()}", file=sys.stderr)
    # non-donating FIRST: the donation failure poisons the tunneled worker
    # for subsequent executions in the same process (verified 2026-08-17 —
    # running donating first makes the healthy variant fail too)
    for donate in (False, True):
        label = "donating" if donate else "non-donating"
        try:
            run(donate)
            print(f"{label}: OK")
        except Exception as e:  # noqa: BLE001 — the failure class varies
            print(f"{label}: FAILED ({type(e).__name__}: {str(e)[:200]})")


if __name__ == "__main__":
    main()
