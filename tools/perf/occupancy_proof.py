#!/usr/bin/env python
"""Occupancy-grid proof on a CONVERGED model — the real-checkpoint ledger.

`tools/perf/fast_eval_bench.py` measures the speed-vs-capacity curve on a
synthetic ellipsoid mask; this probe produces the evidence that curve is
*reachable* on a trained field: load a production checkpoint, build the
occupancy grid exactly the way the eval driver does (`eval/occupancy.py::
fast_eval_setup`), and record

  - grid occupancy fraction + resulting active-ray capacity vs the bbox
    capacity (is the 3D silhouette actually tighter than the rectangle?),
  - ms/frame + fps for parity / bbox fast-eval / occupancy renderers,
  - test-split PSNR vs GT for all three, and the occupancy-vs-parity
    pixel delta (the quality contract: active rays bit-identical, skipped
    rays composite to the exact background pixel).

The reference's only perf metric is avg s/image over this same eval
workload (`eval_transformed_rays.py:449-467,483`).

Run on the real TPU after a production training run:

    python tools/perf/occupancy_proof.py \
        --config configs/synth512c_devfeed.yml \
        --checkpoint /tmp/nerface_runs/synth512c_devfeed/checkpoint300001
"""

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np


def psnr_01(a: np.ndarray, b: np.ndarray) -> float:
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    return float(-10.0 * np.log10(max(mse, 1e-12)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--frames", type=int, default=10,
                    help="timing reps per mode (slope-timed)")
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    ap.add_argument("--platform", default=None, choices=["cpu", "axon"],
                    help="pin the jax backend (the image boots with axon "
                         "pinned; plain JAX_PLATFORMS=cpu is too late)")
    args = ap.parse_args()

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from nerface_tpu.config import load_config
    from nerface_tpu.config.flags import FeatureFlags
    from nerface_tpu.data.flame import load_flame_data
    from nerface_tpu.eval.occupancy import fast_eval_setup
    from nerface_tpu.eval.renderer import render_full_frame
    from nerface_tpu.render.pipeline import RenderSettings
    from nerface_tpu.train import checkpoint as ckpt_lib
    from nerface_tpu.train.loop import build_models_from_cfg
    from nerface_tpu.train.state import create_train_state

    dtype = jnp.bfloat16 if args.dtype == "bf16" else None

    cfg = load_config(args.config)
    dataset = load_flame_data(
        cfg.dataset.basedir, half_res=cfg.dataset.half_res,
        testskip=cfg.dataset.testskip, test=True,
        cachedir=cfg.dataset.get("cachedir"),
    )
    model_coarse, model_fine = build_models_from_cfg(cfg)
    train_flags = FeatureFlags.from_cfg(cfg)
    state, _ = create_train_state(
        jax.random.PRNGKey(0), model_coarse, model_fine, cfg, train_flags,
        n_train=max(len(dataset.i_train), 1),
        background=jnp.zeros((dataset.H, dataset.W, 3)),
    )
    if os.path.isdir(args.checkpoint):
        state = ckpt_lib.load_checkpoint(args.checkpoint, state)
    else:
        state = ckpt_lib.import_torch_weights(
            state, ckpt_lib.load_torch_checkpoint(args.checkpoint)
        )

    H, W, intr = dataset.H, dataset.W, dataset.intrinsics
    background = state.params.get("background")
    if background is None:
        background = state.fixed_background
    latent_codes = state.params.get("latent_codes")
    idx_map = dataset.load_index_map()
    # the eval driver's default: latent pinned to idx_map[10, 1]
    # (the reference quirk, eval_transformed_rays.py)
    latent_index = int(idx_map[min(10, len(idx_map) - 1), 1])
    latent = (
        latent_codes[max(latent_index, 0)] if latent_codes is not None
        else None
    )

    base = RenderSettings.from_cfg(cfg, mode="validation")
    base = dataclasses.replace(base, perturb=False)
    poses = dataset.poses[dataset.i_test]
    exprs = dataset.expressions[dataset.i_test]

    # bbox-only setup, then occupancy setup (the grid build) — exactly
    # the driver's code path, so the recorded capacities are the
    # production ones.
    bbox, s_bbox, _ = fast_eval_setup(
        dataset, poses, exprs,
        dataclasses.replace(base, fast_eval=True, occupancy=False),
        model_coarse, state.params["coarse"],
        latent_codes=latent_codes, dtype=dtype, log=True,
    )
    t0 = time.perf_counter()
    _, s_occ, occ = fast_eval_setup(
        dataset, poses, exprs,
        dataclasses.replace(base, fast_eval=True, occupancy=True),
        model_coarse, state.params["coarse"],
        latent_codes=latent_codes, dtype=dtype, log=True,
    )
    grid_build_s = time.perf_counter() - t0
    occ_frac = occ.occupancy_fraction()
    print(f"grid build (incl. active-fraction measure): {grid_build_s:.1f}s")
    print(f"grid occupancy fraction: {occ_frac:.4f}")
    print(f"bbox capacity {s_bbox.fast_eval_capacity:.4f}  ->  "
          f"occupancy capacity {s_occ.fast_eval_capacity:.4f}  "
          f"({s_occ.fast_eval_capacity / max(s_bbox.fast_eval_capacity, 1e-9):.2f}x)")

    modes = {
        "parity": (base, None, None),
        "bbox": (s_bbox, bbox, None),
        "occupancy": (s_occ, bbox, occ),
    }

    def render(mode, frame, seed):
        s, bb, oc = modes[mode]
        return render_full_frame(
            model_coarse, model_fine,
            state.params["coarse"], state.params.get("fine"),
            H, W, intr, poses[frame][:3, :4], s,
            key=jax.random.PRNGKey(seed),
            expressions=jnp.asarray(exprs[frame]),
            latent_code=latent, background=background, dtype=dtype,
            bbox=bb, occupancy=oc,
        )

    renders = {}   # mode -> list of (H, W, 3) float arrays
    ledger = {}
    for mode in modes:
        imgs = []
        for f in range(len(poses)):
            out = render(mode, f, seed=f)
            imgs.append(np.asarray(
                out.get("rgb_fine", out["rgb_coarse"]), np.float32
            ))
        renders[mode] = imgs
        # slope timing: repeated renders of frame 0, fresh RNG stream per
        # rep (same executable); host-read sync — block_until_ready does
        # not wait on the axon tunnel.
        float(jnp.mean(render(mode, 0, 0)["rgb_fine"]))  # warm
        t0 = time.perf_counter()
        acc = None
        for i in range(args.frames):
            acc = render(mode, 0, 1000 + i)
        float(jnp.mean(acc["rgb_fine"]))
        dt = (time.perf_counter() - t0) / args.frames
        gt = [
            np.asarray(dataset.images[j][..., :3], np.float32)
            for j in dataset.i_test[: len(poses)]
        ]
        ps = [psnr_01(r, g) for r, g in zip(imgs, gt)]
        ledger[mode] = dict(ms=dt * 1e3, fps=1.0 / dt,
                            psnr=float(np.mean(ps)))
        print(f"{mode:9s}: {dt * 1e3:8.1f} ms/frame  {1.0 / dt:5.2f} fps  "
              f"PSNR vs GT {np.mean(ps):.2f} dB  (frames: "
              + ", ".join(f"{p:.2f}" for p in ps) + ")")

    # quality contract: occupancy vs parity pixel delta
    for other in ("bbox", "occupancy"):
        d8 = max(
            int(np.max(np.abs(
                (np.clip(a, 0, 1) * 255).round().astype(np.int32)
                - (np.clip(b, 0, 1) * 255).round().astype(np.int32)
            )))
            for a, b in zip(renders[other], renders["parity"])
        )
        pd = ledger[other]["psnr"] - ledger["parity"]["psnr"]
        print(f"{other} vs parity: max uint8 pixel delta {d8}, "
              f"PSNR-vs-GT delta {pd:+.3f} dB")

    print(
        f"SUMMARY occ_frac={occ_frac:.4f} "
        f"cap_bbox={s_bbox.fast_eval_capacity:.4f} "
        f"cap_occ={s_occ.fast_eval_capacity:.4f} "
        f"fps_parity={ledger['parity']['fps']:.2f} "
        f"fps_bbox={ledger['bbox']['fps']:.2f} "
        f"fps_occ={ledger['occupancy']['fps']:.2f} "
        f"dpsnr_occ={ledger['occupancy']['psnr'] - ledger['parity']['psnr']:+.3f}"
    )


if __name__ == "__main__":
    main()
