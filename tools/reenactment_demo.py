#!/usr/bin/env python
"""End-to-end cross-actor reenactment demo on two synthetic identities.

The paper's headline capability (`real_to_nerf.py:497-601` +
`eval_transformed_rays.py:392-467`), exercised through every real
component in sequence — no shortcuts:

1. two synthetic face-tracker outputs (identities differ by neutral
   expression offset and camera path), frames rendered by the analytic
   expression-conditioned blob (`data/synthetic.render_blob_frame`);
2. `tools/dataset_builder.build_dataset` → the TARGET identity's NeRF
   dataset (train/val splits, index_map.npy);
3. `train.loop.train` → a person-specific avatar (bf16 fused path when on
   TPU);
4. `generate_original_test_sequence` → self-reenactment test split (GT
   available) → `eval.driver.evaluate` → `metrics.harness` PSNR/SSIM/L1;
5. `generate_driven_test_sequence` → the DRIVING identity's head rotations
   and neutral-relative expression deltas transferred onto the target
   (`driven_sequence`) → `eval.driver.evaluate` renders the reenactment.

Usage: python tools/reenactment_demo.py [--iters 3000] [--size 64]
                                        [--workdir /tmp/reenact_demo]
Results are printed and written to <workdir>/summary.json; RUNBOOK.md
records a reference run.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

import numpy as np


def make_tracker_identity(
    path: str, n_frames: int, seed: int, neutral_e0: float,
    H: int, W: int, yaw_amp: float = 8.0,
) -> None:
    """Synthetic tracker output: images/ + intrinsics.txt + rigid.txt +
    expression.txt, in the RAW tracker conventions that
    `dataset_builder.read_*` undo (sign flips, pre-scale poses)."""
    from PIL import Image

    from nerface_tpu.data.synthetic import _checkerboard, render_blob_frame
    from nerface_tpu.tools.dataset_builder import look_at

    rng = np.random.RandomState(seed)
    os.makedirs(os.path.join(path, "images"), exist_ok=True)

    rel = np.array([-1.5, -1.5, 0.5, 0.5])  # read_intrinsics flips fx/fy
    np.savetxt(os.path.join(path, "intrinsics.txt"), rel[None])
    # render_blob_frame's convention: pixel focals, RELATIVE centers
    intr_px = np.array([1.5 * W, 1.5 * H, 0.5, 0.5], np.float32)

    # expressions: identity-specific neutral + smooth sinusoidal play on
    # the two components the blob responds to
    t = np.linspace(0, 4 * np.pi, n_frames)
    expr = np.zeros((n_frames, 76))
    expr[:, 0] = neutral_e0 + 0.6 * np.sin(t)
    expr[:, 1] = 0.5 * np.cos(1.7 * t)
    expr[:, 2:] = 0.02 * rng.randn(n_frames, 74)
    np.savetxt(os.path.join(path, "expression.txt"), expr)

    bg = _checkerboard(H, W)
    poses = np.zeros((n_frames, 4, 4))
    for i in range(n_frames):
        # camera z pinned to exactly 0.5 so the loader's mean-z rescale
        # (`read_rigid_poses`) is the identity and dataset poses match the
        # cameras the frames were rendered with bit-for-bit
        yaw = np.deg2rad(yaw_amp * np.sin(t[i] * 0.5))
        cam = np.array([0.5 * np.tan(yaw), 0.02 * np.sin(t[i]), 0.5])
        c2w = look_at(cam, np.zeros(3))
        img = render_blob_frame(
            H, W, intr_px, c2w.astype(np.float32), expr[i], bg
        )
        Image.fromarray((img * 255).astype(np.uint8)).save(
            os.path.join(path, "images", f"{i:05d}.png")
        )
        raw = c2w.copy()
        raw[:, 0] *= -1  # read_rigid_poses re-negates columns 0 and 2
        raw[:, 2] *= -1
        poses[i] = raw
    assert abs(np.mean(poses[:, 2, -1]) - 0.5) < 1e-12
    np.savetxt(os.path.join(path, "rigid.txt"), poses.reshape(n_frames, -1))
    # the background the datasets will carry
    Image.fromarray((bg * 255).astype(np.uint8)).save(
        os.path.join(path, "background.png")
    )


def scaled_config(ds_dir: str, logdir: str, iters: int, size: int) -> dict:
    import yaml

    ref_cfg = os.path.join(
        "/root/reference/nerface_code/nerf-pytorch",
        "config/dave/dave_dvp_lcode_fixed_bg_512_paper_model.yml",
    )
    with open(ref_cfg) as f:
        cfg = yaml.safe_load(f)
    cfg["dataset"]["basedir"] = ds_dir
    cfg["dataset"]["half_res"] = False
    cfg["experiment"].update(
        logdir=logdir, id="avatar", train_iters=iters,
        # cadences must share a large common divisor or
        # train/loop._effective_window collapses toward K=1 (iters//3 at
        # 200k gives 66666, gcd 2 with print_every → 2-step windows)
        print_every=max(iters // 10, 1), validate_every=max(iters // 4, 1),
        # the loop always writes a final checkpoint at train_iters-1; a
        # round save_every keeps the cadences divisible so production
        # runs get the K>1 execution window (train/loop.py round 4)
        save_every=iters,
    )
    if size >= 128:
        # presentable runs keep the reference's production shape
        # (2048 rays, 64+64 samples — the paper config's own values) and
        # the production feed (device-side sampling: no per-step host
        # arrays over the tunnel — RUNBOOK.md §2)
        cfg["nerf"]["validation"].update(chunksize=min(size * size, 65536))
        cfg["experiment"]["device_feed"] = True
    else:
        # the 64² smoke regime recorded in RUNBOOK.md
        cfg["nerf"]["train"].update(num_random_rays=512, num_coarse=16,
                                    num_fine=16)
        cfg["nerf"]["validation"].update(num_coarse=16, num_fine=16,
                                         chunksize=min(size * size, 16384))
    return cfg


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=3000)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--workdir", type=str, default="/tmp/reenact_demo")
    ap.add_argument("--bf16", action="store_true", default=None,
                    help="bf16 fused training (default: on for TPU)")
    args = ap.parse_args()

    import shutil

    import yaml

    import jax
    import jax.numpy as jnp

    from nerface_tpu.config import load_config
    from nerface_tpu.eval.driver import EvalFlags, evaluate
    from nerface_tpu.metrics.harness import two_folders
    from nerface_tpu.tools.dataset_builder import (
        BuilderConfig,
        build_dataset,
        generate_driven_test_sequence,
        generate_original_test_sequence,
    )
    from nerface_tpu.train.checkpoint import latest_checkpoint
    from nerface_tpu.train.loop import train

    bf16 = args.bf16
    if bf16 is None:
        bf16 = jax.default_backend() in ("tpu", "axon")

    w = args.workdir
    os.makedirs(w, exist_ok=True)
    drv_dir = os.path.join(w, "tracker_driving")
    tgt_dir = os.path.join(w, "tracker_target")
    n = args.frames
    if not os.path.exists(os.path.join(tgt_dir, "rigid.txt")):
        print("[demo] building two synthetic tracker identities ...")
        make_tracker_identity(drv_dir, n, seed=1, neutral_e0=0.4,
                              H=args.size, W=args.size, yaw_amp=14.0)
        make_tracker_identity(tgt_dir, n, seed=2, neutral_e0=-0.4,
                              H=args.size, W=args.size, yaw_amp=6.0)

    ds_dir = os.path.join(w, "target_ds")
    bcfg = BuilderConfig(
        source=tgt_dir, target=ds_dir, driving=drv_dir, reserve_test=10,
        n_val=4, n_test=0, seed=0,
        neutral_driving_idx=0, neutral_target_idx=0,
    )
    if not os.path.exists(os.path.join(ds_dir, "transforms_train.json")):
        print("[demo] building the target identity's NeRF dataset ...")
        build_dataset(bcfg, log=False)
        # the loader reads all three splits — give it the original test
        # tail up front (regenerated per eval mode below)
        generate_original_test_sequence(bcfg, log=False)
        shutil.copy(os.path.join(tgt_dir, "background.png"),
                    os.path.join(ds_dir, "bg", "00050.png"))

    cfg_path = os.path.join(w, "cfg.yml")
    cfg = scaled_config(ds_dir, os.path.join(w, "logs"), args.iters,
                        args.size)
    with open(cfg_path, "w") as f:
        yaml.dump(cfg, f)
    jcfg = load_config(cfg_path)

    logdir = os.path.join(w, "logs", "avatar")
    ckpt = latest_checkpoint(logdir) if os.path.isdir(logdir) else None
    if ckpt is None:
        print(f"[demo] training the avatar ({args.iters} iters, "
              f"bf16={bf16}) ...")
        train(jcfg, dtype=jnp.bfloat16 if bf16 else None)
        ckpt = latest_checkpoint(logdir)
    print(f"[demo] checkpoint: {ckpt}")

    summary = {}

    # --- self-reenactment: original test tail, GT available -> metrics
    print("[demo] self-reenactment (original test sequence) ...")
    generate_original_test_sequence(bcfg, log=False)
    self_dir = os.path.join(w, "renders_self")
    r = evaluate(jcfg, ckpt, self_dir, eval_flags=EvalFlags(),
                 save_error_image=True, log=False,
                 dtype=jnp.bfloat16 if bf16 else None)
    m = two_folders(os.path.join(ds_dir, "test"), self_dir, log=False)
    summary["self_reenactment"] = {
        "frames": r["frames"], "s_per_frame": r["avg_time_per_image"],
        "psnr": float(m["PSNR"]), "ssim": float(m["SSIM"]),
        "l1": float(m["L1"]),
    }
    print(f"[demo]   {summary['self_reenactment']}")

    # --- cross-actor reenactment: driving identity's deltas + rotations
    print("[demo] cross-actor driven sequence (expression-delta "
          "transfer) ...")
    generate_driven_test_sequence(bcfg, n_max=n, log=False)
    driven_dir = os.path.join(w, "renders_driven")
    r = evaluate(jcfg, ckpt, driven_dir, eval_flags=EvalFlags(),
                 log=False, dtype=jnp.bfloat16 if bf16 else None)
    rendered = sorted(
        f for f in os.listdir(driven_dir) if f.endswith(".png")
    )
    # sanity: the driven renders must actually react to the driving
    # expressions (blob radius follows e0) — frame-to-frame variance
    from PIL import Image

    frames = np.stack([
        np.asarray(Image.open(os.path.join(driven_dir, f)), np.float32)
        for f in rendered[:20]
    ])
    temporal_std = float(frames.std(axis=0).mean())
    summary["cross_reenactment"] = {
        "frames": r["frames"], "s_per_frame": r["avg_time_per_image"],
        "temporal_std": temporal_std,
    }
    print(f"[demo]   {summary['cross_reenactment']}")
    assert temporal_std > 1.0, (
        "driven renders look static — expression transfer not reaching "
        "the avatar"
    )

    # --- presentation artifact: driving actor | reenacted render | normals
    # triptych (the reference's videos.txt composition), ffmpeg-free
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "video_writer", os.path.join(os.path.dirname(__file__),
                                     "video_writer.py")
    )
    vw = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(vw)
    video_path = os.path.join(w, "reenactment.avi")
    vw.main([video_path, os.path.join(drv_dir, "images"), driven_dir,
             os.path.join(driven_dir, "normals"), "--fps", "25"])
    summary["video"] = video_path

    with open(os.path.join(w, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(f"[demo] wrote {os.path.join(w, 'summary.json')}")


if __name__ == "__main__":
    main()
