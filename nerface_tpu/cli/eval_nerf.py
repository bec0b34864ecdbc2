"""Legacy static-NeRF eval — equivalent of `eval_nerf.py:39-192`: renders
the spherical/spiral `render_poses` of a blender or LLFF dataset from a
checkpoint (no expression/background/latent conditioning).
"""

from __future__ import annotations

import argparse
import os
import time


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", type=str, required=True,
                        help="Path to (.yml) config file.")
    parser.add_argument("--checkpoint", type=str, required=True,
                        help="Checkpoint to evaluate (orbax dir or torch .ckpt).")
    parser.add_argument("--savedir", type=str, default="./renders/")
    parser.add_argument("--save-disparity-image", action="store_true")
    parser.add_argument("--max-frames", type=int, default=None)
    return parser


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)

    import jax
    import numpy as np

    from nerface_tpu.config import load_config
    from nerface_tpu.config.flags import FeatureFlags
    from nerface_tpu.eval.driver import cast_to_disparity_image, cast_to_image, _save_png
    from nerface_tpu.eval.renderer import render_full_frame
    from nerface_tpu.render.pipeline import RenderSettings
    from nerface_tpu.train import checkpoint as ckpt_lib
    from nerface_tpu.train.loop import build_models_from_cfg
    from nerface_tpu.train.state import create_train_state

    cfg = load_config(args.config)
    dataset_type = str(cfg.dataset.type).lower()
    if dataset_type == "blender":
        from nerface_tpu.data.blender import load_blender_data

        ds = load_blender_data(
            cfg.dataset.basedir,
            half_res=bool(cfg.dataset.half_res),
            testskip=int(cfg.dataset.testskip),
        )
        render_poses = ds.render_poses
        H, W, focal = ds.hwf
    elif dataset_type == "llff":
        from nerface_tpu.data.llff import load_llff_data

        ds = load_llff_data(
            cfg.dataset.basedir, factor=int(getattr(cfg.dataset, "downsample_factor", 4))
        )
        render_poses = ds.render_poses
        H, W, focal = ds.hwf
    else:
        raise SystemExit(f"unsupported dataset type for eval_nerf: {dataset_type}")

    intrinsics = np.array([focal, focal, 0.5, 0.5], np.float32)

    model_coarse, model_fine = build_models_from_cfg(cfg)
    flags = FeatureFlags(
        train_latent_codes=False, fixed_background=False,
        disable_latent_codes=True,
    )
    state, _ = create_train_state(
        jax.random.PRNGKey(0), model_coarse, model_fine, cfg, flags, n_train=1
    )
    if os.path.isdir(args.checkpoint):
        state = ckpt_lib.load_checkpoint(args.checkpoint, state)
    else:
        state = ckpt_lib.import_torch_weights(
            state, ckpt_lib.load_torch_checkpoint(args.checkpoint)
        )

    settings = RenderSettings.from_cfg(cfg, mode="validation")

    os.makedirs(args.savedir, exist_ok=True)
    if args.save_disparity_image:
        os.makedirs(os.path.join(args.savedir, "disparity"), exist_ok=True)

    times = []
    n = len(render_poses) if args.max_frames is None else min(
        len(render_poses), args.max_frames
    )
    for i in range(n):
        t0 = time.time()
        out = render_full_frame(
            model_coarse, model_fine,
            state.params["coarse"], state.params.get("fine"),
            H, W, intrinsics, np.asarray(render_poses[i][:3, :4]), settings,
            key=jax.random.PRNGKey(i),
        )
        rgb = out.get("rgb_fine", out["rgb_coarse"])
        jax.block_until_ready(rgb)
        times.append(time.time() - t0)
        _save_png(os.path.join(args.savedir, f"{i:04d}.png"), cast_to_image(rgb))
        if args.save_disparity_image:
            disp = out.get("disp_fine", out["disp_coarse"])
            _save_png(
                os.path.join(args.savedir, "disparity", f"{i:04d}.png"),
                cast_to_disparity_image(np.asarray(disp)),
            )
        print(f"Avg time per image: {sum(times) / (i + 1)}")


if __name__ == "__main__":
    main()
