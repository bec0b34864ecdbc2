"""Eval / reenactment CLI — equivalent of `eval_transformed_rays.py:203-222`
arg surface; ablation switches (hardcoded in the reference, :374-380,420)
are exposed as flags / `cfg.eval.*` keys.
"""

from __future__ import annotations

import argparse
import dataclasses


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument(
        "--config", type=str, required=True, help="Path to (.yml) config file."
    )
    parser.add_argument(
        "--checkpoint", type=str, required=True,
        help="Checkpoint to evaluate (orbax dir or reference torch .ckpt).",
    )
    parser.add_argument(
        "--savedir", type=str, default="./renders/",
        help="Save images to this directory.",
    )
    parser.add_argument(
        "--save-disparity-image", action="store_true",
        help="Save disparity images too.",
    )
    parser.add_argument(
        "--save-error-image", action="store_true",
        help="Save photometric error visualization.",
    )
    parser.add_argument("--max-frames", type=int, default=None)
    parser.add_argument("--num-devices", type=int, default=0,
                        help="Shard each frame's rays over this many "
                             "devices (0 = single device).")
    parser.add_argument("--matmul-precision", type=str, default=None,
                        choices=["default", "high", "highest"],
                        help="XLA matmul precision ('highest' = strict f32).")
    parser.add_argument("--no-background", action="store_true")
    parser.add_argument("--no-expressions", action="store_true")
    parser.add_argument("--no-lcode", action="store_true")
    parser.add_argument("--nerf", action="store_true",
                        help="Static-NeRF ablation (implies the three above).")
    parser.add_argument("--frontalize", action="store_true")
    parser.add_argument("--interpolate-mouth", action="store_true")
    parser.add_argument(
        "--ablate", type=str, default=None,
        choices=["expression", "latent_code", "view_dir"],
    )
    parser.add_argument("--per-frame-latent", action="store_true",
                        help="Use idx_map[i] latent codes instead of the "
                             "reference's pinned idx_map[10].")
    parser.add_argument("--fast-eval", action="store_true",
                        help="Opt-in fast eval: skip rays outside the test "
                             "split's head-bbox union (off the parity "
                             "path; equals nerf.validation.fast_eval).")
    parser.add_argument("--occupancy", action="store_true",
                        help="With --fast-eval: tighten the skip region to "
                             "rays touching an occupancy grid built from "
                             "the trained field (equals "
                             "nerf.validation.occupancy).")
    return parser


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)

    from nerface_tpu.config import load_config
    from nerface_tpu.config.flags import EvalFlags
    from nerface_tpu.eval.driver import evaluate

    cfg = load_config(args.config)
    flags = EvalFlags.from_cfg(cfg)
    overrides = dict(
        no_background=args.no_background or flags.no_background,
        no_expressions=args.no_expressions or flags.no_expressions,
        no_lcode=args.no_lcode or flags.no_lcode,
        nerf=args.nerf or flags.nerf,
        frontalize=args.frontalize or flags.frontalize,
        interpolate_mouth=args.interpolate_mouth or flags.interpolate_mouth,
        ablate=args.ablate if args.ablate is not None else flags.ablate,
        fix_latent_code_index=(
            False if args.per_frame_latent else flags.fix_latent_code_index
        ),
    )
    flags = dataclasses.replace(flags, **overrides)

    if args.fast_eval:
        cfg.nerf.validation["fast_eval"] = True
    if args.occupancy:
        cfg.nerf.validation["fast_eval"] = True
        cfg.nerf.validation["occupancy"] = True

    if args.matmul_precision:
        import jax

        jax.config.update("jax_default_matmul_precision", args.matmul_precision)

    mesh = None
    if args.num_devices and args.num_devices > 1:
        import jax
        import numpy as np
        from jax.sharding import Mesh

        mesh = Mesh(np.asarray(jax.devices()[: args.num_devices]), ("data",))

    summary = evaluate(
        cfg,
        checkpoint=args.checkpoint,
        savedir=args.savedir,
        eval_flags=flags,
        save_disparity_image=args.save_disparity_image,
        save_error_image=args.save_error_image,
        max_frames=args.max_frames,
        mesh=mesh,
    )
    print(
        f"Rendered {int(summary['frames'])} frames; "
        f"avg time per image: {summary['avg_time_per_image']:.4f}s"
    )


if __name__ == "__main__":
    main()
