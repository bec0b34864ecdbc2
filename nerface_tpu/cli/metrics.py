"""Metrics CLI — equivalent of `nerf/metrics.py:153-179` arg surface."""

from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--gt_path", type=str, default="",
                        help="directory of GT images")
    parser.add_argument("--images_path", type=str, default="",
                        help="directory of generated images")
    parser.add_argument("--mode", type=str, default="folders",
                        help="folders | images")
    parser.add_argument("--lpips-weights", type=str, default=None,
                        help="combined LPIPS-alex state_dict (optional; "
                             "LPIPS reported as nan without it)")
    parser.add_argument("--data-range", type=float, default=1.0,
                        help="PSNR/SSIM data range (2.0 replicates legacy "
                             "skimage float behavior)")
    return parser


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    from nerface_tpu.metrics.harness import two_folders

    if args.mode != "folders":
        raise SystemExit("only --mode folders is supported")
    two_folders(
        args.gt_path,
        args.images_path,
        lpips_weights=args.lpips_weights,
        data_range=args.data_range,
    )


if __name__ == "__main__":
    main()
