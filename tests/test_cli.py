"""CLI arg-surface smoke tests: every entry point's parser accepts its
documented flags (the reference exposes these surfaces via argparse in
each script)."""

import pytest


class TestParsers:
    def test_train_parser(self):
        from nerface_tpu.cli.train import build_parser

        a = build_parser().parse_args([
            "--config", "c.yml", "--load-checkpoint", "x", "--max-iters",
            "10", "--num-devices", "8", "--bf16", "--export-torch",
            "--profile", "/tmp/t", "--debug-nans", "--device-feed",
            "--matmul-precision", "highest",
        ])
        assert a.config == "c.yml" and a.num_devices == 8 and a.bf16
        assert a.device_feed and a.matmul_precision == "highest"

    def test_eval_parser(self):
        from nerface_tpu.cli.eval import build_parser

        a = build_parser().parse_args([
            "--config", "c.yml", "--checkpoint", "k", "--savedir", "s",
            "--save-disparity-image", "--save-error-image", "--max-frames",
            "5", "--num-devices", "4", "--nerf", "--frontalize",
            "--interpolate-mouth", "--ablate", "view_dir",
            "--per-frame-latent", "--no-background", "--no-expressions",
            "--no-lcode",
        ])
        assert a.ablate == "view_dir" and a.nerf and a.per_frame_latent

    def test_eval_nerf_parser(self):
        from nerface_tpu.cli.eval_nerf import build_parser

        a = build_parser().parse_args([
            "--config", "c.yml", "--checkpoint", "k",
            "--save-disparity-image", "--max-frames", "2",
        ])
        assert a.max_frames == 2

    def test_metrics_parser(self):
        from nerface_tpu.cli.metrics import build_parser

        a = build_parser().parse_args([
            "--gt_path", "g", "--images_path", "i", "--lpips-weights", "w",
            "--data-range", "2.0",
        ])
        assert a.data_range == 2.0

    def test_build_dataset_parser(self):
        from nerface_tpu.cli.build_dataset import build_parser

        a = build_parser().parse_args([
            "--source", "s", "--target", "t", "--driving", "d",
            "--LESS_DATA", "0.5", "--mode", "driven", "--n-max", "100",
            "--reserve-test", "50", "--mesh", "m.off", "--seed", "3",
            "--neutral-driving-idx", "7", "--neutral-target-idx", "9",
        ])
        assert a.less_data == 0.5 and a.mode == "driven"

    def test_generate_synthetic_parser(self):
        from nerface_tpu.cli.generate_synthetic import build_parser

        a = build_parser().parse_args([
            "--target", "t", "--n-train", "4", "--sampling", "HELIX",
            "--size", "32",
        ])
        assert a.sampling == "HELIX" and a.size == 32

    def test_required_args_enforced(self):
        from nerface_tpu.cli.train import build_parser

        with pytest.raises(SystemExit):
            build_parser().parse_args([])
