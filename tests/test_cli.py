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
            "--no-lcode", "--fast-eval", "--occupancy",
        ])
        assert a.ablate == "view_dir" and a.nerf and a.per_frame_latent
        assert a.fast_eval and a.occupancy

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


class TestEvalNerfEndToEnd:
    def test_renders_spherical_pose_from_checkpoint(self, tmp_path):
        """Legacy static eval e2e (`eval_nerf.py:39-192` equivalent):
        blender dataset -> checkpoint -> one spherical render-pose frame
        written to savedir with finite pixels."""
        import os

        import numpy as np
        import yaml

        import jax
        from test_loaders import _make_blender_dataset

        from nerface_tpu.config import load_config
        from nerface_tpu.config.flags import FeatureFlags
        from nerface_tpu.train import checkpoint as ckpt_lib
        from nerface_tpu.train.loop import build_models_from_cfg
        from nerface_tpu.train.state import create_train_state

        ds_dir = _make_blender_dataset(str(tmp_path / "blender"), H=20, W=20)
        model_cfg = {
            "type": "FlexibleNeRFModel",
            "num_layers": 4,
            "hidden_size": 32,
            "skip_connect_every": 3,
            "num_encoding_fn_xyz": 4,
            "include_input_xyz": True,
            "log_sampling_xyz": True,
            "use_viewdirs": True,
            "num_encoding_fn_dir": 2,
            "include_input_dir": False,
            "log_sampling_dir": True,
        }
        cfg_dict = {
            "experiment": {"id": "legacy", "logdir": str(tmp_path / "logs"),
                           "randomseed": 42, "train_iters": 1,
                           "validate_every": 100, "save_every": 100,
                           "print_every": 100},
            "dataset": {"type": "blender", "basedir": ds_dir,
                        "half_res": False, "testskip": 1, "no_ndc": True,
                        "near": 2.0, "far": 6.0},
            "models": {"coarse": dict(model_cfg), "fine": dict(model_cfg)},
            "optimizer": {"type": "Adam", "lr": 5.0e-4},
            "scheduler": {"lr_decay": 250, "lr_decay_factor": 0.1},
            "nerf": {
                "use_viewdirs": True,
                "train": {"num_random_rays": 64, "chunksize": 1024,
                          "perturb": True, "num_coarse": 8, "num_fine": 8,
                          "white_background": False,
                          "radiance_field_noise_std": 0.1,
                          "lindisp": False},
                "validation": {"chunksize": 400, "perturb": False,
                               "num_coarse": 8, "num_fine": 8,
                               "white_background": False,
                               "radiance_field_noise_std": 0.0,
                               "lindisp": False},
            },
        }
        cfg_path = str(tmp_path / "cfg.yml")
        with open(cfg_path, "w") as f:
            yaml.dump(cfg_dict, f)

        # a checkpoint through the real save path
        cfg = load_config(cfg_path)
        mc, mf = build_models_from_cfg(cfg)
        flags = FeatureFlags(train_latent_codes=False, fixed_background=False,
                             disable_latent_codes=True)
        state, _ = create_train_state(
            jax.random.PRNGKey(0), mc, mf, cfg, flags, n_train=1
        )
        ckpt = ckpt_lib.save_checkpoint(str(tmp_path / "ckpts"), state)

        from nerface_tpu.cli.eval_nerf import main

        savedir = str(tmp_path / "renders")
        main(["--config", cfg_path, "--checkpoint", ckpt,
              "--savedir", savedir, "--save-disparity-image",
              "--max-frames", "1"])

        from PIL import Image

        img = np.asarray(Image.open(os.path.join(savedir, "0000.png")))
        assert img.shape == (20, 20, 3)
        assert np.isfinite(img).all()
        disp = np.asarray(
            Image.open(os.path.join(savedir, "disparity", "0000.png"))
        )
        assert disp.shape[:2] == (20, 20)
