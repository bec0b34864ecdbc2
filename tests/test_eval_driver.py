"""End-to-end eval/reenactment driver tests (equivalent surface:
`eval_transformed_rays.py`), run on a tiny synthetic dataset with a
freshly-trained checkpoint."""

import os

import numpy as np
import pytest

from nerface_tpu.config import CfgNode
from nerface_tpu.config.flags import EvalFlags
from nerface_tpu.data.synthetic import make_synthetic_flame_dataset
from nerface_tpu.eval.driver import (
    cast_to_disparity_image,
    cast_to_image,
    error_image,
    evaluate,
    jet_colormap,
)


def _tiny_cfg(basedir, logdir):
    return CfgNode(
        {
            "experiment": {
                "id": "t", "logdir": logdir, "randomseed": 42,
                "train_iters": 2, "validate_every": 0, "save_every": 1,
                "print_every": 10,
            },
            "dataset": {
                "basedir": basedir, "type": "blender", "no_ndc": True,
                "near": 0.2, "far": 0.8, "half_res": False, "testskip": 1,
            },
            "models": {
                "coarse": {
                    "type": "ConditionalBlendshapePaperNeRFModel",
                    "num_encoding_fn_xyz": 4, "num_encoding_fn_dir": 2,
                    "include_input_xyz": True, "include_input_dir": False,
                    "use_viewdirs": True, "num_layers": 4, "hidden_size": 32,
                    "log_sampling_xyz": True, "log_sampling_dir": True,
                },
                "fine": {
                    "type": "ConditionalBlendshapePaperNeRFModel",
                    "num_encoding_fn_xyz": 4, "num_encoding_fn_dir": 2,
                    "include_input_xyz": True, "include_input_dir": False,
                    "use_viewdirs": True,
                    "log_sampling_xyz": True, "log_sampling_dir": True,
                },
            },
            "optimizer": {"type": "Adam", "lr": 5e-4},
            "scheduler": {"lr_decay": 250, "lr_decay_factor": 0.1},
            "nerf": {
                "use_viewdirs": True,
                "train": {
                    "num_random_rays": 64, "chunksize": 2048, "perturb": True,
                    "num_coarse": 4, "num_fine": 4, "white_background": False,
                    "radiance_field_noise_std": 0.1, "lindisp": False,
                },
                "validation": {
                    "chunksize": 128, "perturb": True, "num_coarse": 4,
                    "num_fine": 4, "white_background": False,
                    "radiance_field_noise_std": 0.0, "lindisp": False,
                },
            },
        }
    )


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    from nerface_tpu.train.checkpoint import latest_checkpoint
    from nerface_tpu.train.loop import train

    tmp = tmp_path_factory.mktemp("evald")
    ds = make_synthetic_flame_dataset(
        str(tmp / "ds"), H=16, W=16, n_train=3, n_val=1, n_test=2,
        num_samples=8,
    )
    cfg = _tiny_cfg(ds, str(tmp / "logs"))
    train(cfg, log=False)
    ckpt = latest_checkpoint(os.path.join(str(tmp / "logs"), "t"))
    assert ckpt is not None
    return cfg, ckpt, tmp


class TestEvaluate:
    def test_renders_all_outputs(self, trained):
        cfg, ckpt, tmp = trained
        savedir = str(tmp / "renders")
        summary = evaluate(
            cfg, ckpt, savedir, EvalFlags(),
            save_disparity_image=True, save_error_image=True, log=False,
        )
        assert summary["frames"] == 2.0
        assert summary["avg_time_per_image"] > 0
        for rel in ("0000.png", "0001.png", "normals/0000.png",
                    "disparity/0000.png", "error/0000.png"):
            assert os.path.exists(os.path.join(savedir, rel)), rel
        from PIL import Image

        img = np.array(Image.open(os.path.join(savedir, "0000.png")))
        assert img.shape == (16, 16, 3) and img.dtype == np.uint8

    @pytest.mark.parametrize(
        "flags",
        [
            EvalFlags(ablate="view_dir"),
            EvalFlags(ablate="expression"),
            EvalFlags(ablate="latent_code"),
            EvalFlags(nerf=True),
            EvalFlags(frontalize=True),
            EvalFlags(no_expressions=True),
            EvalFlags(fix_latent_code_index=False),
        ],
        ids=["view_dir", "expression", "latent_code", "nerf", "frontalize",
             "no_expr", "per_frame_latent"],
    )
    def test_ablations_run(self, trained, flags, tmp_path):
        cfg, ckpt, _ = trained
        summary = evaluate(
            cfg, ckpt, str(tmp_path / "r"), flags, max_frames=1, log=False,
        )
        assert summary["frames"] == 1.0

    def test_nerf_flag_implies_all(self):
        f = EvalFlags(nerf=True)
        assert f.no_background and f.no_expressions and f.no_lcode

    def test_torch_checkpoint_roundtrip_eval(self, trained, tmp_path):
        """Eval straight from a reference-schema torch .ckpt file."""
        import jax

        from nerface_tpu.train import checkpoint as ckpt_lib
        from nerface_tpu.train.loop import build_models_from_cfg
        from nerface_tpu.train.state import create_train_state
        from nerface_tpu.config.flags import FeatureFlags

        cfg, ckpt, _ = trained
        mc, mf = build_models_from_cfg(cfg)
        state, _ = create_train_state(
            jax.random.PRNGKey(0), mc, mf, cfg, FeatureFlags(), n_train=3,
            background=np.zeros((16, 16, 3), np.float32),
        )
        state = ckpt_lib.load_checkpoint(ckpt, state)
        torch_path = str(tmp_path / "ref.ckpt")
        ckpt_lib.export_torch_checkpoint(torch_path, state, loss=0.0, psnr=0.0)
        summary = evaluate(
            cfg, torch_path, str(tmp_path / "r2"), EvalFlags(),
            max_frames=1, log=False,
        )
        assert summary["frames"] == 1.0


class TestImageHelpers:
    def test_cast_to_image_clamps(self):
        x = np.array([[[-0.5, 0.5, 1.5]]], np.float32)
        out = cast_to_image(x)
        assert out.tolist() == [[[0, 128, 255]]]

    def test_cast_to_disparity_normalizes(self):
        d = np.array([[1.0, 3.0], [5.0, 5.0]])
        out = cast_to_disparity_image(d)
        assert out.min() == 0 and out.max() == 255
        flat = cast_to_disparity_image(np.full((4, 4), 2.0))
        assert (flat == 0).all()  # degenerate range guarded

    def test_jet_colormap_endpoints(self):
        cols = jet_colormap(np.array([0.0, 0.5, 1.0]))
        assert cols[0].tolist() == [0, 0, 127]  # dark blue
        assert cols[2].tolist() == [127, 0, 0]  # dark red
        assert cols[1][1] == 255  # green-ish center

    def test_error_image_shape(self, rng):
        a, b = rng.rand(8, 8, 3), rng.rand(8, 8, 3)
        e = error_image(a, b)
        assert e.shape == (8, 8, 3) and e.dtype == np.uint8
        assert (error_image(a, a) == jet_colormap(np.zeros((8, 8)))).all()


class TestMissingIndexMap:
    def test_identity_fallback(self, trained, tmp_path):
        """Eval on a dataset without index_map.npy warns and renders with
        identity latent mapping instead of crashing (the reference would
        crash, `eval_transformed_rays.py:329`)."""
        import shutil

        cfg, ckpt, tmp = trained
        imap = os.path.join(cfg.dataset.basedir, "index_map.npy")
        backup = str(tmp_path / "index_map.npy")
        shutil.move(imap, backup)
        try:
            summary = evaluate(
                cfg, ckpt, str(tmp_path / "r"), EvalFlags(), max_frames=1,
                log=False,
            )
            assert summary["frames"] == 1.0
        finally:
            shutil.move(backup, imap)


class TestFastEvalThroughDriver:
    def test_fast_eval_config_renders(self, trained, tmp_path):
        """`nerf.validation.fast_eval: True` through the full driver:
        bbox union + capacity sizing + the fast renderer; frames come out
        finite and the skipped border equals the background."""
        import copy

        cfg, ckpt, tmp = trained
        cfg2 = copy.deepcopy(cfg)
        cfg2.nerf.validation["fast_eval"] = True
        savedir = str(tmp_path / "fast_renders")
        summary = evaluate(cfg2, ckpt, savedir, EvalFlags(), log=False)
        assert summary["frames"] == 2.0
        from PIL import Image

        img = np.array(Image.open(os.path.join(savedir, "0000.png")))
        assert img.shape == (16, 16, 3)
        assert np.isfinite(img).all()

    def test_occupancy_config_renders(self, trained, tmp_path):
        """`nerf.validation.occupancy: True` through the full driver:
        grid build from the trained field + capacity from the measured
        active fraction + the occupancy-masked fast renderer."""
        import copy

        cfg, ckpt, tmp = trained
        cfg2 = copy.deepcopy(cfg)
        cfg2.nerf.validation["fast_eval"] = True
        cfg2.nerf.validation["occupancy"] = True
        cfg2.nerf.validation["occupancy_resolution"] = 16
        savedir = str(tmp_path / "occ_renders")
        summary = evaluate(cfg2, ckpt, savedir, EvalFlags(), log=False)
        assert summary["frames"] == 2.0
        # and with the mouth sweep: it synthesizes expressions beyond
        # the dataset (expression[68] in [-1,1]), which must join the
        # grid-build sample instead of landing in skipped voxels
        savedir2 = str(tmp_path / "occ_mouth")
        summary2 = evaluate(
            cfg2, ckpt, savedir2, EvalFlags(interpolate_mouth=True),
            log=False,
        )
        assert summary2["frames"] == 2.0
        from PIL import Image

        img = np.array(Image.open(os.path.join(savedir, "0000.png")))
        assert img.shape == (16, 16, 3)
        assert np.isfinite(img).all()
