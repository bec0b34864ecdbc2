"""End-to-end tests: train loop on the synthetic dataset, full-frame eval
renderer, normals, checkpoint round-trips (native + torch interop)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerface_tpu.config import CfgNode
from nerface_tpu.data import load_flame_data
from nerface_tpu.data.synthetic import make_synthetic_flame_dataset
from nerface_tpu.eval.normals import normal_map_from_depth
from nerface_tpu.eval.renderer import render_full_frame
from nerface_tpu.models import MODELS
from nerface_tpu.render.pipeline import EncodeSpec, RenderSettings
from nerface_tpu.train import checkpoint as ckpt_lib
from nerface_tpu.train.loop import build_models_from_cfg, train


@pytest.fixture(scope="module")
def synth_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("synth_e2e")
    return make_synthetic_flame_dataset(str(d), n_train=4, n_val=2, n_test=2, H=24, W=24)


def _tiny_cfg(synth_dir, logdir, train_iters=12):
    return CfgNode(
        {
            "experiment": {
                "id": "tiny",
                "logdir": logdir,
                "randomseed": 42,
                "train_iters": train_iters,
                "validate_every": 10,
                "save_every": 10,
                "print_every": 5,
                "device": 0,
            },
            "dataset": {
                "type": "blender",
                "basedir": synth_dir,
                "half_res": False,
                "testskip": 1,
                "no_ndc": True,
                "near": 0.2,
                "far": 0.8,
            },
            "models": {
                "coarse": {
                    "type": "ConditionalBlendshapePaperNeRFModel",
                    "num_layers": 4,
                    "hidden_size": 256,
                    "skip_connect_every": 3,
                    "include_input_xyz": True,
                    "log_sampling_xyz": True,
                    "num_encoding_fn_xyz": 4,
                    "use_viewdirs": True,
                    "include_input_dir": False,
                    "num_encoding_fn_dir": 2,
                    "log_sampling_dir": True,
                },
                "fine": {
                    "type": "ConditionalBlendshapePaperNeRFModel",
                    "num_layers": 4,
                    "hidden_size": 256,
                    "skip_connect_every": 3,
                    "num_encoding_fn_xyz": 4,
                    "include_input_xyz": True,
                    "log_sampling_xyz": True,
                    "use_viewdirs": True,
                    "include_input_dir": False,
                    "num_encoding_fn_dir": 2,
                    "log_sampling_dir": True,
                },
            },
            "optimizer": {"type": "Adam", "lr": 5.0e-4},
            "scheduler": {"lr_decay": 250, "lr_decay_factor": 0.1},
            "nerf": {
                "use_viewdirs": True,
                "encode_position_fn": "positional_encoding",
                "encode_direction_fn": "positional_encoding",
                "train": {
                    "num_random_rays": 128,
                    "chunksize": 2048,
                    "perturb": True,
                    "num_coarse": 8,
                    "num_fine": 8,
                    "white_background": False,
                    "radiance_field_noise_std": 0.1,
                    "lindisp": False,
                },
                "validation": {
                    "chunksize": 256,
                    "perturb": True,
                    "num_coarse": 8,
                    "num_fine": 8,
                    "white_background": False,
                    "radiance_field_noise_std": 0.0,
                    "lindisp": False,
                },
            },
        }
    )


class TestTrainLoop:
    def test_e2e_train_validate_checkpoint(self, synth_dir, tmp_path):
        cfg = _tiny_cfg(synth_dir, str(tmp_path / "logs"))
        state = train(cfg, log=True, export_torch=True)
        assert int(state.step) == 12
        logdir = os.path.join(str(tmp_path / "logs"), "tiny")
        assert os.path.exists(os.path.join(logdir, "config.yml"))
        # native checkpoint directory + exported torch ckpt
        ckpts = [d for d in os.listdir(logdir) if d.startswith("checkpoint")]
        assert any(d.endswith(".ckpt") for d in ckpts)
        assert any(not d.endswith(".ckpt") for d in ckpts)

    def test_resume_from_native_checkpoint(self, synth_dir, tmp_path):
        cfg = _tiny_cfg(synth_dir, str(tmp_path / "logs2"), train_iters=11)
        state = train(cfg, log=False)
        logdir = os.path.join(str(tmp_path / "logs2"), "tiny")
        latest = ckpt_lib.latest_checkpoint(logdir)
        assert latest is not None
        cfg2 = _tiny_cfg(synth_dir, str(tmp_path / "logs2"), train_iters=15)
        state2 = train(cfg2, load_checkpoint=latest, log=False)
        assert int(state2.step) == 15

    def test_resume_is_bit_identical_to_uninterrupted(self, synth_dir, tmp_path):
        """Counter-based step keys + counter-based feed stream: training
        N iters straight == training k, checkpointing, and resuming for
        the remaining N-k — bitwise identical params. (Before this
        guarantee, a resume replayed the step-0 randomness.)"""
        cfg_a = _tiny_cfg(synth_dir, str(tmp_path / "one_shot"), train_iters=8)
        full = train(cfg_a, log=False)

        cfg_b = _tiny_cfg(synth_dir, str(tmp_path / "two_legs"), train_iters=8)
        train(cfg_b, log=False, max_iters=4)
        logdir = os.path.join(str(tmp_path / "two_legs"), "tiny")
        latest = ckpt_lib.latest_checkpoint(logdir)
        assert latest is not None
        resumed = train(cfg_b, load_checkpoint=latest, log=False)
        assert int(resumed.step) == 8

        flat_a = jax.tree_util.tree_leaves_with_path(full.params)
        flat_b = dict(jax.tree_util.tree_leaves_with_path(resumed.params))
        for path, leaf in flat_a:
            if leaf is None:
                continue
            np.testing.assert_array_equal(
                np.asarray(leaf), np.asarray(flat_b[path]),
                err_msg=jax.tree_util.keystr(path),
            )

    def test_missing_checkpoint_path_fails_loudly(self, synth_dir, tmp_path):
        """A typo'd --load-checkpoint must not silently restart a long
        schedule from scratch."""
        cfg = _tiny_cfg(synth_dir, str(tmp_path / "logs_missing"), train_iters=2)
        with pytest.raises(FileNotFoundError, match="load-checkpoint"):
            train(cfg, load_checkpoint=str(tmp_path / "no_such_ckpt"), log=False)

    def test_resume_from_torch_checkpoint(self, synth_dir, tmp_path):
        cfg = _tiny_cfg(synth_dir, str(tmp_path / "logs3"), train_iters=11)
        state = train(cfg, log=False, export_torch=True)
        logdir = os.path.join(str(tmp_path / "logs3"), "tiny")
        torch_ckpts = [f for f in os.listdir(logdir) if f.endswith(".ckpt")]
        path = os.path.join(logdir, sorted(torch_ckpts)[-1])
        loaded = ckpt_lib.load_torch_checkpoint(path)
        assert loaded["iter"] > 0
        assert loaded["coarse"] is not None and loaded["latent_codes"] is not None
        # weights import produces identical params
        mc, mf = build_models_from_cfg(cfg)
        from nerface_tpu.config import FeatureFlags
        from nerface_tpu.train.state import create_train_state

        fresh, _ = create_train_state(
            jax.random.PRNGKey(0), mc, mf, cfg, FeatureFlags(), n_train=4,
            background=jnp.zeros((24, 24, 3)),
        )
        imported = ckpt_lib.import_torch_weights(fresh, loaded)
        np.testing.assert_allclose(
            np.asarray(imported.params["coarse"]["fc_rgb.weight"]),
            loaded["coarse"]["fc_rgb.weight"],
        )
        np.testing.assert_allclose(
            np.asarray(imported.params["latent_codes"]), loaded["latent_codes"]
        )


class TestFullFrameRenderer:
    def test_render_shapes_and_tiling(self, synth_dir):
        ds = load_flame_data(synth_dir)
        model = MODELS["ConditionalBlendshapePaperNeRFModel"](
            num_encoding_fn_xyz=4, num_encoding_fn_dir=2
        )
        pc = model.init(jax.random.PRNGKey(0))
        pf = model.init(jax.random.PRNGKey(1))
        settings = RenderSettings(
            num_coarse=8, num_fine=8, perturb=False,
            radiance_field_noise_std=0.0, near=0.2, far=0.8,
            encode_xyz=EncodeSpec(4, True, True), encode_dir=EncodeSpec(2, False, True),
            chunksize=100,  # deliberately not a divisor of 24*24
        )
        bg = jnp.asarray(ds.load_background())
        out = render_full_frame(
            model, model, pc, pf, ds.H, ds.W, ds.intrinsics,
            ds.poses[0][:3, :4], settings,
            expressions=jnp.asarray(ds.expressions[0]),
            latent_code=jnp.zeros(32),
            background=bg,
        )
        assert out["rgb_fine"].shape == (24, 24, 3)
        assert out["disp_fine"].shape == (24, 24)
        assert out["bg_weight"].shape == (24, 24)
        assert np.isfinite(np.asarray(out["rgb_fine"])).all()

        # Tiling must not change results: render with a different tile size.
        out2 = render_full_frame(
            model, model, pc, pf, ds.H, ds.W, ds.intrinsics,
            ds.poses[0][:3, :4], settings,
            expressions=jnp.asarray(ds.expressions[0]),
            latent_code=jnp.zeros(32),
            background=bg,
            tile=24 * 24,
        )
        np.testing.assert_allclose(
            np.asarray(out["rgb_fine"]), np.asarray(out2["rgb_fine"]),
            atol=1e-5,
        )


class TestNormals:
    def test_normal_map_shapes_and_flat_plane(self):
        H = W = 16
        depth = jnp.ones((H, W)) * 2.0
        intr = jnp.asarray([20.0, 20.0, 0.5, 0.5])
        normals = normal_map_from_depth(depth, intr, weights=None, clean=False)
        assert normals.shape == (H - 1, W - 1, 3)
        n = np.asarray(normals) / 255.0 * 2.0 - 1.0
        # A fronto-parallel plane's normals point along +/-z.
        assert np.abs(np.abs(n[..., 2]) - 1.0).max() < 1e-4

    def test_clean_masks_background(self):
        H = W = 8
        depth = jnp.ones((H, W))
        intr = jnp.asarray([10.0, 10.0, 0.5, 0.5])
        weights = jnp.ones((H, W))  # all background
        normals = normal_map_from_depth(depth, intr, weights=weights, clean=True)
        np.testing.assert_allclose(np.asarray(normals), 255.0, atol=1e-4)
