"""Multi-chip full-frame rendering on the 8-device virtual CPU mesh:
sharded output must equal the single-device render."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from nerface_tpu.models import MODELS
from nerface_tpu.render.pipeline import EncodeSpec, RenderSettings
from nerface_tpu.eval.renderer import render_full_frame


@pytest.fixture(scope="module")
def setup():
    model = MODELS["ConditionalBlendshapePaperNeRFModel"](
        num_encoding_fn_xyz=4, num_encoding_fn_dir=2,
    )
    params = model.init(jax.random.PRNGKey(0))
    settings = RenderSettings(
        num_coarse=4, num_fine=4, perturb=False,
        radiance_field_noise_std=0.0, near=0.2, far=0.8,
        encode_xyz=EncodeSpec(4, True, True),
        encode_dir=EncodeSpec(2, False, True),
        chunksize=64,
    )
    H = W = 20  # H*W=400: not divisible by 8 devices -> exercises padding
    intr = np.array([25.0, 25.0, 0.5, 0.5], np.float32)
    pose = np.eye(4, dtype=np.float32)[:3, :4]
    pose[2, 3] = 0.5
    rng = np.random.RandomState(0)
    expr = jnp.asarray(rng.randn(76).astype(np.float32) * 0.1)
    bg = jnp.asarray(rng.rand(H, W, 3).astype(np.float32))
    return model, params, settings, H, W, intr, pose, expr, bg


class TestShardedRender:
    @pytest.mark.parametrize("n_dev", [8, 4])
    def test_matches_single_device(self, setup, n_dev):
        model, params, settings, H, W, intr, pose, expr, bg = setup
        assert len(jax.devices()) >= n_dev
        mesh = Mesh(np.asarray(jax.devices()[:n_dev]), ("data",))

        kwargs = dict(
            key=jax.random.PRNGKey(3),
            expressions=expr, latent_code=jnp.zeros(32), background=bg,
        )
        single = render_full_frame(
            model, model, params, params, H, W, intr, pose, settings, **kwargs
        )
        sharded = render_full_frame(
            model, model, params, params, H, W, intr, pose, settings,
            mesh=mesh, **kwargs,
        )
        assert set(sharded) == set(single) - set()
        for k in ("rgb_fine", "disp_fine", "acc_fine", "bg_weight"):
            a, b = np.asarray(single[k]), np.asarray(sharded[k])
            assert a.shape == b.shape, k
            # sharding changes the tile partition -> per-tile RNG keys
            # differ; with perturb off and noise 0 the render is
            # deterministic and must match exactly
            np.testing.assert_allclose(a, b, atol=1e-5, err_msg=k)

    def test_matches_single_device_with_rng(self, setup):
        """perturb=True + sigma noise: per-ray draws are keyed by global
        ray index, so the sharded frame reproduces the single-device frame
        even on the stochastic validation path (the reference's
        validation.perturb=True quirk)."""
        import dataclasses

        model, params, settings, H, W, intr, pose, expr, bg = setup
        settings = dataclasses.replace(
            settings, perturb=True, radiance_field_noise_std=0.1
        )
        mesh = Mesh(np.asarray(jax.devices()), ("data",))
        kwargs = dict(
            key=jax.random.PRNGKey(3),
            expressions=expr, latent_code=jnp.zeros(32), background=bg,
        )
        single = render_full_frame(
            model, model, params, params, H, W, intr, pose, settings, **kwargs
        )
        sharded = render_full_frame(
            model, model, params, params, H, W, intr, pose, settings,
            mesh=mesh, **kwargs,
        )
        for k in ("rgb_fine", "disp_fine", "acc_fine", "bg_weight"):
            np.testing.assert_allclose(
                np.asarray(single[k]), np.asarray(sharded[k]), atol=1e-5,
                err_msg=k,
            )

    def test_validate_uses_mesh(self, setup, tmp_path):
        """An 8-device training job's validation frame renders across the
        mesh (train/loop.py threads the mesh into render_full_frame)."""
        from nerface_tpu.config import CfgNode, FeatureFlags
        from nerface_tpu.data.synthetic import make_synthetic_flame_dataset
        from nerface_tpu.data import load_flame_data
        from nerface_tpu.models import MODELS
        from nerface_tpu.train.loop import validate
        from nerface_tpu.train.state import create_train_state

        model, params, settings, H, W, intr, pose, expr, bg = setup
        make_synthetic_flame_dataset(str(tmp_path), H=16, W=16, n_train=2,
                                     n_val=2, n_test=1)
        dataset = load_flame_data(str(tmp_path))
        cfg = CfgNode({
            "dataset": {"near": 0.2, "far": 0.8, "no_ndc": True},
            "optimizer": {"type": "Adam", "lr": 5e-4},
            "scheduler": {"lr_decay": 250, "lr_decay_factor": 0.1},
            "models": {"coarse": {
                "use_viewdirs": True, "num_encoding_fn_dir": 2,
                "include_input_dir": False, "log_sampling_dir": True,
                "num_encoding_fn_xyz": 4, "include_input_xyz": True,
                "log_sampling_xyz": True,
            }},
            "nerf": {"use_viewdirs": True, "validation": {
                "num_coarse": 4, "num_fine": 4, "perturb": True,
                "radiance_field_noise_std": 0.0, "white_background": False,
                "lindisp": False, "chunksize": 64,
            }},
        })
        flags = FeatureFlags(fixed_background=True)
        state, _ = create_train_state(
            jax.random.PRNGKey(0), model, model, cfg, flags,
            n_train=len(dataset.i_train),
            background=jnp.asarray(dataset.load_background()),
        )
        mesh = Mesh(np.asarray(jax.devices()), ("data",))
        vm_mesh = validate(
            cfg, dataset, model, model, state, dataset.load_background(),
            flags, None, step=0, mesh=mesh,
        )
        vm_single = validate(
            cfg, dataset, model, model, state, dataset.load_background(),
            flags, None, step=0,
        )
        assert np.isfinite(vm_mesh["loss"])
        np.testing.assert_allclose(vm_mesh["loss"], vm_single["loss"], rtol=1e-5)

    def test_no_background(self, setup):
        model, params, settings, H, W, intr, pose, expr, _ = setup
        mesh = Mesh(np.asarray(jax.devices()[:2]), ("data",))
        out = render_full_frame(
            model, model, params, params, H, W, intr, pose, settings,
            key=jax.random.PRNGKey(0), expressions=expr,
            latent_code=jnp.zeros(32), mesh=mesh,
        )
        assert np.isfinite(np.asarray(out["rgb_fine"])).all()
