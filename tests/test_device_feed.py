"""Device-resident ray feed: distribution, schema parity with the host
feed, and end-to-end training integration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerface_tpu.data import load_flame_data
from nerface_tpu.data.device_feed import DeviceRayFeed
from nerface_tpu.data.synthetic import make_synthetic_flame_dataset


@pytest.fixture(scope="module")
def ds(tmp_path_factory):
    root = tmp_path_factory.mktemp("dfeed")
    d = make_synthetic_flame_dataset(
        str(root / "ds"), H=16, W=16, n_train=4, n_val=1, n_test=1,
        num_samples=4,
    )
    return load_flame_data(d)


class TestDeviceFeed:
    def test_batch_schema_matches_host_feed(self, ds):
        from nerface_tpu.data import RayFeed

        bg = ds.load_background()
        host = RayFeed(ds, num_rays=32, background=bg, seed=0).sample_batch()
        sampler = DeviceRayFeed(ds, num_rays=32, background=bg).make_sampler()
        dev = sampler(jax.random.PRNGKey(0))
        assert set(dev) == set(host)
        for k in host:
            assert np.asarray(dev[k]).shape == np.asarray(host[k]).shape, k

    def test_rays_match_direct_computation(self, ds):
        sampler = DeviceRayFeed(ds, num_rays=16).make_sampler()
        b = sampler(jax.random.PRNGKey(3))
        t = int(np.where(np.asarray(ds.i_train) == int(b["frame_index"]))[0][0])
        pose = ds.poses[ds.i_train[t]]
        feed = DeviceRayFeed(ds, num_rays=16)
        sel = np.asarray(b["pixel_indices"], np.int64)
        rd_ref = np.asarray(feed.dirs_cam)[sel] @ pose[:3, :3].T
        np.testing.assert_allclose(
            np.asarray(b["ray_directions"]), rd_ref, rtol=1e-5
        )
        # targets match the frame's pixels (uint8 quantized)
        img = ds.images[ds.i_train[t]].reshape(-1, ds.images.shape[-1])[:, :3]
        np.testing.assert_allclose(
            np.asarray(b["target_rgb"]), img[sel], atol=1 / 255.0 + 1e-6
        )

    def test_without_replacement_and_importance(self, ds):
        sampler = DeviceRayFeed(ds, num_rays=64).make_sampler()
        in_frac = []
        for i in range(10):
            b = sampler(jax.random.PRNGKey(i))
            sel = np.asarray(b["pixel_indices"])
            assert len(set(sel.tolist())) == 64
            t = int(np.where(np.asarray(ds.i_train) == int(b["frame_index"]))[0][0])
            bbox = ds.bboxes[ds.i_train[t]]
            rows, cols = sel // ds.W, sel % ds.W
            inside = (
                (rows >= bbox[0]) & (rows < bbox[1])
                & (cols >= bbox[2]) & (cols < bbox[3])
            )
            in_frac.append(inside.mean())
        assert np.mean(in_frac) > 0.4  # importance map biases into the bbox

    def test_train_with_device_feed(self, ds, tmp_path):
        from nerface_tpu.config import CfgNode
        from nerface_tpu.train.loop import train

        cfg = CfgNode({
            "experiment": {"id": "d", "logdir": str(tmp_path), "randomseed": 1,
                           "train_iters": 3, "validate_every": 0,
                           "save_every": 0, "print_every": 10},
            "dataset": {"basedir": ds.basedir, "type": "blender",
                        "no_ndc": True, "near": 0.2, "far": 0.8,
                        "half_res": False, "testskip": 1},
            "models": {"coarse": {
                "type": "ConditionalBlendshapePaperNeRFModel",
                "num_encoding_fn_xyz": 4, "num_encoding_fn_dir": 2,
                "include_input_xyz": True, "include_input_dir": False,
                "use_viewdirs": True, "num_layers": 4, "hidden_size": 32,
                "log_sampling_xyz": True, "log_sampling_dir": True,
            }},
            "optimizer": {"type": "Adam", "lr": 5e-4},
            "scheduler": {"lr_decay": 250, "lr_decay_factor": 0.1},
            "nerf": {"use_viewdirs": True,
                     "train": {"num_random_rays": 32, "chunksize": 512,
                               "perturb": True, "num_coarse": 4,
                               "num_fine": 0, "white_background": False,
                               "radiance_field_noise_std": 0.1,
                               "lindisp": False},
                     "validation": {"chunksize": 128, "perturb": False,
                                    "num_coarse": 4, "num_fine": 0,
                                    "white_background": False,
                                    "radiance_field_noise_std": 0.0,
                                    "lindisp": False}},
        })
        state = train(cfg, dataset=ds, log=False, device_feed=True)
        assert int(state.step) == 3


class TestMeshDeviceFeed:
    """The feed's target regime: a data-parallel mesh where every device
    draws its own ray batch in place (no host sampling, no cross-device
    gather)."""

    @pytest.fixture(scope="class")
    def mesh(self):
        from jax.sharding import Mesh

        n = min(4, len(jax.devices()))
        return Mesh(np.asarray(jax.devices()[:n]), ("data",))

    def test_schema_and_sharding(self, ds, mesh):
        bg = ds.load_background()
        feed = DeviceRayFeed(ds, num_rays=16, background=bg)
        batch = feed.make_mesh_sampler(mesh)(jax.random.PRNGKey(0))
        n_dev = mesh.devices.size
        assert batch["ray_origins"].shape == (n_dev * 16, 3)
        assert batch["expression"].shape == (76,)
        # the ray axis really is laid out one-device-one-block
        from jax.sharding import NamedSharding, PartitionSpec as P

        assert batch["ray_directions"].sharding.is_equivalent_to(
            NamedSharding(mesh, P("data")), 2
        )

    def test_per_device_determinism_and_distinct_draws(self, ds, mesh):
        feed = DeviceRayFeed(ds, num_rays=16)
        sample = feed.make_mesh_sampler(mesh)
        key = jax.random.PRNGKey(7)
        a = sample(key)
        b = sample(key)
        for k in a:
            np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))
        n_dev = mesh.devices.size
        if n_dev > 1:
            sel = np.asarray(a["pixel_indices"]).reshape(n_dev, 16)
            assert not np.array_equal(sel[0], sel[1])
        # block d == the shared draw keyed by fold_in(k_pix, d)
        k_frame, k_pix = jax.random.split(key)
        blk0 = feed._draw(k_frame, jax.random.fold_in(k_pix, 0))
        np.testing.assert_array_equal(
            np.asarray(a["pixel_indices"])[:16],
            np.asarray(blk0["pixel_indices"]),
        )

    def test_feeds_the_dp_step(self, ds, mesh):
        """One DP train step on the mesh consuming a mesh-sampled batch."""
        import jax.numpy as jnp

        from nerface_tpu.config import CfgNode, FeatureFlags
        from nerface_tpu.models import MODELS
        from nerface_tpu.render.pipeline import EncodeSpec, RenderSettings
        from nerface_tpu.train.state import create_train_state
        from nerface_tpu.train.step import make_train_step

        bg = ds.load_background()
        feed = DeviceRayFeed(ds, num_rays=16, background=bg)
        batch = feed.make_mesh_sampler(mesh)(jax.random.PRNGKey(1))

        model = MODELS["ConditionalBlendshapePaperNeRFModel"](
            num_encoding_fn_xyz=4, num_encoding_fn_dir=2
        )
        cfg = CfgNode({
            "optimizer": {"type": "Adam", "lr": 5e-4},
            "scheduler": {"lr_decay": 250, "lr_decay_factor": 0.1},
        })
        flags = FeatureFlags()
        settings = RenderSettings(
            num_coarse=4, num_fine=4, perturb=True,
            radiance_field_noise_std=0.1, near=0.2, far=0.8,
            encode_xyz=EncodeSpec(4, True, True),
            encode_dir=EncodeSpec(2, False, True),
        )
        state, opt = create_train_state(
            jax.random.PRNGKey(0), model, model, cfg, flags,
            n_train=len(ds.i_train), background=jnp.asarray(bg),
        )
        step = make_train_step(model, model, settings, flags, opt, mesh=mesh)
        state2, metrics = step(state, batch, jax.random.PRNGKey(2))
        assert int(state2.step) == 1
        assert np.isfinite(float(metrics["total_loss"]))
