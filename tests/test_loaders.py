"""Blender/LLFF loader tests + NDC render path (equivalent surface:
`nerf/load_blender.py`, `nerf/load_llff.py`, `train_utils.py:198-207`)."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerface_tpu.data.blender import load_blender_data
from nerface_tpu.data.llff import (
    load_llff_data,
    poses_avg,
    recenter_poses,
    render_path_spiral,
    spherify_poses,
    viewmatrix,
)


def _make_blender_dataset(path, H=20, W=20, n=(3, 2, 2)):
    from PIL import Image

    rng = np.random.RandomState(0)
    for split, count in zip(("train", "val", "test"), n):
        os.makedirs(os.path.join(path, split), exist_ok=True)
        frames = []
        for i in range(count):
            img = (rng.rand(H, W, 4) * 255).astype(np.uint8)  # RGBA like blender
            name = f"r_{i}"
            Image.fromarray(img).save(os.path.join(path, split, name + ".png"))
            c2w = np.eye(4)
            c2w[2, 3] = 4.0 + 0.1 * i
            frames.append(
                {"file_path": f"{split}/{name}", "transform_matrix": c2w.tolist()}
            )
        with open(os.path.join(path, f"transforms_{split}.json"), "w") as f:
            json.dump({"camera_angle_x": 0.6911, "frames": frames}, f)
    return path


def _make_llff_dataset(path, H=24, W=32, n=5):
    from PIL import Image

    rng = np.random.RandomState(1)
    os.makedirs(os.path.join(path, "images"), exist_ok=True)
    for i in range(n):
        img = (rng.rand(H, W, 3) * 255).astype(np.uint8)
        Image.fromarray(img).save(os.path.join(path, "images", f"im_{i:03d}.png"))
    # poses_bounds rows: 3x5 pose (with hwf column) + 2 bounds. Cameras on
    # a small arc looking at the origin so spherify's least-squares center
    # is well-conditioned. LLFF raw axis columns are [down right back]: the
    # loader maps new_col0 = col1, new_col1 = -col0, so we pre-invert.
    from nerface_tpu.tools.dataset_builder import look_at

    poses = np.zeros((n, 3, 5))
    for i in range(n):
        th = 0.4 * (i - n / 2) / n
        cam = np.array([np.sin(th), 0.1 * np.cos(3 * th), np.cos(th)]) * 2.0
        c2w = look_at(cam, np.zeros(3))[:3, :4]
        raw = np.zeros((3, 4))
        raw[:, 1] = c2w[:, 0]       # right
        raw[:, 0] = -c2w[:, 1]      # down = -up
        raw[:, 2:] = c2w[:, 2:]
        poses[i, :3, :4] = raw
        poses[i, :3, 4] = [H, W, 50.0]
    bds = np.stack([np.full(n, 1.0), np.full(n, 5.0)], axis=-1)
    arr = np.concatenate([poses.reshape(n, -1), bds], axis=-1)
    np.save(os.path.join(path, "poses_bounds.npy"), arr)
    return path


class TestBlenderLoader:
    def test_load_and_splits(self, tmp_path):
        ds = load_blender_data(_make_blender_dataset(str(tmp_path / "b")))
        assert ds.images.shape == (7, 20, 20, 4)
        assert ds.images.dtype == np.float32 and ds.images.max() <= 1.0
        assert [len(s) for s in ds.i_split] == [3, 2, 2]
        assert ds.render_poses.shape == (40, 4, 4)
        # focal from camera_angle_x
        assert ds.focal == pytest.approx(
            0.5 * 20 / np.tan(0.5 * 0.6911), rel=1e-6
        )
        np.testing.assert_allclose(
            ds.intrinsics, [ds.focal, ds.focal, 0.5, 0.5], rtol=1e-6
        )

    def test_testskip(self, tmp_path):
        ds = load_blender_data(
            _make_blender_dataset(str(tmp_path / "b2"), n=(3, 4, 4)), testskip=2
        )
        assert [len(s) for s in ds.i_split] == [3, 2, 2]

    def test_half_res(self, tmp_path):
        ds = load_blender_data(
            _make_blender_dataset(str(tmp_path / "b3")), half_res=True
        )
        assert ds.H == 10 and ds.W == 10
        assert ds.images.shape[1:3] == (10, 10)

    def test_render_poses_on_sphere(self, tmp_path):
        ds = load_blender_data(_make_blender_dataset(str(tmp_path / "b4")))
        radii = np.linalg.norm(ds.render_poses[:, :3, 3], axis=-1)
        np.testing.assert_allclose(radii, 4.0, rtol=1e-5)


class TestLLFFLoader:
    def test_load_shapes_and_rescale(self, tmp_path):
        ds = load_llff_data(_make_llff_dataset(str(tmp_path / "l")), factor=1)
        assert ds.images.shape == (5, 24, 32, 3)
        assert ds.poses.shape == (5, 3, 5)
        assert ds.render_poses.shape[0] == 120
        assert 0 <= ds.i_test < 5
        # bd rescale: bds.min() * bd_factor == 1
        assert ds.bds.min() == pytest.approx(1.0 / 0.75, rel=1e-5)

    def test_minify_factor(self, tmp_path):
        base = _make_llff_dataset(str(tmp_path / "l2"))
        ds = load_llff_data(base, factor=2)
        assert ds.images.shape == (5, 12, 16, 3)
        assert os.path.isdir(os.path.join(base, "images_2"))
        # focal scaled by factor
        assert ds.hwf[2] == pytest.approx(25.0, rel=1e-5)

    def test_spherify(self, tmp_path):
        ds = load_llff_data(
            _make_llff_dataset(str(tmp_path / "l3")), factor=1, spherify=True
        )
        assert ds.render_poses.shape[0] == 120
        assert np.isfinite(ds.render_poses).all()

    def test_recenter_makes_avg_identity(self, tmp_path):
        ds = load_llff_data(_make_llff_dataset(str(tmp_path / "l4")), factor=1)
        avg = poses_avg(ds.poses)
        np.testing.assert_allclose(avg[:3, :3], np.eye(3), atol=1e-5)
        np.testing.assert_allclose(avg[:3, 3], 0.0, atol=1e-5)

    def test_viewmatrix_orthonormal(self):
        m = viewmatrix(
            np.array([0.0, 0.0, 1.0]), np.array([0.0, 1.0, 0.0]),
            np.array([1.0, 2.0, 3.0]),
        )
        R = m[:3, :3]
        np.testing.assert_allclose(R.T @ R, np.eye(3), atol=1e-12)


class TestNDCRenderPath:
    def test_run_one_iter_ndc(self):
        from nerface_tpu.models import MODELS
        from nerface_tpu.ops.rays import get_ray_bundle
        from nerface_tpu.render.pipeline import (
            EncodeSpec,
            RenderSettings,
            run_one_iter_of_nerf,
        )

        model = MODELS["FlexibleNeRFModel"](
            num_encoding_fn_xyz=2, num_encoding_fn_dir=2,
            num_layers=2, hidden_size=16,
        )
        params = model.init(jax.random.PRNGKey(0))
        settings = RenderSettings(
            num_coarse=4, num_fine=0, perturb=False,
            radiance_field_noise_std=0.0, no_ndc=False, near=1.0, far=6.0,
            encode_xyz=EncodeSpec(2, True, True),
            encode_dir=EncodeSpec(2, False, True),
        )
        H = W = 8
        focal = 10.0
        ro, rd = get_ray_bundle(
            H, W, jnp.asarray([focal, focal, 0.5, 0.5]),
            jnp.asarray(np.eye(4)[:3, :4], jnp.float32),
        )
        out = run_one_iter_of_nerf(
            H, W, model, None, params, None, ro, rd, settings,
            mode="validation", focal=focal,
        )
        rgb = out[0]
        assert rgb.shape == (H, W, 3)
        assert np.isfinite(np.asarray(rgb)).all()

    def test_ndc_requires_focal(self):
        from nerface_tpu.models import MODELS
        from nerface_tpu.render.pipeline import (
            EncodeSpec,
            RenderSettings,
            run_one_iter_of_nerf,
        )

        model = MODELS["FlexibleNeRFModel"](
            num_encoding_fn_xyz=2, num_encoding_fn_dir=2,
            num_layers=2, hidden_size=16,
        )
        params = model.init(jax.random.PRNGKey(0))
        settings = RenderSettings(
            num_coarse=4, num_fine=0, no_ndc=False,
            encode_xyz=EncodeSpec(2, True, True), encode_dir=None,
            use_viewdirs=False,
        )
        with pytest.raises(ValueError, match="focal"):
            run_one_iter_of_nerf(
                4, 4, model, None, params, None,
                jnp.zeros((16, 3)), jnp.ones((16, 3)), settings,
            )
