"""Data-layer tests: synthetic dataset round-trip through the loader,
importance sampling statistics, and the prefetching ray feed."""

import numpy as np
import pytest

from nerface_tpu.data import (
    RayFeed,
    build_importance_maps,
    load_flame_data,
    sample_ray_indices,
)
from nerface_tpu.data.synthetic import make_synthetic_flame_dataset
from nerface_tpu.ops.rays import ray_bundle_numpy


@pytest.fixture(scope="session")
def synth_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("synth")
    return make_synthetic_flame_dataset(str(d), n_train=6, n_val=2, n_test=2, H=32, W=32)


class TestLoader:
    def test_roundtrip(self, synth_dir):
        ds = load_flame_data(synth_dir)
        assert ds.images.shape == (10, 32, 32, 3)
        assert ds.images.dtype == np.float32
        assert 0.0 <= ds.images.min() and ds.images.max() <= 1.0
        assert ds.poses.shape == (10, 4, 4)
        assert ds.expressions.shape == (10, 76)
        assert list(map(len, ds.i_split)) == [6, 2, 2]
        assert ds.render_poses.shape == (40, 4, 4)
        # bbox in pixel coords
        assert ds.bboxes.dtype == np.int32
        assert (ds.bboxes[:, 1] <= 32).all()
        np.testing.assert_array_equal(ds.bboxes[0], [9, 22, 9, 22])

    def test_test_only(self, synth_dir):
        ds = load_flame_data(synth_dir, test=True)
        assert ds.images.shape[0] == 2
        assert len(ds.i_split) == 1

    def test_half_res(self, synth_dir):
        ds = load_flame_data(synth_dir, half_res=True)
        assert ds.images.shape[1:3] == (16, 16)
        full = load_flame_data(synth_dir)
        np.testing.assert_allclose(
            ds.intrinsics[:2], np.asarray(full.intrinsics[:2]) * 0.5
        )

    def test_background(self, synth_dir):
        ds = load_flame_data(synth_dir)
        bg = ds.load_background()
        assert bg.shape == (32, 32, 3)
        assert 0.0 <= bg.min() and bg.max() <= 1.0

    def test_index_map(self, synth_dir):
        ds = load_flame_data(synth_dir)
        idx_map = ds.load_index_map()
        assert idx_map.shape == (10, 2)
        assert (idx_map[:6, 1] >= 0).all()
        assert (idx_map[6:, 1] == -1).all()


class TestImportanceSampling:
    def test_maps_normalized_and_peaked(self, synth_dir):
        ds = load_flame_data(synth_dir)
        maps = build_importance_maps(ds.bboxes, ds.H, ds.W, ds.i_train)
        np.testing.assert_allclose(maps.sum(axis=1), 1.0, rtol=1e-9)
        m = maps[0].reshape(ds.H, ds.W)
        h0, h1, w0, w1 = ds.bboxes[0]
        assert m[(h0 + h1) // 2, (w0 + w1) // 2] / m[0, 0] == pytest.approx(9.0)

    def test_sampling_distribution(self, synth_dir):
        ds = load_flame_data(synth_dir)
        maps = build_importance_maps(ds.bboxes, ds.H, ds.W, ds.i_train)
        rng = np.random.RandomState(0)
        h0, h1, w0, w1 = ds.bboxes[0]
        bbox_mass = maps[0].reshape(ds.H, ds.W)[h0:h1, w0:w1].sum()
        inside_frac = []
        for _ in range(20):
            sel = sample_ray_indices(rng, maps[0], 128)
            assert len(np.unique(sel)) == 128  # without replacement
            rows, cols = sel // ds.W, sel % ds.W
            inside = ((rows >= h0) & (rows < h1) & (cols >= w0) & (cols < w1)).mean()
            inside_frac.append(inside)
        # Without-replacement draw of 128 of 1024 pixels: expected inside
        # fraction is close to (slightly below) the bbox probability mass.
        assert abs(np.mean(inside_frac) - bbox_mass) < 0.1


class TestRayFeed:
    def test_batch_contents(self, synth_dir):
        ds = load_flame_data(synth_dir)
        bg = ds.load_background()
        feed = RayFeed(ds, num_rays=64, background=bg, seed=1)
        batch = feed.sample_batch()
        assert batch["ray_origins"].shape == (64, 3)
        assert batch["ray_directions"].shape == (64, 3)
        assert batch["target_rgb"].shape == (64, 3)
        assert batch["background_rgb"].shape == (64, 3)
        assert batch["expression"].shape == (76,)
        idx = int(batch["latent_index"])
        assert idx in set(int(i) for i in ds.i_train)
        # Ray origin == camera center of the selected frame.
        np.testing.assert_allclose(
            batch["ray_origins"][0], ds.poses[idx][:3, 3], rtol=1e-6
        )

    def test_rays_match_full_bundle(self, synth_dir):
        """Feed's gather-then-rotate rays == full-bundle rays at the same pixels."""
        ds = load_flame_data(synth_dir)
        feed = RayFeed(ds, num_rays=32, seed=3)
        batch = feed.sample_batch()
        idx = int(batch["frame_index"])
        ro_full, rd_full = ray_bundle_numpy(ds.H, ds.W, ds.intrinsics, ds.poses[idx])
        rd_full = rd_full.reshape(-1, 3)
        # the batch reports its selected pixels (native and numpy samplers
        # draw different-but-equidistributed selections)
        sel = batch["pixel_indices"].astype(np.int64)
        np.testing.assert_allclose(batch["ray_directions"], rd_full[sel], atol=1e-5)
        np.testing.assert_allclose(
            batch["target_rgb"], ds.images[idx].reshape(-1, 3)[sel], atol=1e-7
        )

    def test_counter_stream_resumes_exactly(self, synth_dir):
        """Batch b depends only on (seed, b): a feed constructed with
        start_batch=k continues the uninterrupted stream from batch k —
        a resumed training run sees the exact batches the original run
        would have seen."""
        ds = load_flame_data(synth_dir)
        ref = RayFeed(ds, num_rays=32, seed=7)
        stream = [ref.sample_batch() for _ in range(6)]
        resumed = RayFeed(ds, num_rays=32, seed=7, start_batch=3)
        for want in stream[3:]:
            got = resumed.sample_batch()
            for k in ("pixel_indices", "frame_index", "target_rgb"):
                np.testing.assert_array_equal(got[k], want[k], err_msg=k)

    def test_prefetch_thread(self, synth_dir):
        ds = load_flame_data(synth_dir)
        with RayFeed(ds, num_rays=16, seed=0) as feed:
            batches = [next(feed) for _ in range(5)]
        assert len(batches) == 5
        assert all(b["ray_origins"].shape == (16, 3) for b in batches)
