"""Auxiliary-subsystem tests: dataset npz cache, profiling utilities, and
the synthetic-dataset CLI."""

import os
import time

import numpy as np
import pytest

from nerface_tpu.data import load_flame_data
from nerface_tpu.data.synthetic import make_synthetic_flame_dataset
from nerface_tpu.utils.profiling import RateMeter, profile_trace


class TestDatasetCache:
    def test_cache_roundtrip(self, tmp_path):
        ds_dir = make_synthetic_flame_dataset(
            str(tmp_path / "ds"), H=16, W=16, n_train=3, n_val=1, n_test=1,
            num_samples=4,
        )
        cache = str(tmp_path / "cache")
        ds1 = load_flame_data(ds_dir, cachedir=cache)
        files = os.listdir(cache)
        assert len(files) == 1 and files[0].endswith(".npz")
        ds2 = load_flame_data(ds_dir, cachedir=cache)
        np.testing.assert_array_equal(ds1.images, ds2.images)
        np.testing.assert_array_equal(ds1.poses, ds2.poses)
        np.testing.assert_array_equal(ds1.bboxes, ds2.bboxes)
        np.testing.assert_array_equal(ds1.expressions, ds2.expressions)
        assert [list(a) for a in ds1.i_split] == [list(a) for a in ds2.i_split]
        assert (ds1.H, ds1.W) == (ds2.H, ds2.W)
        assert ds2.basedir == ds1.basedir  # load_background still works
        np.testing.assert_array_equal(
            ds1.load_background(), ds2.load_background()
        )

    def test_cache_key_varies_with_options(self, tmp_path):
        ds_dir = make_synthetic_flame_dataset(
            str(tmp_path / "ds"), H=16, W=16, n_train=3, n_val=1, n_test=1,
            num_samples=4,
        )
        cache = str(tmp_path / "cache")
        load_flame_data(ds_dir, cachedir=cache)
        load_flame_data(ds_dir, cachedir=cache, test=True)
        assert len(os.listdir(cache)) == 2


class TestProfiling:
    def test_rate_meter(self):
        m = RateMeter(smoothing=0.0)
        m.update(100)
        time.sleep(0.01)
        r = m.update(100)
        assert 1000 < r < 100000  # ~100/0.01s
        assert m.total == 200

    def test_profile_trace_writes(self, tmp_path):
        import jax
        import jax.numpy as jnp

        logdir = str(tmp_path / "trace")
        with profile_trace(logdir):
            jnp.ones((8, 8)).sum().block_until_ready()
        # jax writes plugins/profile/<ts>/ under the logdir
        found = []
        for root, _, files in os.walk(logdir):
            found.extend(files)
        assert found, "no trace artifacts written"


class TestGenerateSyntheticCLI:
    def test_generates_loadable_dataset(self, tmp_path):
        from nerface_tpu.cli.generate_synthetic import main

        target = str(tmp_path / "gen")
        main([
            "--target", target, "--n-train", "4", "--n-val", "2",
            "--n-test", "2", "--size", "16", "--sampling", "LATTICE",
        ])
        ds = load_flame_data(target)
        assert len(ds.i_train) == 4 and len(ds.i_val) == 2
        assert ds.images.shape[1:3] == (16, 16)
        assert os.path.exists(os.path.join(target, "bg", "00050.png"))
        imap = np.load(os.path.join(target, "index_map.npy"))
        assert imap.shape == (8, 2)

    @pytest.mark.parametrize("mode", ["CURVE", "HELIX"])
    def test_other_sampling_modes(self, tmp_path, mode):
        from nerface_tpu.cli.generate_synthetic import main

        target = str(tmp_path / f"gen_{mode}")
        main(["--target", target, "--n-train", "2", "--n-val", "1",
              "--n-test", "1", "--size", "12", "--sampling", mode])
        ds = load_flame_data(target)
        assert len(ds.images) == 4


class TestDumpRays:
    def test_writes_valid_ply(self, tmp_path):
        from nerface_tpu.utils.debug_viz import dump_rays

        rng = np.random.RandomState(0)
        R, S = 2000, 8
        points = rng.randn(R, S, 3).astype(np.float32)
        rf = rng.rand(R, S, 4).astype(np.float32)
        rf[..., 3] = rng.rand(R, S) * 40  # some high densities
        origins = rng.randn(5, 3)
        path = str(tmp_path / "rays.ply")
        n = dump_rays(origins, points, rf, path=path, stride=1,
                      include_origins=True)
        lines = open(path).read().splitlines()
        assert lines[0] == "ply"
        assert f"element vertex {n}" in lines[2]
        assert lines[9] == "end_header"
        body = [l for l in lines[10:] if l]
        assert len(body) == n
        assert all(len(l.split()) == 6 for l in body)  # x y z r g b

    def test_threshold_filters(self, tmp_path):
        from nerface_tpu.utils.debug_viz import dump_rays

        rf = np.zeros((100, 4, 4), np.float32)  # zero density everywhere
        n = dump_rays(np.zeros((1, 3)), np.zeros((100, 4, 3)), rf,
                      path=str(tmp_path / "e.ply"))
        assert n == 0


class TestLatestCheckpoint:
    """`latest_checkpoint` must rank steps numerically (the paper schedule
    crosses 99999 → 6-digit names break lexical order) and skip partial
    saves (no orbax `_CHECKPOINT_METADATA` commit marker)."""

    @staticmethod
    def _mk(root, step, complete=True):
        d = root / f"checkpoint{step:05d}"
        d.mkdir()
        if complete:
            (d / "_CHECKPOINT_METADATA").write_text("{}")
        return str(d)

    def test_numeric_order_past_100k(self, tmp_path):
        from nerface_tpu.train.checkpoint import latest_checkpoint

        self._mk(tmp_path, 95001)
        want = self._mk(tmp_path, 100001)
        assert latest_checkpoint(str(tmp_path)) == want

    def test_skips_partial_and_sidecars(self, tmp_path):
        from nerface_tpu.train.checkpoint import latest_checkpoint

        want = self._mk(tmp_path, 5001)
        self._mk(tmp_path, 10001, complete=False)  # killed mid-save
        (tmp_path / "checkpoint10001.metrics.json").write_text("{}")
        assert latest_checkpoint(str(tmp_path)) == want

    def test_empty_dir(self, tmp_path):
        from nerface_tpu.train.checkpoint import latest_checkpoint

        assert latest_checkpoint(str(tmp_path)) is None
        assert latest_checkpoint(str(tmp_path / "missing")) is None
