"""Multi-process distributed backend (SURVEY §5: `jax.distributed` +
collectives over ICI/DCN; the reference is single-process —
`train_transformed_rays.py:80-83`).

The end-to-end check spawns real OS processes that join one global mesh via
`jax.distributed.initialize` (cross-process Gloo collectives on CPU) and
asserts the data-parallel train step matches the single-process mesh.
"""

import numpy as np
import pytest

import jax


class TestHelpers:
    def test_global_data_mesh_spans_all_devices(self):
        from nerface_tpu.train.distributed import global_data_mesh

        mesh = global_data_mesh()
        assert mesh.axis_names == ("data",)
        assert mesh.devices.size == len(jax.devices())

    def test_process_ray_slice_single_process(self):
        from nerface_tpu.train.distributed import process_ray_slice

        assert process_ray_slice(64) == slice(0, 64)

    def test_global_batch_single_process_passthrough(self):
        from nerface_tpu.train.distributed import global_batch, global_data_mesh

        batch = {
            "ray_origins": np.zeros((16, 3), np.float32),
            "expression": np.zeros((76,), np.float32),
        }
        out = global_batch(batch, global_data_mesh())
        assert out["ray_origins"].shape == (16, 3)
        assert out["expression"].shape == (76,)

    def test_is_primary(self):
        from nerface_tpu.train.distributed import is_primary

        assert is_primary()  # single-process pytest run


class TestMultiProcessDryrun:
    def test_two_process_step_matches_single_process(self):
        """2 processes x 2 virtual CPU devices == one 4-device mesh: the
        full DP train step (forward + grads + cross-process all-reduce +
        Adam) must produce the same parameters either way.  Asserted
        inside `_dryrun_multiprocess` (np.testing.assert_allclose on every
        parameter leaf)."""
        import __graft_entry__ as g

        g.dryrun_multichip(4, n_processes=2)


class TestTrainCliFlags:
    def test_parser_accepts_coordinator_flags(self):
        from nerface_tpu.cli.train import build_parser

        args = build_parser().parse_args([
            "--config", "x.yml", "--coordinator-address", "localhost:1234",
            "--num-processes", "2", "--process-id", "1",
        ])
        assert args.coordinator_address == "localhost:1234"
        assert args.num_processes == 2 and args.process_id == 1

    def test_coordinator_needs_process_args(self):
        from nerface_tpu.cli.train import main

        with pytest.raises(SystemExit, match="num-processes"):
            main(["--config", "x.yml",
                  "--coordinator-address", "localhost:1"])
