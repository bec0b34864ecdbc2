"""Avatar serving tests: the resident render server over a trained
checkpoint (`nerface_tpu/serve.py`). No reference counterpart —
`eval_transformed_rays.py` is batch-only; the serving contract here is
that every request renders through the SAME jitted path as batch eval."""

import base64
import io
import json
import os
import socket
import threading

import numpy as np
import pytest

from nerface_tpu.config import CfgNode
from nerface_tpu.data.synthetic import make_synthetic_flame_dataset
from nerface_tpu.serve import AvatarServer

from test_eval_driver import _tiny_cfg


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    from nerface_tpu.train.checkpoint import latest_checkpoint
    from nerface_tpu.train.loop import train

    tmp = tmp_path_factory.mktemp("serve")
    ds = make_synthetic_flame_dataset(
        str(tmp / "ds"), H=16, W=16, n_train=3, n_val=1, n_test=2,
        num_samples=8,
    )
    cfg = _tiny_cfg(ds, str(tmp / "logs"))
    train(cfg, log=False)
    ckpt = latest_checkpoint(str(tmp / "logs" / "t"))
    return AvatarServer(cfg, checkpoint=ckpt, log=False)


class TestRender:
    def test_default_render(self, server):
        out = server.render()
        assert set(out) == {"rgb_fine"}
        assert out["rgb_fine"].shape == (16, 16, 3)
        assert out["rgb_fine"].dtype == np.uint8

    def test_all_maps(self, server):
        out = server.render(
            maps=("rgb_fine", "rgb_coarse", "disp", "depth", "acc", "normals")
        )
        for name in ("rgb_fine", "rgb_coarse"):
            assert out[name].shape == (16, 16, 3)
        for name in ("disp", "depth", "acc"):
            assert out[name].shape == (16, 16)
            assert out[name].dtype == np.uint8
        assert out["normals"].ndim == 3 and out["normals"].shape[2] == 3

    def test_matches_eval_renderer_defaults(self, server):
        """frame=0 equals the no-argument default (same pose/expr/code)."""
        a = server.render(seed=3)["rgb_fine"]
        b = server.render(frame=0, seed=3)["rgb_fine"]
        np.testing.assert_array_equal(a, b)

    def test_latent_row_matches_eval_driver_pin(self, server):
        """Default flags pin the latent row to idx_map[10] exactly like
        the eval driver (the reference's 'USE THIS' pin,
        eval/driver.py:282-286); per-frame rows only when unpinned."""
        saved_map = server.idx_map
        saved_pin = server.flags.fix_latent_code_index
        try:
            server.idx_map = np.stack(
                [np.arange(12), np.arange(12) + 100], axis=1
            )
            assert server.flags.fix_latent_code_index  # reference default
            assert server._frame_defaults(1)[2] == 110  # idx_map[10, 1]
            server.flags.fix_latent_code_index = False
            assert server._frame_defaults(1)[2] == 101  # idx_map[1, 1]
        finally:
            server.idx_map = saved_map
            server.flags.fix_latent_code_index = saved_pin

    def test_occupancy_server_renders(self, server, tmp_path):
        """A server built with occupancy fast-eval: grid built from the
        trained field at startup, frames render finite, and a
        fast_eval=False request still forces the parity path."""
        import copy

        from nerface_tpu.train.checkpoint import latest_checkpoint

        cfg = copy.deepcopy(server.cfg)
        cfg.nerf.validation["fast_eval"] = True
        cfg.nerf.validation["occupancy"] = True
        cfg.nerf.validation["occupancy_resolution"] = 16
        ckpt = latest_checkpoint(
            os.path.join(str(cfg.experiment.logdir), str(cfg.experiment.id))
        )
        srv = AvatarServer(cfg, checkpoint=ckpt, log=False)
        assert srv.occupancy is not None
        out = srv.render(frame=0)["rgb_fine"]
        assert out.shape == (16, 16, 3) and np.isfinite(out).all()
        parity = srv.render(frame=0, fast_eval=False)["rgb_fine"]
        assert parity.shape == (16, 16, 3)

    def test_fast_eval_override(self, server):
        """Per-request fast_eval: False is a no-op on a parity-mode
        server; True errors when the server has no bbox to skip with."""
        base = server.render(seed=2)["rgb_fine"]
        same = server.render(seed=2, fast_eval=False)["rgb_fine"]
        np.testing.assert_array_equal(base, same)
        with pytest.raises(ValueError):
            server.render(fast_eval=True)

    def test_expression_changes_output(self, server):
        base = server.render(seed=0)["rgb_fine"]
        expr = np.asarray(server._default_expression).copy()
        expr += 1.0
        moved = server.render(expression=expr, seed=0)["rgb_fine"]
        assert not np.array_equal(base, moved)

    def test_pose_override(self, server):
        pose = np.asarray(server._default_pose).copy()
        pose[:3, 3] += 0.25
        out = server.render(pose=pose.reshape(-1).tolist())["rgb_fine"]
        assert out.shape == (16, 16, 3)

    def test_bad_inputs_raise(self, server):
        with pytest.raises(ValueError):
            server.render(frame=99)
        with pytest.raises(ValueError):
            server.render(expression=[1.0, 2.0])
        with pytest.raises(ValueError):
            server.render(maps=("rgb_fine", "nope"))
        if server.latent_codes is not None:
            with pytest.raises(ValueError):
                server.render(latent_index=10**6)


class TestHandle:
    def test_ping(self, server):
        r = server.handle({"cmd": "ping"})
        assert r["ok"] and r["H"] == 16 and r["n_test_frames"] == 2

    def test_unknown_cmd(self, server):
        r = server.handle({"cmd": "reboot"})
        assert not r["ok"] and "unknown cmd" in r["error"]

    def test_render_request_saves_and_encodes(self, server, tmp_path):
        prefix = str(tmp_path / "req_")
        r = server.handle(
            {"frame": 1, "save": prefix, "encode": "png_base64",
             "maps": ["rgb_fine", "disp"]}
        )
        assert r["ok"] and r["frame_ms"] > 0
        assert sorted(r["saved"]) == [f"{prefix}disp.png", f"{prefix}rgb_fine.png"]
        # The inlined PNG decodes back to the rendered image exactly.
        from PIL import Image

        payload = r["maps"]["rgb_fine"]
        png = base64.b64decode(payload["png_base64"])
        decoded = np.asarray(Image.open(io.BytesIO(png)))
        direct = server.render(frame=1, maps=("rgb_fine",))["rgb_fine"]
        np.testing.assert_array_equal(decoded, direct)
        assert payload["shape"] == list(direct.shape)

    def test_bad_request_is_survivable(self, server):
        r = server.handle({"frame": 12345})
        assert not r["ok"] and "ValueError" in r["error"]
        # ...and the server still works afterwards.
        assert server.handle({"cmd": "ping"})["ok"]


class TestServeLoops:
    def test_jsonl_loop(self, server):
        requests = "\n".join(
            [
                json.dumps({"cmd": "ping"}),
                "not json at all",
                json.dumps({"frame": 0}),
                json.dumps({"cmd": "stop"}),
                json.dumps({"cmd": "ping"}),  # after stop: never handled
            ]
        )
        out = io.StringIO()
        n = server.serve_jsonl(io.StringIO(requests), out)
        lines = [json.loads(l) for l in out.getvalue().splitlines()]
        assert n == 4 and len(lines) == 4
        assert lines[0]["ok"] and lines[0]["cmd"] == "ping"
        assert not lines[1]["ok"] and "bad json" in lines[1]["error"]
        assert lines[2]["ok"] and lines[2]["frame_ms"] > 0
        assert lines[3] == {"ok": True, "cmd": "stop"}

    def test_tcp_client(self, server):
        """AvatarClient round-trip: the decoded PNG equals a direct
        render through the same server object."""
        from nerface_tpu.client import AvatarClient

        probe = socket.socket()
        probe.bind(("127.0.0.1", 0))
        port = probe.getsockname()[1]
        probe.close()
        t = threading.Thread(
            target=server.serve_tcp, args=("127.0.0.1", port)
        )
        t.start()
        import time

        client = None
        for _ in range(50):
            try:
                client = AvatarClient("127.0.0.1", port)
                break
            except OSError:
                time.sleep(0.1)
        if client is None:
            pytest.fail(f"server on port {port} never accepted a connection")
        with client:
            assert client.ping()["H"] == 16
            out = client.render(frame=1, seed=5, maps=("rgb_fine", "disp"))
            direct = server.render(frame=1, seed=5, maps=("rgb_fine", "disp"))
            np.testing.assert_array_equal(out["rgb_fine"], direct["rgb_fine"])
            np.testing.assert_array_equal(out["disp"], direct["disp"])
            with pytest.raises(RuntimeError):
                client.render(frame=999)
            client.stop_server()
        t.join(timeout=30)
        assert not t.is_alive()

    def test_tcp_pipelined_ordering(self, server):
        """Pipelined serve: a burst of renders + a trailing ping on ONE
        connection must come back in arrival order (the FIFO pipeline
        thread serializes replies even though pings answer instantly and
        renders ride the readback pipeline)."""
        probe = socket.socket()
        probe.bind(("127.0.0.1", 0))
        port = probe.getsockname()[1]
        probe.close()
        t = threading.Thread(
            target=server.serve_tcp, args=("127.0.0.1", port)
        )
        t.start()
        import time

        sock = None
        for _ in range(50):
            try:
                sock = socket.create_connection(("127.0.0.1", port))
                break
            except OSError:
                time.sleep(0.1)
        if sock is None:
            pytest.fail(f"server on port {port} never accepted a connection")
        burst = (
            json.dumps({"seed": 1}) + "\n"
            + json.dumps({"seed": 2}) + "\n"
            + json.dumps({"cmd": "ping"}) + "\n"
            + json.dumps({"cmd": "stop"}) + "\n"
        )
        sock.sendall(burst.encode())
        f = sock.makefile("r")
        replies = [json.loads(f.readline()) for _ in range(4)]
        sock.close()
        t.join(timeout=30)
        assert not t.is_alive()
        # renders first (in order), then the ping, then the stop
        assert replies[0]["ok"] and "frame_ms" in replies[0]
        assert replies[1]["ok"] and "frame_ms" in replies[1]
        assert replies[2]["ok"] and replies[2]["cmd"] == "ping"
        assert replies[3]["ok"] and replies[3]["cmd"] == "stop"

    def test_tcp_concurrent_clients(self, server):
        """Two clients connected at once: an idle early connection must
        not block a later one (multiplexed accept loop), and both
        interleave requests against the same server."""
        from nerface_tpu.client import AvatarClient

        probe = socket.socket()
        probe.bind(("127.0.0.1", 0))
        port = probe.getsockname()[1]
        probe.close()
        t = threading.Thread(
            target=server.serve_tcp, args=("127.0.0.1", port)
        )
        t.start()
        import time

        a = None
        for _ in range(50):
            try:
                a = AvatarClient("127.0.0.1", port)
                break
            except OSError:
                time.sleep(0.1)
        if a is None:
            pytest.fail(f"server on port {port} never accepted a connection")
        with a:
            b = AvatarClient("127.0.0.1", port)  # a stays connected, idle
            with b:
                assert b.ping()["ok"]       # served despite a's idling
                assert a.ping()["ok"]       # and a still works after b
                assert b.ping()["ok"]       # interleaved again
                b.stop_server()
        t.join(timeout=30)
        assert not t.is_alive()

    def test_tcp_loop(self, server):
        # Ephemeral port: bind first, serve in a thread, connect, talk.
        probe = socket.socket()
        probe.bind(("127.0.0.1", 0))
        port = probe.getsockname()[1]
        probe.close()

        counts = {}
        t = threading.Thread(
            target=lambda: counts.setdefault(
                "n", server.serve_tcp("127.0.0.1", port)
            )
        )
        t.start()
        conn = None
        for _ in range(50):
            try:
                conn = socket.create_connection(("127.0.0.1", port), timeout=1)
                break
            except OSError:
                import time

                time.sleep(0.1)
        if conn is None:
            pytest.fail(f"server on port {port} never accepted a connection")
        with conn, conn.makefile("rw", encoding="utf-8") as stream:
            stream.write(json.dumps({"cmd": "ping"}) + "\n")
            stream.flush()
            assert json.loads(stream.readline())["ok"]
            stream.write(json.dumps({"frame": 1}) + "\n")
            stream.flush()
            assert json.loads(stream.readline())["frame_ms"] > 0
            stream.write(json.dumps({"cmd": "stop"}) + "\n")
            stream.flush()
            assert json.loads(stream.readline())["cmd"] == "stop"
        t.join(timeout=30)
        assert not t.is_alive() and counts["n"] == 3


class TestCli:
    def test_parser(self):
        from nerface_tpu.cli.serve import build_parser

        args = build_parser().parse_args(
            ["--config", "c.yml", "--checkpoint", "k", "--listen",
             "0.0.0.0:7860", "--fast-eval", "--bf16", "--num-devices", "4"]
        )
        assert args.listen == "0.0.0.0:7860" and args.fast_eval and args.bf16
        with pytest.raises(SystemExit):
            # --stdio and --listen are mutually exclusive
            build_parser().parse_args(
                ["--config", "c", "--checkpoint", "k", "--stdio",
                 "--listen", "h:1"]
            )

    def test_main_stdio(self, server, tmp_path, monkeypatch, capsys):
        """Drive the CLI end-to-end in-process over stdio."""
        import sys

        from nerface_tpu.cli.serve import main

        cfg_path = tmp_path / "cfg.yml"
        cfg_path.write_text(server.cfg.dump())
        ckpt = server.checkpoint
        requests = json.dumps({"cmd": "ping"}) + "\n" + json.dumps(
            {"cmd": "stop"}
        ) + "\n"
        monkeypatch.setattr(sys, "stdin", io.StringIO(requests))
        main(["--config", str(cfg_path), "--checkpoint", ckpt, "--stdio"])
        out_lines = [
            json.loads(l)
            for l in capsys.readouterr().out.splitlines()
            if l.startswith("{")
        ]
        assert out_lines[0]["ok"] and out_lines[-1]["cmd"] == "stop"


class TestMeshServing:
    def test_mesh_server_matches_single_device(self, server):
        """Serving over the 8-device data mesh returns the single-device
        frame bit-exactly (per-ray index-keyed RNG; same contract as
        `test_sharded_eval.py` for batch eval)."""
        import jax
        from jax.sharding import Mesh

        mesh = Mesh(np.asarray(jax.devices()), ("data",))
        sharded = AvatarServer(
            server.cfg, checkpoint=server.checkpoint, mesh=mesh, log=False,
        )
        a = server.render(frame=1, seed=7)["rgb_fine"]
        b = sharded.render(frame=1, seed=7)["rgb_fine"]
        np.testing.assert_array_equal(a, b)


class TestFastEvalServing:
    def test_fast_eval_server(self, tmp_path_factory):
        """The production serving configuration: fast_eval on — bbox rays
        must match the parity server bit-exactly (the fast-eval quality
        contract, tests/test_fast_eval.py, extended to the serving path)."""
        from nerface_tpu.train.checkpoint import latest_checkpoint
        from nerface_tpu.train.loop import train

        tmp = tmp_path_factory.mktemp("serve_fast")
        ds = make_synthetic_flame_dataset(
            str(tmp / "ds"), H=16, W=16, n_train=3, n_val=1, n_test=2,
            num_samples=8,
        )
        cfg = _tiny_cfg(ds, str(tmp / "logs"))
        train(cfg, log=False)
        ckpt = latest_checkpoint(str(tmp / "logs" / "t"))

        parity = AvatarServer(cfg, checkpoint=ckpt, log=False)
        cfg.nerf.validation["fast_eval"] = True
        fast = AvatarServer(cfg, checkpoint=ckpt, log=False)
        assert fast.settings.fast_eval and fast.fast_bbox is not None

        a = parity.render(frame=0, seed=1)["rgb_fine"]
        b = fast.render(frame=0, seed=1)["rgb_fine"]
        h0, h1, w0, w1 = [int(x) for x in fast.fast_bbox]
        np.testing.assert_array_equal(
            a[h0:h1 + 1, w0:w1 + 1], b[h0:h1 + 1, w0:w1 + 1]
        )


class TestDeviceQuantization:
    """The on-device uint8 casts (serve.py `_u8_*`) exist so only uint8
    frames ride the host link; their contract is bit-parity with the
    host-side casts they replaced."""

    def test_rgb_matches_cast_to_image(self):
        import jax.numpy as jnp

        from nerface_tpu.eval.driver import cast_to_image
        from nerface_tpu.serve import device_cast_to_image as _u8_rgb

        rng = np.random.RandomState(0)
        # out-of-range values exercise the clamp; the ramp lands many
        # x*255 products on exact .5 so host/device must agree on
        # round-half-even
        x = np.concatenate([
            rng.uniform(-0.3, 1.3, 4096),
            np.arange(511, dtype=np.float64) / 510.0,
        ]).astype(np.float32).reshape(-1, 1, 1).repeat(3, axis=2)
        np.testing.assert_array_equal(
            np.asarray(_u8_rgb(jnp.asarray(x))), cast_to_image(x)
        )

    def test_unit_and_minmax_and_trunc(self):
        import jax.numpy as jnp

        from nerface_tpu.serve import _u8_minmax, _u8_unit
        from nerface_tpu.serve import device_uint8 as _u8_trunc

        rng = np.random.RandomState(1)
        a = rng.uniform(-0.2, 1.2, (33, 7)).astype(np.float32)
        np.testing.assert_array_equal(
            np.asarray(_u8_unit(jnp.asarray(a))),
            (np.clip(a, 0, 1) * 255.0).astype(np.uint8),
        )
        d = rng.uniform(0.1, 5.0, (33, 7)).astype(np.float32)
        lo, hi = d.min(), d.max()
        host = ((d - lo) / max(hi - lo, 1e-8) * 255.0).astype(np.uint8)
        np.testing.assert_array_equal(
            np.asarray(_u8_minmax(jnp.asarray(d))), host
        )
        n = rng.uniform(0.0, 255.0, (9, 9, 3)).astype(np.float32)
        np.testing.assert_array_equal(
            np.asarray(_u8_trunc(jnp.asarray(n))), n.astype(np.uint8)
        )
