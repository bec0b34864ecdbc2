"""Supervised-training wrapper (`cli/supervise.py`): checkpoint-arg
ownership, crash recovery, RSS-limit recycling, and a real end-to-end
tiny train run under supervision."""

import os
import sys
import textwrap

import pytest

from nerface_tpu.cli.supervise import (
    build_parser,
    child_argv,
    rss_gb,
    strip_load_checkpoint,
    supervise,
)


class TestArgSurgery:
    def test_strip_space_form(self):
        rest, ckpt = strip_load_checkpoint(
            ["--config", "c.yml", "--load-checkpoint", "/x", "--bf16"]
        )
        assert rest == ["--config", "c.yml", "--bf16"] and ckpt == "/x"

    def test_strip_eq_form(self):
        rest, ckpt = strip_load_checkpoint(["--load-checkpoint=/y", "--bf16"])
        assert rest == ["--bf16"] and ckpt == "/y"

    def test_strip_absent(self):
        rest, ckpt = strip_load_checkpoint(["--config", "c.yml"])
        assert rest == ["--config", "c.yml"] and ckpt == ""

    def test_strip_dangling_value_fails_fast(self):
        """A bare trailing --load-checkpoint must error here, not
        collide with the supervisor-appended flag on every relaunch."""
        with pytest.raises(SystemExit):
            strip_load_checkpoint(["--config", "c.yml", "--load-checkpoint"])

    def test_child_argv_prefers_logdir_latest(self, tmp_path):
        d = tmp_path / "checkpoint100001"
        d.mkdir()
        (d / "_CHECKPOINT_METADATA").write_text("{}")
        argv = child_argv("m", ["--config", "c.yml"], str(tmp_path), "/user.ckpt")
        assert argv[-2:] == ["--load-checkpoint", str(d)]

    def test_child_argv_falls_back_to_user_ckpt(self, tmp_path):
        argv = child_argv("m", ["--config", "c.yml"], str(tmp_path), "/user.ckpt")
        assert argv[-2:] == ["--load-checkpoint", "/user.ckpt"]

    def test_child_argv_no_ckpt(self, tmp_path):
        argv = child_argv("m", ["--config", "c.yml"], str(tmp_path), "")
        assert "--load-checkpoint" not in argv

    def test_rss_of_self(self):
        v = rss_gb(os.getpid())
        assert v is not None and 0 < v < 200

    def test_rss_of_dead_pid(self):
        assert rss_gb(2**22 - 1) is None


@pytest.fixture(scope="module")
def synth_dir(tmp_path_factory):
    from nerface_tpu.data.synthetic import make_synthetic_flame_dataset

    d = tmp_path_factory.mktemp("synth_sup")
    return make_synthetic_flame_dataset(
        str(d), n_train=4, n_val=2, n_test=2, H=24, W=24
    )


def _write_cfg(tmp_path, extra=""):
    cfg = tmp_path / "cfg.yml"
    cfg.write_text(
        textwrap.dedent(
            f"""
            experiment:
              id: sup
              logdir: {tmp_path}/logs
              randomseed: 42
              train_iters: 8
              print_every: 4
              validate_every: 0
              save_every: 4
            """
        )
        + extra
    )
    return str(cfg)


def _fake_child(tmp_path, body):
    """Install a runnable fake-train module on the child's PYTHONPATH.

    The body sees argv, a `logdir` var, and a `runs` counter file."""
    mod = tmp_path / "fake_child.py"
    mod.write_text(
        textwrap.dedent(
            f"""
            import os, sys, time
            logdir = {str(tmp_path / 'logs' / 'sup')!r}
            os.makedirs(logdir, exist_ok=True)
            runs_f = os.path.join(logdir, "runs.txt")
            with open(runs_f, "a") as f:
                f.write(" ".join(sys.argv[1:]) + chr(10))
            runs = sum(1 for _ in open(runs_f))
            """
        )
        + textwrap.dedent(body)
    )
    os.environ["PYTHONPATH"] = (
        str(tmp_path) + os.pathsep + os.environ.get("PYTHONPATH", "")
    )
    return "fake_child"


def _args(extra):
    return build_parser().parse_args(extra)


class TestSupervise:
    def test_crash_recovery_resumes_from_latest(self, tmp_path):
        cfg = _write_cfg(tmp_path)
        mod = _fake_child(
            tmp_path,
            """
            if runs == 1:
                # simulate: trained a while, checkpointed, then crashed
                d = os.path.join(logdir, "checkpoint00004")
                os.makedirs(d, exist_ok=True)
                open(os.path.join(d, "_CHECKPOINT_METADATA"), "w").write("{}")
                sys.exit(1)
            assert "--load-checkpoint" in sys.argv, sys.argv
            i = sys.argv.index("--load-checkpoint")
            assert sys.argv[i + 1].endswith("checkpoint00004"), sys.argv
            sys.exit(0)
            """,
        )
        rc = supervise(
            _args(
                ["--poll-seconds", "0.2", "--max-restarts", "3",
                 "--child-module", mod, "--", "--config", cfg]
            )
        )
        assert rc == 0
        runs = (tmp_path / "logs" / "sup" / "runs.txt").read_text().splitlines()
        assert len(runs) == 2

    def test_rss_limit_recycles_child(self, tmp_path):
        cfg = _write_cfg(tmp_path)
        mod = _fake_child(
            tmp_path,
            """
            if runs == 1:
                ballast = bytearray(400 * 1024 * 1024)  # ~0.4 GiB resident
                time.sleep(120)  # supervisor must recycle us well before this
            sys.exit(0)
            """,
        )
        rc = supervise(
            _args(
                ["--rss-limit-gb", "0.2", "--poll-seconds", "0.5",
                 "--grace-seconds", "5", "--max-restarts", "3",
                 "--child-module", mod, "--", "--config", cfg]
            )
        )
        assert rc == 0
        runs = (tmp_path / "logs" / "sup" / "runs.txt").read_text().splitlines()
        assert len(runs) == 2

    def test_stall_timeout_recycles_hung_child(self, tmp_path):
        """A child that stops writing to the logdir without exiting (the
        observed tunnel-outage hang: futex-parked, flat RSS, no exit)
        must be recycled by --stall-timeout-seconds."""
        cfg = _write_cfg(tmp_path)
        mod = _fake_child(
            tmp_path,
            """
            if runs == 1:
                time.sleep(120)  # hang: no writes, no exit, no RSS growth
            sys.exit(0)
            """,
        )
        # timeout must clear the interpreter's own startup (~3 s here:
        # sitecustomize imports jax), or every launch dies mid-startup
        rc = supervise(
            _args(
                ["--stall-timeout-seconds", "10", "--poll-seconds", "0.5",
                 "--grace-seconds", "5", "--max-restarts", "3",
                 "--child-module", mod, "--", "--config", cfg]
            )
        )
        assert rc == 0
        runs = (tmp_path / "logs" / "sup" / "runs.txt").read_text().splitlines()
        assert len(runs) == 2

    def test_outage_recycles_do_not_burn_restart_budget(self, tmp_path):
        """A stall where the child never wrote to the logdir (backend
        init hanging on a dead tunnel) is an infrastructure outage:
        recycle without counting against --max-restarts, so a long
        outage can't exhaust the budget. Observed live in the round-3
        tunnel outage."""
        import textwrap as tw

        state = tmp_path / "state"  # OUTSIDE the supervised logdir
        mod_f = tmp_path / "fake_outage.py"
        mod_f.write_text(tw.dedent(f"""
            import os, sys, time
            state = {str(state)!r}
            os.makedirs(state, exist_ok=True)
            runs_f = os.path.join(state, "runs.txt")
            with open(runs_f, "a") as f:
                f.write("x" + chr(10))
            if sum(1 for _ in open(runs_f)) <= 2:
                time.sleep(120)  # outage hang: silent, no logdir writes
            sys.exit(0)
        """))
        os.environ["PYTHONPATH"] = (
            str(tmp_path) + os.pathsep + os.environ.get("PYTHONPATH", "")
        )
        cfg = _write_cfg(tmp_path)
        rc = supervise(
            _args(
                ["--stall-timeout-seconds", "10", "--poll-seconds", "0.5",
                 "--grace-seconds", "5", "--max-restarts", "1",
                 "--outage-probe-seconds", "0.2",
                 "--outage-probe-command", "true",
                 "--child-module", "fake_outage", "--", "--config", cfg]
            )
        )
        assert rc == 0
        runs = (state / "runs.txt").read_text().splitlines()
        assert len(runs) == 3  # 2 free outage recycles + the success

    def test_backend_probe(self, tmp_path):
        from nerface_tpu.cli.supervise import backend_ready

        assert backend_ready(_args(
            ["--outage-probe-command", "true", "--"])) is True
        assert backend_ready(_args(
            ["--outage-probe-command", "false", "--"])) is False
        # a dead tunnel HANGS the probe — the timeout must kill it
        assert backend_ready(_args(
            ["--outage-probe-command", "sleep 30",
             "--outage-probe-timeout-seconds", "0.5", "--"])) is False

    def test_crash_loop_during_outage_gates_on_probe(self, tmp_path):
        """A child that crash-loops in backend init during an outage
        (observed in the round-3 tunnel outage: RuntimeError from
        xla_bridge, exit 1, no logdir writes) must not burn the restart
        budget; the supervisor waits for the backend probe instead of
        relaunching into the dead tunnel."""
        import textwrap as tw

        state = tmp_path / "state"  # OUTSIDE the supervised logdir
        mod_f = tmp_path / "fake_initcrash.py"
        mod_f.write_text(tw.dedent(f"""
            import os, sys
            state = {str(state)!r}
            os.makedirs(state, exist_ok=True)
            runs_f = os.path.join(state, "runs.txt")
            with open(runs_f, "a") as f:
                f.write("x" + chr(10))
            if sum(1 for _ in open(runs_f)) <= 2:
                sys.exit(1)  # backend-init crash: instant, no writes
            sys.exit(0)
        """))
        os.environ["PYTHONPATH"] = (
            str(tmp_path) + os.pathsep + os.environ.get("PYTHONPATH", "")
        )
        cfg = _write_cfg(tmp_path)
        # probe succeeds from its 3rd invocation: the "tunnel" comes back
        # while run 2's crash is being adjudicated
        probe_n = tmp_path / "probe_n"
        probe = (
            f"n=$(cat {probe_n} 2>/dev/null || echo 0); n=$((n+1)); "
            f"echo $n > {probe_n}; [ $n -ge 3 ]"
        )
        rc = supervise(
            _args(
                ["--poll-seconds", "0.1", "--max-restarts", "1",
                 "--outage-probe-seconds", "0.2",
                 "--outage-probe-command", probe,
                 "--child-module", "fake_initcrash", "--", "--config", cfg]
            )
        )
        # run 1 crashes during the outage (free), run 2 crashes with the
        # backend up (burns the single restart), run 3 completes —
        # rc == 0 proves the outage crash did not count
        assert rc == 0
        runs = (state / "runs.txt").read_text().splitlines()
        assert len(runs) == 3

    def test_newest_mtime(self, tmp_path):
        from nerface_tpu.cli.supervise import newest_mtime

        assert newest_mtime(str(tmp_path / "missing")) == 0.0
        sub = tmp_path / "a" / "b"
        sub.mkdir(parents=True)
        (sub / "f.txt").write_text("x")
        assert newest_mtime(str(tmp_path)) > 0.0

    def test_max_restarts_gives_up(self, tmp_path):
        cfg = _write_cfg(tmp_path)
        mod = _fake_child(tmp_path, "sys.exit(3)\n")
        rc = supervise(
            _args(
                ["--poll-seconds", "0.1", "--max-restarts", "2",
                 "--child-module", mod, "--", "--config", cfg]
            )
        )
        assert rc == 1
        runs = (tmp_path / "logs" / "sup" / "runs.txt").read_text().splitlines()
        assert len(runs) == 3  # initial + 2 restarts

    def test_e2e_real_train_completes(self, tmp_path, synth_dir):
        # real train CLI as the child (on the CPU platform), tiny schedule
        from test_loop_eval import _tiny_cfg

        cfg = _tiny_cfg(synth_dir, str(tmp_path / "logs"), train_iters=6)
        cfg_file = tmp_path / "cfg.yml"
        cfg_file.write_text(cfg.dump())
        rc = supervise(
            _args(
                ["--poll-seconds", "1", "--max-restarts", "1", "--",
                 "--config", str(cfg_file), "--platform", "cpu"]
            )
        )
        assert rc == 0
        from nerface_tpu.train.checkpoint import latest_checkpoint

        logdir = os.path.join(str(tmp_path / "logs"), "tiny")
        assert latest_checkpoint(logdir) is not None

    @pytest.mark.parametrize("signame", ["SIGINT", "SIGTERM"])
    def test_interrupt_stops_child(self, tmp_path, signame):
        """A killed supervisor must not orphan the child (the TPU stays
        owned otherwise) — both ctrl-C and a service manager's plain
        SIGTERM (which needs an installed handler to unwind cleanly)."""
        import signal
        import subprocess as sp
        import sys
        import time

        cfg = _write_cfg(tmp_path)
        mod = _fake_child(
            tmp_path,
            """
            open(os.path.join(logdir, "child.pid"), "w").write(str(os.getpid()))
            time.sleep(120)
            """,
        )
        sup = sp.Popen(
            [sys.executable, "-m", "nerface_tpu.cli.supervise",
             "--poll-seconds", "0.2", "--grace-seconds", "5",
             "--child-module", mod, "--", "--config", cfg],
            env=os.environ.copy(),
        )
        pid_f = tmp_path / "logs" / "sup" / "child.pid"
        for _ in range(100):
            if pid_f.exists():
                break
            time.sleep(0.2)
        child_pid = int(pid_f.read_text())
        sup.send_signal(getattr(signal, signame))
        sup.wait(timeout=30)
        for _ in range(50):
            try:
                os.kill(child_pid, 0)
            except ProcessLookupError:
                return  # child is gone — pass
            time.sleep(0.2)
        os.kill(child_pid, signal.SIGKILL)
        raise AssertionError("child survived supervisor interrupt")
