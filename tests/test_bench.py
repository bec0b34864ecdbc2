"""Driver-facing bench contract: stdout is EXACTLY ONE JSON line with
{metric, value, unit, vs_baseline} — including when the TPU tunnel is
unreachable (observed round-3 outage: backend init hangs forever, so
bench probes in a subprocess and must emit an honest zero, not hang)."""

import contextlib
import io
import json


class TestOutagePath:
    def test_emits_one_json_line_with_contract_keys(self, monkeypatch):
        import bench

        monkeypatch.setattr(bench, "_wait_for_device", lambda **kw: False)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            bench.main()
        lines = [l for l in buf.getvalue().splitlines() if l.strip()]
        assert len(lines) == 1
        obj = json.loads(lines[0])
        assert set(obj) >= {"metric", "value", "unit", "vs_baseline"}
        assert obj["value"] == 0.0 and obj["vs_baseline"] == 0.0
        assert "error" in obj

    def test_wait_skips_sleep_after_final_attempt(self, monkeypatch):
        import bench

        monkeypatch.setattr(bench, "_device_ready", lambda timeout: False)
        slept = []
        monkeypatch.setattr(bench.time, "sleep", lambda s: slept.append(s))
        assert bench._wait_for_device(attempts=3, probe_timeout=0.1) is False
        assert len(slept) == 2  # between attempts only, not after the last

    def test_wait_returns_on_first_success(self, monkeypatch):
        import bench

        monkeypatch.setattr(bench, "_device_ready", lambda timeout: True)
        slept = []
        monkeypatch.setattr(bench.time, "sleep", lambda s: slept.append(s))
        assert bench._wait_for_device(attempts=3) is True
        assert slept == []
