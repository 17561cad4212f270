"""Bench orchestrator robustness: a wedged config (the TPU relay hanging a
subprocess, BENCH_r02's failure mode) must cost one config attempt, never the
round — the ladder banks any other config's number as the headline."""
import json
import subprocess
import sys

import pytest

import bench


class _FakeProc:
    def __init__(self, out: str | None):
        self._out = out
        self.killed = False

    def communicate(self, timeout=None):
        if self._out is None:
            raise subprocess.TimeoutExpired(cmd="bench", timeout=timeout)
        return self._out, ""

    def kill(self):
        self.killed = True

    def wait(self):
        pass


def _fake_popen_factory(script):
    """script: {config_key_fragment: json line or None (= wedge)}."""
    spawned = []

    def popen(cmd, **kw):
        batch = cmd[cmd.index("--batch") + 1]
        backend = cmd[cmd.index("--backend") + 1]
        key = f"{backend}_b{batch}"
        p = _FakeProc(script[key])
        spawned.append((key, p))
        return p

    return popen, spawned


def test_orchestrate_banks_nonzero_despite_wedge(monkeypatch, capsys):
    ok_line = json.dumps(
        {"pairs_per_sec": 33.5, "backend": "einsum", "batch": 4, "scan": False}
    )
    popen, spawned = _fake_popen_factory(
        {"einsum_b1": None, "einsum_b4": ok_line}  # b1 wedges every attempt
    )
    monkeypatch.setattr(bench.subprocess, "Popen", popen)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    monkeypatch.setattr(bench, "LADDER", [("einsum", 1, False), ("einsum", 4, False)])
    monkeypatch.setattr(sys, "argv", ["bench.py"])

    bench.orchestrate()
    line = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert line["value"] == 33.5
    assert line["vs_baseline"] == pytest.approx(3.35)
    assert line["best_config"] == "einsum_b4"
    assert line["configs"]["einsum_b1"] == {"error": "timeout"}
    # the wedged subprocess was killed, not orphaned on the relay
    assert all(p.killed for k, p in spawned if k == "einsum_b1")


def test_orchestrate_all_wedged_reports_zero_with_error(monkeypatch, capsys):
    popen, _ = _fake_popen_factory({"einsum_b1": None, "einsum_b4": None})
    monkeypatch.setattr(bench.subprocess, "Popen", popen)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    monkeypatch.setattr(bench, "LADDER", [("einsum", 1, False), ("einsum", 4, False)])
    monkeypatch.setattr(sys, "argv", ["bench.py"])

    bench.orchestrate()
    line = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert line["value"] == 0.0
    assert "error" in line


def test_orchestrate_picks_best_config(monkeypatch, capsys):
    mk = lambda v: json.dumps({"pairs_per_sec": v})
    popen, _ = _fake_popen_factory({"einsum_b1": mk(20.0), "fused_b4": mk(55.0)})
    monkeypatch.setattr(bench.subprocess, "Popen", popen)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    monkeypatch.setattr(
        bench, "LADDER", [("einsum", 1, False), ("fused", 4, True)]
    )
    monkeypatch.setattr(sys, "argv", ["bench.py"])

    bench.orchestrate()
    line = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert line["value"] == 55.0
    assert line["best_config"] == "fused_b4_scan"
