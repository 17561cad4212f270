"""Bench orchestrator robustness.

BENCH_r02 and BENCH_r03 both recorded 0.0: wedged configs (the TPU relay
hanging a subprocess) consumed the whole deadline before the safe config ran.
BENCH_r04 banked only the einsum fallback: the fused opener wedged its single
240 s shot. These tests drive `orchestrate()` with a fake clock and a fake
config runner (plus `_run_config` with real subprocesses) and assert the
round-5 ladder discipline:

- every config gets its one attempt INSIDE the global deadline even when
  every attempt wedges at its full time cap;
- the opener (fused b1 scan, the proven banker) gets up to TWO fresh
  subprocess attempts inside its 300 s budget;
- `_run_config` streams the child's stdout, so a child that cheap-first
  banks after compile and then wedges still returns its provisional number;
- a banked number is mirrored to the partial file and stdout immediately;
- failed configs are retried only with leftover budget;
- the baseline is labeled as an estimate in the JSON itself.
"""
import json
import sys

import pytest

import bench


class _Clock:
    def __init__(self):
        self.t = 0.0

    def perf_counter(self):
        return self.t

    def sleep(self, s):
        self.t += s


@pytest.fixture()
def clock(monkeypatch, tmp_path):
    c = _Clock()
    monkeypatch.setattr(bench.time, "perf_counter", c.perf_counter)
    monkeypatch.setattr(bench.time, "sleep", c.sleep)
    monkeypatch.setattr(bench, "PARTIAL_PATH", str(tmp_path / "BENCH_partial.json"))
    monkeypatch.setattr(bench.sys, "argv", ["bench.py"])
    return c


def _fake_runner(clock, script, attempts):
    """script maps config key -> (seconds, record_or_None); None = wedge for
    the full time cap."""

    def run(backend, batch, scan, timeout_s, extra):
        key = bench._config_key(backend, batch, scan)
        attempts.append((key, timeout_s))
        secs, rec = script[key]
        if rec is None:  # failed attempt: wedge (secs=None -> full cap) or fast crash
            clock.t += timeout_s if secs is None else secs
            return {"error": "timeout"}
        clock.t += secs
        return rec

    return run


def _last_line(capsys):
    return json.loads(capsys.readouterr().out.strip().splitlines()[-1])


def test_all_wedged_every_config_attempted_inside_deadline(clock, monkeypatch, capsys):
    """The r2/r3 failure mode: every config wedges. All five ladder configs
    must still get their attempt inside GLOBAL_DEADLINE_S (the opener's two
    wedged shots included)."""
    script = {bench._config_key(*cfg): (None, None) for cfg in bench.LADDER}
    attempts = []
    monkeypatch.setattr(bench, "_run_config", _fake_runner(clock, script, attempts))

    bench.orchestrate()

    ladder_keys = [bench._config_key(*cfg) for cfg in bench.LADDER]
    # opener wedged its first shot -> a second fresh-subprocess attempt
    first_pass = [k for k, _ in attempts[: len(bench.LADDER) + 1]]
    assert first_pass == [ladder_keys[0]] + ladder_keys
    assert clock.t <= bench.GLOBAL_DEADLINE_S + bench.PER_ATTEMPT_TIMEOUT_S
    # the two opener shots fit inside the opener budget
    assert attempts[0][1] + attempts[1][1] <= bench.OPENER_TIMEOUT_S
    assert all(t <= bench.PER_ATTEMPT_TIMEOUT_S for _, t in attempts)
    line = _last_line(capsys)
    assert line["value"] == 0.0
    assert line["baseline"]["kind"] == "estimate"
    assert all("error" in line["configs"][k] for k in ladder_keys)


def test_opener_is_the_proven_banker_and_capped(clock, monkeypatch, capsys):
    # Opener = the config with the best banking record under driver
    # conditions: plane B=4 scan (round-5 rehearsal: 26 s compile, banked
    # the day's best 35.0 while fused/einsum/plane-b1 all wedged).
    assert bench.LADDER[0] == ("plane", 4, True)
    assert ("einsum", 1, True) in bench.LADDER
    # non-opener configs crash fast (100 s each), leaving retry budget
    script = {bench._config_key(*cfg): (100, None) for cfg in bench.LADDER}
    script["plane_b4_scan"] = (
        150, {"pairs_per_sec": 35.0, "backend": "plane", "batch": 4}
    )
    attempts = []
    monkeypatch.setattr(bench, "_run_config", _fake_runner(clock, script, attempts))

    bench.orchestrate()

    assert attempts[0][0] == "plane_b4_scan"
    assert attempts[0][1] == bench.OPENER_ATTEMPT1_S
    # opener banked on its first shot -> no second opener attempt
    assert attempts[1][0] == "fused_b1_scan"
    line = _last_line(capsys)
    assert line["value"] == 35.0
    assert line["best_config"] == "plane_b4_scan"
    # wedged configs were retried with leftover budget, then gave up in time
    retried = [k for k, _ in attempts].count("fused_b1_scan")
    assert retried >= 2
    assert clock.t <= bench.GLOBAL_DEADLINE_S + bench.PER_ATTEMPT_TIMEOUT_S


def test_opener_gets_a_second_fresh_subprocess_shot(clock, monkeypatch, capsys):
    """The r4 failure mode: the proven banker wedges its single opener shot
    and the headline falls back to einsum. The wedge is erratic — a fresh
    subprocess within the opener budget must get a second draw."""
    behaviors = {
        k: [(None, None)] * 10 for k in (bench._config_key(*c) for c in bench.LADDER)
    }
    behaviors["plane_b4_scan"] = [
        (None, None),  # shot 1: wedge at full cap
        (95, {"pairs_per_sec": 34.5, "backend": "plane", "batch": 4}),  # shot 2 banks
    ]
    attempts = []

    def run(backend, batch, scan, timeout_s, extra):
        key = bench._config_key(backend, batch, scan)
        attempts.append((key, timeout_s))
        secs, rec = behaviors[key].pop(0)
        clock.t += timeout_s if secs is None else secs
        return {"error": "timeout"} if rec is None else rec

    monkeypatch.setattr(bench, "_run_config", run)
    bench.orchestrate()

    assert [k for k, _ in attempts[:2]] == ["plane_b4_scan", "plane_b4_scan"]
    assert attempts[0][1] == bench.OPENER_ATTEMPT1_S
    assert attempts[1][1] <= bench.OPENER_TIMEOUT_S - bench.OPENER_ATTEMPT1_S
    line = _last_line(capsys)
    assert line["value"] == 34.5
    assert line["best_config"] == "plane_b4_scan"
    assert clock.t <= bench.GLOBAL_DEADLINE_S + bench.PER_ATTEMPT_TIMEOUT_S


def _stub_child(monkeypatch, code):
    monkeypatch.setattr(
        bench, "_child_cmd", lambda backend, batch, scan, extra: [sys.executable, "-c", code]
    )


def test_run_config_harvests_bank_from_wedged_child(monkeypatch):
    """Cheap-first banking end-to-end: the child prints a provisional record
    right after compile, then wedges. The parent must harvest it instead of
    recording a timeout."""
    _stub_child(
        monkeypatch,
        "import json,time,sys;"
        "print(json.dumps({'pairs_per_sec': 31.2, 'provisional': True}), flush=True);"
        "time.sleep(60)",
    )
    rec = bench._run_config("fused", 1, True, 3.0, [])
    assert rec["pairs_per_sec"] == 31.2
    assert rec["provisional"] is True
    assert rec["truncated"] == "parent kill after bank"


def test_run_config_last_full_record_wins(monkeypatch):
    """A healthy child overwrites its provisional record with full-chain
    records; the parent keeps the last one, unmarked."""
    _stub_child(
        monkeypatch,
        "import json;"
        "print(json.dumps({'pairs_per_sec': 29.0, 'provisional': True}), flush=True);"
        "print(json.dumps({'pairs_per_sec': 33.1}), flush=True)",
    )
    rec = bench._run_config("fused", 1, True, 30.0, [])
    assert rec["pairs_per_sec"] == 33.1
    assert "provisional" not in rec
    assert "truncated" not in rec


def test_run_config_silent_wedge_still_errors(monkeypatch):
    _stub_child(monkeypatch, "import time; time.sleep(60)")
    rec = bench._run_config("fused", 1, True, 2.0, [])
    assert rec == {"error": "timeout"}


def test_banked_number_written_to_partial_and_stdout_immediately(
    clock, monkeypatch, capsys, tmp_path
):
    """If the driver kills the orchestrator mid-run, the last stdout JSON line
    and the partial file must already hold the banked number."""
    ok = {"pairs_per_sec": 19.7, "backend": "plane", "batch": 4}

    def run(backend, batch, scan, timeout_s, extra):
        if backend == "plane" and batch == 4:
            clock.t += 60
            return ok
        raise KeyboardInterrupt  # simulate the driver killing us mid-ladder

    monkeypatch.setattr(bench, "_run_config", run)
    with pytest.raises(KeyboardInterrupt):
        bench.orchestrate()

    line = _last_line(capsys)
    assert line["value"] == 19.7
    partial = json.loads((tmp_path / "BENCH_partial.json").read_text())
    assert partial["value"] == 19.7
    assert partial["baseline"]["kind"] == "estimate"


def test_picks_best_config_and_labels_baseline(clock, monkeypatch, capsys):
    script = {bench._config_key(*cfg): (None, None) for cfg in bench.LADDER}
    script["einsum_b1_scan"] = (50, {"pairs_per_sec": 20.0})
    script["plane_b4_scan"] = (100, {"pairs_per_sec": 55.0})
    script["plane_b1_scan"] = (90, {"pairs_per_sec": 40.0})
    script["fused_b1_scan"] = (80, {"pairs_per_sec": 30.0})
    script["fused_b8_scan"] = (120, {"pairs_per_sec": 25.0})
    attempts = []
    monkeypatch.setattr(bench, "_run_config", _fake_runner(clock, script, attempts))

    bench.orchestrate()

    line = _last_line(capsys)
    assert line["value"] == 55.0
    assert line["best_config"] == "plane_b4_scan"
    assert line["vs_baseline"] == pytest.approx(5.5)
    assert line["baseline"] == {
        "value": 10.0,
        "kind": "estimate",
        "source": "BASELINE.md (reference publishes no numbers; no GPU/tfa here)",
    }
    assert len(attempts) == 5  # nothing retried, nothing skipped


def test_trace_is_opt_in(clock, monkeypatch, capsys):
    """jax.profiler wedged the relay 2/2 in round 3 — the trace run must not
    happen unless --trace is passed."""
    script = {bench._config_key(*cfg): (30, {"pairs_per_sec": 20.0}) for cfg in bench.LADDER}
    attempts = []
    monkeypatch.setattr(bench, "_run_config", _fake_runner(clock, script, attempts))

    bench.orchestrate()
    assert not any("--device-trace" in str(a) for a in attempts)
    line = _last_line(capsys)
    assert "einsum_b1_trace" not in line["configs"]
