#!/usr/bin/env python
"""Benchmark: flow pairs/sec/chip at 448x1024, 12 refinement iterations
(BASELINE.json north-star metric).

Prints ONE final JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
Provisional headline lines are ALSO printed as soon as each config banks a
number, and the current-best line is mirrored to BENCH_partial.json after
every config — so even if this process is killed mid-run, the last stdout
JSON line and the partial file both hold the best number captured so far.

The headline `value` is the BEST sustained pairs/sec/chip across a ladder of
configs (lookup backend x batch size x iteration mode) — the target is
per-chip THROUGHPUT (the reference trains at bs 6-10, train.sh:3-6), so the
largest batch that fits is a legitimate configuration, B=1 launch latency is
not the metric.

Ladder discipline (rounds 2+3 recorded 0.0; round 4 banked only the einsum
fallback because the fused opener wedged its single 240 s shot — the round-5
additions are cheap-first banking and the two-shot opener):
- CHEAP-FIRST BANKING inside every config child: the chain program takes its
  trip count as a TRACED argument, so one compile serves both a short
  (~8-fwd) and the full (~30-fwd) chain. The child prints a complete JSON
  record immediately after the short chain — i.e. seconds after compile,
  before the long measurement — then again after each full rep. The parent
  streams the child's stdout and keeps the LAST record even when the child
  wedges or is killed later, so a wedge after compile costs accuracy
  (a short-chain number, ~10% conservative), never the bank.
- The opener gets up to TWO fresh-subprocess attempts inside its 300 s
  budget (160 s, then the remainder): the relay's compile-time wedge is
  erratic and a fresh session often clears it; fused B=1 scan compiled in
  69-100 s on 3/3 banked round-4 rehearsals, so both slots fit a good draw.
- The opener is the config with the best BANKING record under driver
  conditions, not the smallest HLO: fused B=1 scan banked 3/3 round-4
  subprocess-ladder runs (32.7 / 32.7 / 33.3 pairs/sec, two VMs), while the
  einsum scan opener watchdog'd its 240 s cap 2/2 on the fresh-VM rerun.
  einsum runs SECOND as the pure-XLA safety net, where the fair-share cap
  (up to 420 s) gives it more headroom than the opener slot would.
- Every config gets exactly ONE attempt in the first pass, with a fair-share
  time cap (remaining budget / remaining configs, clamped to [150, 420] s),
  so a string of wedged configs can never starve the later ones: all five
  configs fit inside the 1500 s deadline even if every one of them wedges.
- Failed configs are retried only AFTER every config has had its attempt,
  and only with leftover budget.
- Each config runs in a fresh subprocess with its own watchdog: the TPU
  relay wedges sporadically and a wedged client session cannot recover
  in-process, so one wedge costs one attempt, never the round.
- The xplane device-trace run is OPT-IN (--trace): jax.profiler wedged the
  relay on every round-3 attempt, so by default the budget goes to banking
  config numbers instead.

vs_baseline is measured against the TF-GPU reference ESTIMATE recorded in
BASELINE.md (the reference repo publishes no numbers; RAFT-class TF models
run ~10 flow pairs/sec at this resolution on the reference's CUDA 11.3-era
GPUs). The JSON carries `"baseline": {..., "kind": "estimate"}` so the ratio
is never mistaken for a measured one.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np

TF_GPU_BASELINE_PAIRS_PER_SEC = 10.0
METRIC = "flow_pairs_per_sec_per_chip_448x1024_12iters"
PARTIAL_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_partial.json")

# (backend, batch, scan_iters). Opener = the config that BANKS most reliably
# under driver conditions. Round-5 full-ladder rehearsal: plane B=4 scan
# compiled in 26 s and banked the day's best number (35.003 pairs/sec, full
# chain) while fused_b1 / einsum_b1 / plane_b1 ALL wedged their slots —
# including fused's two opener shots — so the fastest-compiling config with
# the highest banked value opens. fused B=1 (34.4 the same day in a
# single-config run; 3/3 banked in round 4) runs second; einsum stays as
# the pure-XLA safety net.
LADDER = [
    ("plane", 4, True),    # BANKER: fastest compile (26 s), best value (35.0)
    ("fused", 1, True),    # 34.4 same-day; 3/3 banked r4
    ("einsum", 1, True),   # pure-XLA reference config (25.3 banked by r4 driver)
    ("plane", 1, True),
    ("fused", 8, True),
]
GLOBAL_DEADLINE_S = int(os.environ.get("BENCH_DEADLINE", "1500"))
PER_ATTEMPT_TIMEOUT_S = int(os.environ.get("BENCH_ATTEMPT_TIMEOUT", "420"))
OPENER_TIMEOUT_S = int(os.environ.get("BENCH_OPENER_TIMEOUT", "300"))  # total, up to 2 attempts
OPENER_ATTEMPT1_S = int(os.environ.get("BENCH_OPENER_ATTEMPT1", "160"))
MIN_ATTEMPT_S = 150
MIN_OPENER_RETRY_S = 90  # a 2nd opener shot needs at least a fast-draw compile


class BenchTimeout(Exception):
    pass


def _alarm(signum, frame):
    raise BenchTimeout()


def measure_single() -> None:
    """One config: chained fori_loop (one launch, ONE scalar host fetch —
    honest through the lazy relay), prints a JSON line."""
    import signal

    signal.signal(signal.SIGALRM, _alarm)
    signal.alarm(int(os.environ.get("BENCH_WATCHDOG", str(PER_ATTEMPT_TIMEOUT_S - 20))))

    import jax
    import jax.numpy as jnp

    from flow_supervisor_tpu.models import RAFT, RAFTConfig

    def arg(name, default):
        return sys.argv[sys.argv.index(name) + 1] if name in sys.argv else default

    h, w = 448, 1024
    iters = 12
    bf16 = "--fp32" not in sys.argv
    backend = arg("--backend", "fused")
    batch = int(arg("--batch", "1"))
    scan = "--scan" in sys.argv

    cfg = RAFTConfig(
        iters=iters,
        dtype=jnp.bfloat16 if bf16 else jnp.float32,
        corr_dtype=jnp.bfloat16 if bf16 else jnp.float32,
        lookup_backend=backend,
        scan_iters=scan,
        gma="--gma" in sys.argv,
    ).resolved()
    model = RAFT(cfg)

    rng = np.random.default_rng(0)
    img1 = jnp.asarray(rng.uniform(0, 1, (batch, h, w, 3)), jnp.float32)
    img2 = jnp.asarray(rng.uniform(0, 1, (batch, h, w, 3)), jnp.float32)
    # params as ARGUMENTS, not closure constants: the remote compile service
    # rejects large constant uploads and fetching params for constant-inlining
    # crawls through the relay
    variables = model.init(
        jax.random.PRNGKey(0), img1[:1, :64, :64], img2[:1, :64, :64], train=False
    )

    # Sustained throughput: n chained forwards inside one jitted fori_loop
    # (trip i+1's input depends on trip i's scalar output, so nothing can be
    # deduped, skipped, or reordered), one launch, ONE scalar host fetch.
    # The trip count is a TRACED argument so ONE compile serves both the
    # short cheap-first chain and the full chain (cheap-first banking: the
    # relay's wedge risk is almost entirely the compile; a number printed
    # seconds after compile survives any later wedge via the parent's
    # stdout harvesting).
    # Protocols measured and rejected on this relay: per-launch
    # block_until_ready (returns before execution — reported 6x device
    # speed), python-level chains (each link resolves with a full
    # round-trip), 4x/8x unrolled bodies (no faster, and the 8x compile
    # exceeds the relay's patience).
    n_full = max(4, int(round(30 / batch)))
    n_short = max(2, int(round(8 / batch)))

    @jax.jit
    def chained(v, image1, image2, s0, n):
        def body(i, s):
            out = model.apply(
                v, image1 + s * 1e-9, image2, train=False,
                final_flow_only=True,
            )["flow_up"][-1]
            return jnp.mean(jnp.abs(out))

        return jax.lax.fori_loop(0, n, body, s0)

    def rec_line(best, n, compile_s, provisional):
        return {
            "pairs_per_sec": round(best, 3),
            "backend": backend,
            "batch": batch,
            "scan": scan,
            **({"gma": True} if "--gma" in sys.argv else {}),
            **({"provisional": True} if provisional else {}),
            "n_fwds": n,
            "compile_s": round(compile_s, 1),
        }

    t_c = time.perf_counter()
    warm = chained(variables, img1, img2, jnp.float32(0), jnp.int32(n_short))
    assert np.isfinite(float(warm))  # compile + warm
    compile_s = time.perf_counter() - t_c

    # Cheap-first bank: two short-chain reps (~0.3 s each), print immediately.
    # Short chains under-report ~10% (the single fetch round-trip amortizes
    # over fewer forwards) — conservative, and overwritten by the full chain.
    best = None
    for rep in range(2):
        t0 = time.perf_counter()
        val = float(chained(variables, img1, img2, jnp.float32(rep + 1), jnp.int32(n_short)))
        dt = time.perf_counter() - t0
        assert np.isfinite(val)
        best = max(best or 0.0, n_short * batch / dt)
    print(json.dumps(rec_line(best, n_short, compile_s, provisional=True)), flush=True)

    # Full chain: each rep overwrites the banked line (parent keeps the last).
    for rep in range(2):
        t0 = time.perf_counter()
        val = float(chained(variables, img1, img2, jnp.float32(10 + rep), jnp.int32(n_full)))
        dt = time.perf_counter() - t0
        assert np.isfinite(val)
        best = max(best, n_full * batch / dt)
        print(json.dumps(rec_line(best, n_full, compile_s, provisional=False)), flush=True)

    rec = rec_line(best, n_full, compile_s, provisional=False)

    # xplane device-time ground truth (pure-XLA backends only: profiling a
    # pallas custom-call wedges the relay, measured 4/4 in round 2)
    if "--device-trace" in sys.argv and backend == "einsum":
        try:
            rec.update(_device_trace(model, variables, img1, img2))
        except Exception as e:  # aux only — never sink the measurement
            rec["device_trace_error"] = f"{type(e).__name__}: {e}"

    import signal as _s

    _s.alarm(0)
    print(json.dumps(rec))


def _device_trace(model, variables, img1, img2) -> dict:
    import glob
    import gzip
    import tempfile

    import jax

    @jax.jit
    def forward(v, image1, image2):
        return model.apply(v, image1, image2, train=False)["flow_up"][-1]

    jax.block_until_ready(forward(variables, img1, img2))
    td = tempfile.mkdtemp(prefix="bench_trace_")
    n = 3
    with jax.profiler.trace(td):
        for i in range(n):
            jax.block_until_ready(forward(variables, img1 + i * 1e-5, img2))
    p = glob.glob(f"{td}/plugins/profile/*/*.trace.json.gz")[0]
    d = json.load(gzip.open(p))
    ev = d.get("traceEvents", [])
    pids = {
        e["pid"]: e["args"].get("name", "")
        for e in ev
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    total = sum(
        e.get("dur", 0)
        for e in ev
        if e.get("ph") == "X"
        and "TPU" in str(pids.get(e.get("pid"), ""))
        and not e.get("name", "").startswith("jit_forward")
    )
    batch = img1.shape[0]
    return {
        "device_ms_per_fwd": round(total / n / 1000, 3),
        "device_pairs_per_sec": round(batch * n * 1e6 / total, 2),
    }


def _config_key(backend: str, batch: int, scan: bool) -> str:
    return f"{backend}_b{batch}" + ("_scan" if scan else "")


def _headline(results: dict) -> dict:
    ok = {k: r for k, r in results.items() if "pairs_per_sec" in r}
    if ok:
        best_key = max(ok, key=lambda k: ok[k]["pairs_per_sec"])
        value = ok[best_key]["pairs_per_sec"]
        line = {
            "metric": METRIC,
            "value": value,
            "unit": "pairs/sec",
            "vs_baseline": round(value / TF_GPU_BASELINE_PAIRS_PER_SEC, 3),
            "baseline": {
                "value": TF_GPU_BASELINE_PAIRS_PER_SEC,
                "kind": "estimate",
                "source": "BASELINE.md (reference publishes no numbers; no GPU/tfa here)",
            },
            "best_config": best_key,
            "configs": results,
        }
        for aux in ("device_ms_per_fwd", "device_pairs_per_sec"):
            v = next((r[aux] for r in ok.values() if aux in r), None)
            if v is not None:
                line[aux] = v
        return line
    return {
        "metric": METRIC,
        "value": 0.0,
        "unit": "pairs/sec",
        "vs_baseline": 0.0,
        "baseline": {
            "value": TF_GPU_BASELINE_PAIRS_PER_SEC,
            "kind": "estimate",
            "source": "BASELINE.md",
        },
        "error": "timeout: TPU execution relay unresponsive on every config",
        "configs": results,
    }


def _child_cmd(backend: str, batch: int, scan: bool, extra: list) -> list:
    return [
        sys.executable, os.path.abspath(__file__), "--single",
        "--backend", backend, "--batch", str(batch),
    ] + (["--scan"] if scan else []) + extra


def _run_config(backend: str, batch: int, scan: bool, timeout_s: float, extra: list) -> dict:
    """One subprocess attempt. Streams the child's stdout so every banked JSON
    line is harvested AS IT PRINTS — a child that cheap-first-banks after
    compile and then wedges still returns its provisional number (marked
    `truncated`). Returns the child's LAST JSON record or an error dict."""
    import threading

    env = dict(os.environ)
    # child's in-process watchdog fires before the parent kill so it can exit
    # cleanly ("watchdog") instead of being SIGKILLed mid-relay-call ("timeout")
    env["BENCH_WATCHDOG"] = str(max(int(timeout_s) - 20, 60))
    p = subprocess.Popen(
        _child_cmd(backend, batch, scan, extra),
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
        text=True, start_new_session=True, env=env,
    )
    lines: list = []

    def _reader():
        for raw in p.stdout:
            raw = raw.strip()
            if raw.startswith("{"):
                lines.append(raw)

    th = threading.Thread(target=_reader, daemon=True)
    th.start()
    killed = False
    try:
        p.wait(timeout=timeout_s)
    except subprocess.TimeoutExpired:
        killed = True
        p.kill()  # never leave an orphan holding the TPU relay
        p.wait()
    th.join(timeout=5)
    if lines:
        try:
            rec = json.loads(lines[-1])
        except ValueError:  # torn final line from a mid-write kill
            rec = json.loads(lines[-2]) if len(lines) > 1 else {"error": "torn output"}
        if killed and "pairs_per_sec" in rec:
            rec["truncated"] = "parent kill after bank"
        return rec
    return {"error": "timeout" if killed else "watchdog"}


def orchestrate() -> None:
    t_start = time.perf_counter()
    results: dict[str, dict] = {}
    extra = [a for a in sys.argv[1:] if a not in ("--quick", "--trace")]
    ladder = LADDER[:2] if "--quick" in sys.argv else list(LADDER)

    def bank_partial() -> None:
        """Mirror the current-best headline to disk and (once nonzero) stdout,
        so a mid-run kill still leaves the best number as the last JSON line."""
        line = _headline(results)
        try:
            with open(PARTIAL_PATH, "w") as f:
                json.dump(line, f)
        except OSError:
            pass
        if line["value"] > 0:
            print(json.dumps(line), flush=True)

    def budget() -> float:
        return GLOBAL_DEADLINE_S - (time.perf_counter() - t_start)

    # Pass 1: exactly one attempt per config, fair-share caps. Pass 2+: retry
    # failed configs with whatever budget is left.
    pending = list(ladder)
    for pass_no in range(3):
        failed = []
        for i, (backend, batch, scan) in enumerate(pending):
            key = _config_key(backend, batch, scan)
            left = budget()
            if left < MIN_ATTEMPT_S:
                for cfg in pending[i:]:
                    results.setdefault(_config_key(*cfg), {"error": "skipped: deadline"})
                break
            if pass_no == 0 and i == 0:
                cap = min(OPENER_ATTEMPT1_S, left)
            else:
                cap = min(PER_ATTEMPT_TIMEOUT_S,
                          max(MIN_ATTEMPT_S, left / (len(pending) - i)))
            rec = _run_config(backend, batch, scan, cap, extra)
            if pass_no == 0 and i == 0 and "pairs_per_sec" not in rec:
                # Two-shot opener: the compile-time wedge is erratic and a
                # fresh relay session often clears it. Second attempt gets
                # the rest of the opener budget.
                cap2 = min(OPENER_TIMEOUT_S - cap, budget())
                if cap2 >= MIN_OPENER_RETRY_S:
                    time.sleep(5)  # let the wedged session expire
                    rec = _run_config(backend, batch, scan, cap2, extra)
            if "pairs_per_sec" in rec:
                results[key] = rec
                bank_partial()
            else:
                results[key] = rec
                failed.append((backend, batch, scan))
                time.sleep(10)  # let a wedged relay session expire
        pending = failed
        if not pending or budget() < MIN_ATTEMPT_S:
            break

    # xplane device-time ground truth — OPT-IN and aux-only: jax.profiler
    # wedged the relay 2/2 on round-3 einsum runs.
    if "--trace" in sys.argv and budget() > 240 and any(
        "pairs_per_sec" in r for r in results.values()
    ):
        rec = _run_config("einsum", 1, False, min(PER_ATTEMPT_TIMEOUT_S, budget() - 30),
                          extra + ["--device-trace"])
        results["einsum_b1_trace"] = rec

    line = _headline(results)
    try:
        with open(PARTIAL_PATH, "w") as f:
            json.dump(line, f)
    except OSError:
        pass
    print(json.dumps(line))


if __name__ == "__main__":
    if "--single" in sys.argv:
        try:
            measure_single()
        except BenchTimeout:
            pass  # parent records the timeout; exit quietly
    else:
        orchestrate()
