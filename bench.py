#!/usr/bin/env python
"""Benchmark: flow pairs/sec/chip at 448x1024, 12 refinement iterations
(BASELINE.json north-star metric).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...aux}.

The headline `value` is the BEST sustained pairs/sec/chip across a ladder of
configs (lookup backend x batch size x iteration mode) — the target is
per-chip THROUGHPUT (the reference trains at bs 6-10, train.sh:3-6), so the
largest batch that fits is a legitimate configuration, B=1 launch latency is
not the metric. Each config is measured in a fresh subprocess with its own
timeout: the TPU relay wedges sporadically and a wedged client session cannot
recover in-process, so one wedge costs one config attempt, never the round
(BENCH_r02 recorded 0.0 after three wedges of a single config — this ladder
is the fix). Configs are ordered cheapest-compile-first so a nonzero number
is banked before the risky high-upside configs run.

vs_baseline is measured against the TF-GPU reference estimate recorded in
BASELINE.md (the reference repo publishes no numbers; RAFT-class TF models run
~10 flow pairs/sec at this resolution on the reference's CUDA 11.3-era GPUs —
recorded there as the working baseline until a direct measurement exists).

Aux fields: per-config results under "configs"; "device_ms_per_fwd" /
"device_pairs_per_sec" from an xplane trace of the einsum-backend forward
(ground truth immune to relay contention; pallas custom-calls wedge the
profiler, so only the pure-XLA backend is traced).
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

# (backend, batch, scan_iters): ordered cheapest/safest compile first.
# Round-3 on-chip measurements that shaped this ladder (fori-chain protocol):
# - einsum B=1 unrolled: 24.4 pairs/sec, ~53s compile — the safe opener.
# - einsum B=4: 15.8 — batching HURTS einsum (volume HBM traffic scales
#   with B); kept as cheap fallback only via --quick.
# - fused scan B in {1,4,8}: 22.4/21.5/21.1 BEFORE the final_flow_only fix
#   (scan mode was paying 11 wasted full-res convex upsamples per forward);
#   B=8 only fits because the kernel never materializes the volume.
# - pallas/fused UNROLLED: 48 pallas lowerings exceed the remote compile
#   service's patience (>8 min, killed) — not benchable, not deployable.
# - fused scan B=1 post stripe/roll/qpad optimizations: 26.8 pairs/sec,
#   41s compile.
# - plane scan (materialize-once planes + in-kernel combine): B=1 32.0 /
#   B=4 35.3 / B=8 32.5 pairs/sec — the only backend that GAINS from
#   batching (the per-query extraction loop amortizes against bigger plane
#   dots); B=4 is the measured sweet spot and opens the ladder. fused stays
#   as the memory-scaling fallback (never materializes the planes).
LADDER = [
    ("plane", 4, True),
    ("fused", 1, True),  # safe banker right after the high-upside opener
    ("plane", 1, True),
    ("einsum", 1, False),
    ("fused", 8, True),
]
GLOBAL_DEADLINE_S = int(os.environ.get("BENCH_DEADLINE", "1500"))
PER_ATTEMPT_TIMEOUT_S = int(os.environ.get("BENCH_ATTEMPT_TIMEOUT", "420"))


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
    # Protocols measured and rejected on this relay: per-launch
    # block_until_ready (returns before execution — reported 6x device
    # speed), python-level chains (each link resolves with a full
    # round-trip), 4x/8x unrolled bodies (no faster, and the 8x compile
    # exceeds the relay's patience).
    n = max(4, int(round(30 / batch)))

    @jax.jit
    def chained(v, image1, image2, s0):
        def body(i, s):
            out = model.apply(
                v, image1 + s * 1e-9, image2, train=False,
                final_flow_only=True,
            )["flow_up"][-1]
            return jnp.mean(jnp.abs(out))

        return jax.lax.fori_loop(0, n, body, s0)

    t_c = time.perf_counter()
    warm = chained(variables, img1, img2, jnp.float32(0))  # compile + warm
    assert np.isfinite(float(warm))
    compile_s = time.perf_counter() - t_c

    best = None
    for rep in range(2):
        t0 = time.perf_counter()
        val = float(chained(variables, img1, img2, jnp.float32(rep + 1)))
        dt = time.perf_counter() - t0
        assert np.isfinite(val)
        pps = n * batch / dt
        best = pps if best is None else max(best, pps)

    rec = {
        "pairs_per_sec": round(best, 3),
        "backend": backend,
        "batch": batch,
        "scan": scan,
        **({"gma": True} if "--gma" in sys.argv else {}),
        "n_fwds": n,
        "compile_s": round(compile_s, 1),
    }

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


def orchestrate() -> None:
    t_start = time.perf_counter()
    results: dict[str, dict] = {}
    extra = [a for a in sys.argv[1:] if a not in ("--quick",)]
    ladder = LADDER[:2] if "--quick" in sys.argv else LADDER

    for backend, batch, scan in ladder:
        key = f"{backend}_b{batch}" + ("_scan" if scan else "")
        # one attempt per config once a number is banked: observed wedges are
        # config-correlated, and breadth beats retrying a wedging config
        attempts = 1 if any("pairs_per_sec" in r for r in results.values()) else 2
        for attempt in range(attempts):
            elapsed = time.perf_counter() - t_start
            budget = GLOBAL_DEADLINE_S - elapsed
            if budget < 120 and results:
                break  # bank what we have
            cmd = [
                sys.executable, os.path.abspath(__file__), "--single",
                "--backend", backend, "--batch", str(batch),
            ] + (["--scan"] if scan else []) + extra
            p = subprocess.Popen(
                cmd, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
                text=True, start_new_session=True,
            )
            try:
                out, _ = p.communicate(
                    timeout=min(PER_ATTEMPT_TIMEOUT_S, max(budget, 150))
                )
                lines = [l for l in out.strip().splitlines() if l.startswith("{")]
                if lines:
                    results[key] = json.loads(lines[-1])
                    break
                # child hit its in-process watchdog and exited silently
                results.setdefault(key, {"error": "watchdog"})
            except subprocess.TimeoutExpired:
                p.kill()  # never leave an orphan holding the TPU relay
                p.wait()
                results.setdefault(key, {"error": "timeout"})
            if attempt < attempts - 1:
                time.sleep(20)  # let a wedged relay session expire
        if time.perf_counter() - t_start > GLOBAL_DEADLINE_S - 120 and any(
            "pairs_per_sec" in r for r in results.values()
        ):
            break

    # xplane device-time ground truth, LAST and aux-only: jax.profiler wedged
    # the relay 2/2 on round-3 einsum runs (it previously only wedged on
    # pallas custom-calls), so a trace run must never gate the headline.
    if (
        "--no-trace" not in sys.argv
        and "--quick" not in sys.argv
        and any("pairs_per_sec" in r for r in results.values())
        and time.perf_counter() - t_start < GLOBAL_DEADLINE_S - 240
    ):
        cmd = [
            sys.executable, os.path.abspath(__file__), "--single",
            "--backend", "einsum", "--batch", "1", "--device-trace",
        ] + extra
        p = subprocess.Popen(
            cmd, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
            text=True, start_new_session=True,
        )
        try:
            out, _ = p.communicate(timeout=PER_ATTEMPT_TIMEOUT_S)
            lines = [l for l in out.strip().splitlines() if l.startswith("{")]
            if lines:
                results["einsum_b1_trace"] = json.loads(lines[-1])
        except subprocess.TimeoutExpired:
            p.kill()
            p.wait()
            results["einsum_b1_trace"] = {"error": "timeout"}

    ok = {k: r for k, r in results.items() if "pairs_per_sec" in r}
    if ok:
        best_key = max(ok, key=lambda k: ok[k]["pairs_per_sec"])
        value = ok[best_key]["pairs_per_sec"]
        line = {
            "metric": METRIC,
            "value": value,
            "unit": "pairs/sec",
            "vs_baseline": round(value / TF_GPU_BASELINE_PAIRS_PER_SEC, 3),
            "best_config": best_key,
            "configs": results,
        }
        for aux in ("device_ms_per_fwd", "device_pairs_per_sec"):
            v = next((r[aux] for r in ok.values() if aux in r), None)
            if v is not None:
                line[aux] = v
    else:
        line = {
            "metric": METRIC,
            "value": 0.0,
            "unit": "pairs/sec",
            "vs_baseline": 0.0,
            "error": "timeout: TPU execution relay unresponsive on every config",
            "configs": results,
        }
    print(json.dumps(line))


if __name__ == "__main__":
    if "--single" in sys.argv:
        try:
            measure_single()
        except BenchTimeout:
            pass  # parent records the timeout; exit quietly
    else:
        orchestrate()
