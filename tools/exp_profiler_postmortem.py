"""Profiler-wedge post-mortem (VERDICT r4 #5).

The jax profiler has wedged the relay on every traced program since round
2 (round 3: 2/2 einsum runs; round 4: any program). This runs three
isolation strategies, EACH in its own subprocess with a hard watchdog and
a relay health check between attempts, and prints a machine-readable
verdict per strategy. A wedge costs ~15 min of relay outage (PERF.md
methodology #7), so run this when nothing else needs the chip.

Strategies:
  s1_trivial   : jax.profiler.trace() around a tiny jnp.dot — does the
                 wedge depend on the program at all?
  s2_manual    : start_trace/stop_trace with the narrowest possible window
                 opened AFTER compile+warmup, one launch inside.
  s3_hostonly  : trace with host_tracer_level only (device tracing off via
                 ProfileOptions) — isolates the device-trace component.

Usage: python tools/exp_profiler_postmortem.py            # all strategies
       python tools/exp_profiler_postmortem.py s2_manual  # one
"""
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import signal, sys, tempfile, time


def alarm(sig, frame):
    print("CHILD_WEDGED", flush=True)
    sys.exit(3)


signal.signal(signal.SIGALRM, alarm)
signal.alarm(75)

import jax
import jax.numpy as jnp
import numpy as np

strategy = sys.argv[1]
x = jnp.asarray(np.random.RandomState(0).normal(0, 1, (512, 512)), jnp.float32)
f = jax.jit(lambda a: (a @ a).sum())
assert np.isfinite(float(f(x)))  # compile + warm OUTSIDE any trace
td = tempfile.mkdtemp(prefix="pm_trace_")

if strategy == "s1_trivial":
    with jax.profiler.trace(td):
        v = float(f(x + 1.0))
elif strategy == "s2_manual":
    jax.profiler.start_trace(td)
    v = float(f(x + 2.0))
    jax.profiler.stop_trace()
elif strategy == "s3_hostonly":
    try:
        opts = jax.profiler.ProfileOptions()
        opts.device_tracer_level = 0
        jax.profiler.start_trace(td, profiler_options=opts)
    except Exception as e:  # older API: no options support
        print("CHILD_SKIP no ProfileOptions:", type(e).__name__, flush=True)
        sys.exit(4)
    v = float(f(x + 3.0))
    jax.profiler.stop_trace()
else:
    raise SystemExit(f"unknown strategy {strategy}")

assert np.isfinite(v)
# prove the device still answers AFTER the trace closed
assert np.isfinite(float(f(x + 4.0)))
import glob

n_files = len(glob.glob(f"{td}/**/*", recursive=True))
print(f"CHILD_OK value={v} trace_files={n_files}", flush=True)
"""


def health_check(timeout=75):
    p = subprocess.run(
        [sys.executable, "-c",
         "import jax, jax.numpy as jnp;"
         "print('alive', float(jnp.sum(jnp.arange(512, dtype=jnp.float32))))"],
        capture_output=True, text=True, timeout=timeout + 5,
        env={**os.environ, "PYTHONPATH": f"{REPO}:/root/.axon_site"},
    )
    return "alive" in p.stdout


def run_strategy(name: str, budget_s: int = 90) -> dict:
    t0 = time.time()
    try:
        p = subprocess.run(
            [sys.executable, "-c", CHILD, name],
            capture_output=True, text=True, timeout=budget_s,
            env={**os.environ, "PYTHONPATH": f"{REPO}:/root/.axon_site"},
        )
        out = p.stdout.strip().splitlines()
        tail = out[-1] if out else ""
        status = ("ok" if "CHILD_OK" in tail else
                  "skip" if "CHILD_SKIP" in tail else
                  "wedged" if "CHILD_WEDGED" in tail else f"rc={p.returncode}")
    except subprocess.TimeoutExpired:
        status, tail = "timeout", ""
    return {"strategy": name, "status": status, "detail": tail,
            "wall_s": round(time.time() - t0, 1)}


def main():
    names = sys.argv[1:] or ["s1_trivial", "s2_manual", "s3_hostonly"]
    results = []
    for name in names:
        print(f"=== {name} ===", flush=True)
        r = run_strategy(name)
        results.append(r)
        print(json.dumps(r), flush=True)
        if r["status"] in ("wedged", "timeout"):
            print("waiting out the wedge before the next attempt...", flush=True)
            deadline = time.time() + 20 * 60
            while time.time() < deadline:
                time.sleep(120)
                try:
                    if health_check():
                        print("relay recovered", flush=True)
                        break
                except Exception:
                    pass
            else:
                print("relay did NOT recover inside 20 min; stopping",
                      flush=True)
                break
    print("=== SUMMARY ===")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
