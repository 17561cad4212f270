"""Device-trace the real 448x1024x12 forward with the WORKING profiler
protocol found by exp_profiler_postmortem (round 5): manual
start_trace/stop_trace opened strictly AFTER compile+warm, narrow window.
(The `with jax.profiler.trace()` context wedged even on a trivial dot.)

Prints a per-op device-time aggregate (top N) and the total device ms/fwd.

Usage: python tools/exp_trace_fwd.py [--backend fused|einsum|plane]
       [--scan] [--n 3]
Each run risks the known 15-min relay wedge if the pallas custom-call
tracing regression reappears — run ALONE, one attempt, stop on failure.
"""
import glob
import gzip
import json
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import signal

    def _alarm(signum, frame):
        print("WEDGED", flush=True)
        sys.exit(3)

    signal.signal(signal.SIGALRM, _alarm)
    signal.alarm(int(sys.argv[sys.argv.index("--watchdog") + 1])
                 if "--watchdog" in sys.argv else 420)

    import jax
    import jax.numpy as jnp

    from flow_supervisor_tpu.models import RAFT, RAFTConfig

    def arg(name, default):
        return sys.argv[sys.argv.index(name) + 1] if name in sys.argv else default

    backend = arg("--backend", "einsum")
    n = int(arg("--n", "3"))
    h, w = 448, 1024
    cfg = RAFTConfig(
        iters=12, dtype=jnp.bfloat16, corr_dtype=jnp.bfloat16,
        lookup_backend=backend, scan_iters="--scan" in sys.argv,
    ).resolved()
    model = RAFT(cfg)
    rng = np.random.default_rng(0)
    img1 = jnp.asarray(rng.uniform(0, 1, (1, h, w, 3)), jnp.float32)
    img2 = jnp.asarray(rng.uniform(0, 1, (1, h, w, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img1[:, :64, :64],
                           img2[:, :64, :64], train=False)

    @jax.jit
    def fwd(v, a, b):
        return model.apply(v, a, b, train=False,
                           final_flow_only=True)["flow_up"][-1]

    t0 = time.perf_counter()
    assert np.isfinite(float(fwd(variables, img1, img2).mean()))
    print(f"compiled+warm in {time.perf_counter()-t0:.1f}s", flush=True)

    td = tempfile.mkdtemp(prefix="fwd_trace_")
    jax.profiler.start_trace(td)
    vals = [float(fwd(variables, img1 + i * 1e-5, img2).mean())
            for i in range(n)]
    jax.profiler.stop_trace()
    assert all(np.isfinite(v) for v in vals)
    # device still alive?
    assert np.isfinite(float(fwd(variables, img1, img2).mean()))
    print("traced ok; parsing", flush=True)

    paths = glob.glob(f"{td}/plugins/profile/*/*.trace.json.gz")
    if not paths:
        print("NO_TRACE_FILE", td)
        return
    d = json.load(gzip.open(paths[0]))
    ev = d.get("traceEvents", [])
    pids = {e["pid"]: e["args"].get("name", "") for e in ev
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    agg = {}
    total = 0.0
    for e in ev:
        if e.get("ph") != "X":
            continue
        if "TPU" not in str(pids.get(e.get("pid"), "")):
            continue
        name = e.get("name", "?")
        if name.startswith("jit_fwd"):  # the outer program envelope
            continue
        agg[name] = agg.get(name, 0.0) + e.get("dur", 0)
        total += e.get("dur", 0)
    print(f"device total: {total/n/1000:.2f} ms/fwd over {n} fwds")
    for name, us in sorted(agg.items(), key=lambda kv: -kv[1])[:30]:
        print(f"  {us/n/1000:8.3f} ms  {name[:110]}")


if __name__ == "__main__":
    main()
