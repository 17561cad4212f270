#!/usr/bin/env python
"""Trace-based forward perf: device-time ms/forward, immune to relay
contention (wall-clock through the TPU relay is bimodal; the xplane device
timeline is not). Prints total device ms/fwd and a by-source breakdown.

Usage: python tools/perf_fwd.py [--backend einsum|pallas] [--fp32]
       [--h 448] [--w 1024] [--iters 12] [--top 20] [--no-dymajor]
"""
from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import sys
import tempfile

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def arg(name, default):
    if name in sys.argv:
        return sys.argv[sys.argv.index(name) + 1]
    return default


def main():
    import signal

    def _alarm(signum, frame):
        raise RuntimeError("TPU relay unresponsive (watchdog)")

    signal.signal(signal.SIGALRM, _alarm)
    signal.alarm(int(arg("--watchdog", 480)))

    import jax
    import jax.numpy as jnp

    from flow_supervisor_tpu.models import RAFT, RAFTConfig

    h, w = int(arg("--h", 448)), int(arg("--w", 1024))
    iters = int(arg("--iters", 12))
    backend = arg("--backend", "einsum")
    bf16 = "--fp32" not in sys.argv
    cfg = RAFTConfig(
        iters=iters,
        dtype=jnp.bfloat16 if bf16 else jnp.float32,
        corr_dtype=jnp.bfloat16 if bf16 else jnp.float32,
        lookup_backend=backend,
        dy_major_corr="--no-dymajor" not in sys.argv,
    ).resolved()
    model = RAFT(cfg)

    rng = np.random.default_rng(0)
    img1 = jnp.asarray(rng.uniform(0, 1, (1, h, w, 3)), jnp.float32)
    img2 = jnp.asarray(rng.uniform(0, 1, (1, h, w, 3)), jnp.float32)
    print("init...", file=sys.stderr, flush=True)
    variables = model.init(jax.random.PRNGKey(0), img1, img2, train=False)

    @jax.jit
    def forward(v, image1, image2):
        return model.apply(v, image1, image2, train=False)["flow_up"][-1]

    print("warmup...", file=sys.stderr, flush=True)
    jax.block_until_ready(forward(variables, img1, img2))
    print("tracing...", file=sys.stderr, flush=True)

    if "--no-trace" in sys.argv:
        # wall-clock fallback: profiling a pallas custom-call wedges the axon
        # relay; min-of-N per-call wall time filters relay contention spikes
        import time

        # chain each output into the next input (forces serialization) and
        # fetch the final flow to host (a transfer cannot be faked) —
        # block_until_ready alone does not reliably block through the relay
        n_calls = int(arg("--n", 10))
        out = forward(variables, img1, img2)
        _ = np.asarray(out)
        t0 = time.perf_counter()
        for i in range(n_calls):
            out = forward(variables, img1 + out[:1, :1, :1, :1] * 1e-9, img2)
        _ = np.asarray(out)
        dt = (time.perf_counter() - t0) / n_calls
        print(
            json.dumps(
                {
                    "wall_ms_per_fwd_chained": round(dt * 1e3, 3),
                    "pairs_per_sec": round(1.0 / dt, 2),
                    "backend": backend,
                    "shape": [h, w],
                }
            )
        )
        return

    td = tempfile.mkdtemp(prefix="perf_fwd_")
    n = 3
    with jax.profiler.trace(td):
        for i in range(n):
            jax.block_until_ready(forward(variables, img1 + i * 1e-5, img2))

    p = glob.glob(f"{td}/plugins/profile/*/*.trace.json.gz")[0]
    d = json.load(gzip.open(p))
    ev = d.get("traceEvents", [])
    pids = {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e["args"].get("name", "")
    by_src = collections.Counter()
    total = 0.0
    for e in ev:
        if e.get("ph") == "X" and "TPU" in str(pids.get(e.get("pid"), "")):
            nme = e.get("name", "")
            if nme.startswith("jit_forward"):
                continue
            a = e.get("args") or {}
            stack = a.get("source_stack", "")
            repoline = next(
                (
                    l.rsplit("/", 1)[-1].rsplit(":", 1)[0]
                    for l in stack.split("\n")
                    if "/root/repo/" in l
                ),
                a.get("source", "<none>").rsplit("/", 1)[-1].rsplit(":", 1)[0]
                if a.get("source")
                else "<none>",
            )
            by_src[repoline] += e.get("dur", 0)
            total += e.get("dur", 0)
    print(
        json.dumps(
            {
                "device_ms_per_fwd": round(total / n / 1000, 3),
                "pairs_per_sec_devicetime": round(n * 1e6 / total, 2),
                "backend": backend,
                "shape": [h, w],
            }
        )
    )
    for s, us in by_src.most_common(int(arg("--top", 20))):
        print(f"  {us / n / 1000:8.3f} ms/fwd  {s}", file=sys.stderr)


if __name__ == "__main__":
    main()
