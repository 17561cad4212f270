"""Interleaved A/B: full forward with instance norms vs with them stubbed to
identity — measures the TOTAL cost of the fnet instance-norm stack (the norm
math plus any layout copies XLA wraps around it), which the round-2 xplane
profile put at ~6.8 ms/fwd. Interleaving in one process cancels relay
contention drift (docs/PERF.md methodology). The stub changes numerics, not
shapes — perf-only tool."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def build_chain(n, backend="einsum", scan=False, fused_norm=False, batch=1):
    from flow_supervisor_tpu.models import RAFT, RAFTConfig

    cfg = RAFTConfig(
        iters=12, dtype=jnp.bfloat16, corr_dtype=jnp.bfloat16,
        lookup_backend=backend, scan_iters=scan, fused_norm=fused_norm,
    ).resolved()
    model = RAFT(cfg)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64, 3)), train=False,
    )

    @jax.jit
    def chained(v, i1, i2, s0):
        def body(i, s):
            out = model.apply(v, i1 + s * 1e-9, i2, train=False,
                              final_flow_only=True)["flow_up"][-1]
            return jnp.mean(jnp.abs(out))

        return jax.lax.fori_loop(0, n, body, s0)

    return chained, variables


def main():
    import signal

    def _alarm(signum, frame):
        raise RuntimeError("relay watchdog")

    signal.signal(signal.SIGALRM, _alarm)
    signal.alarm(540)

    from flow_supervisor_tpu.models import layers

    backend = sys.argv[sys.argv.index("--backend") + 1] \
        if "--backend" in sys.argv else "einsum"
    scan = "--scan" in sys.argv
    batch = int(sys.argv[sys.argv.index("--batch") + 1]) \
        if "--batch" in sys.argv else 1
    # --fused: B side = pallas fused norm kernel (vs A = XLA norm). Default:
    # B side = identity stub (measures the TOTAL norm-stack cost).
    fused = "--fused" in sys.argv
    n = max(4, 24 // batch)
    rng = np.random.RandomState(0)
    shape = (batch, 448, 1024, 3)

    fn_a, v = build_chain(n, backend, scan, False, batch)  # XLA norms
    x1 = jnp.asarray(rng.uniform(0, 1, shape), jnp.float32)
    x2 = jnp.asarray(rng.uniform(0, 1, shape), jnp.float32)
    t0 = time.perf_counter()
    print("A warm:", float(fn_a(v, x1, x2, jnp.float32(0))),
          f"({time.perf_counter()-t0:.0f}s)", flush=True)

    if fused:
        fn_b, _ = build_chain(n, backend, scan, True, batch)
        t0 = time.perf_counter()
        print("B warm:", float(fn_b(v, x1, x2, jnp.float32(0))),
              f"({time.perf_counter()-t0:.0f}s)", flush=True)
    else:
        real_norm = layers.instance_norm
        layers.instance_norm = lambda x, eps=1e-5: x  # identity stub
        try:
            fn_b, _ = build_chain(n, backend, scan, False, batch)
            t0 = time.perf_counter()
            print("B warm:", float(fn_b(v, x1, x2, jnp.float32(0))),
                  f"({time.perf_counter()-t0:.0f}s)", flush=True)
        finally:
            layers.instance_norm = real_norm

    times = {"norm": [], "nonorm": []}
    for r in range(4):
        x1 = jnp.asarray(rng.uniform(0, 1, shape), jnp.float32)
        for name, fn in (("norm", fn_a), ("nonorm", fn_b)):
            t0 = time.perf_counter()
            val = float(fn(v, x1, x2, jnp.float32(r + 1)))
            dt = time.perf_counter() - t0
            times[name].append(dt)
            print(f"round {r} {name}: {dt/n*1e3:7.2f} ms/fwd ({val:.4f})",
                  flush=True)
    print("---")
    med = {k: sorted(ts)[len(ts) // 2] / n * 1e3 for k, ts in times.items()}
    print(f"norm {med['norm']:.2f} ms/fwd, nonorm {med['nonorm']:.2f} ms/fwd, "
          f"instance-norm stack total: {med['norm'] - med['nonorm']:.2f} ms/fwd")


if __name__ == "__main__":
    main()
