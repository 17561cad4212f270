"""A/B: conv->instance-norm->relu as [XLA conv + 3-pass fused norm] vs
[pallas conv-with-stats-epilogue + apply-only norm] (round 5).

The epilogue makes the norm's stats pass free (PERF.md round-5: the norm
runs at ~80% of its 3-pass floor, so dropping a pass is the remaining
lever; the conv kernel itself ties XLA). Carried chains (norm output is
~unit-scale, so y -> convnorm(y) is self-stabilizing), interleaved rounds,
one fetch. Run ALONE.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from flow_supervisor_tpu.kernels.conv3x3 import conv3x3_stats
from flow_supervisor_tpu.kernels.norm import instance_norm_apply, instance_norm_fused

B, H, W, C = 2, 224, 512, 64


def build(kind, n):
    rng = np.random.RandomState(1)
    k = jnp.asarray(rng.normal(0, 1.0 / np.sqrt(9 * C), (3, 3, C, C)),
                    jnp.bfloat16)
    bias = jnp.zeros((C,), jnp.bfloat16)
    x = jnp.asarray(rng.uniform(-1, 1, (B, H, W, C)), jnp.bfloat16)

    if kind == "fusedpair":
        def one(y):
            y2, st = conv3x3_stats(y, k, bias)
            return instance_norm_apply(y2, st, relu=True)
    else:
        def one(y):
            y2 = jax.lax.conv_general_dilated(
                y, k, window_strides=(1, 1), padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32,
            ).astype(y.dtype)
            return instance_norm_fused(y2, relu=True)

    @jax.jit
    def chained(y0, n_):
        return jax.lax.fori_loop(0, n_, lambda i, y: one(y), y0)

    return chained, x


def main():
    import signal

    signal.signal(signal.SIGALRM,
                  lambda s, f: (_ for _ in ()).throw(RuntimeError("wd")))
    signal.alarm(int(sys.argv[sys.argv.index("--watchdog") + 1])
                 if "--watchdog" in sys.argv else 800)
    n = int(sys.argv[sys.argv.index("--n") + 1]) if "--n" in sys.argv else 100

    fns = {}
    for kind in ("xla_norm3", "fusedpair"):
        t0 = time.perf_counter()
        fn, x = build(kind, n)
        y = fn(x, jnp.int32(2))
        assert np.isfinite(float(jnp.mean(jnp.abs(y.astype(jnp.float32))))), kind
        fns[kind] = (fn, x)
        print(f"{kind:10s} warm ({time.perf_counter()-t0:.0f}s)", flush=True)

    results = {kk: [] for kk in fns}
    for rnd in range(3):
        for kind, (fn, x) in fns.items():
            t0 = time.perf_counter()
            y = fn(x, jnp.int32(n))
            v = float(jnp.mean(jnp.abs(y.astype(jnp.float32))))
            dt = (time.perf_counter() - t0) / n * 1e3
            assert np.isfinite(v)
            results[kind].append(dt)
            print(f"round {rnd} {kind:10s}: {dt:7.3f} ms", flush=True)
    print("--- medians (ms per conv+norm+relu) ---")
    for kind, ts in results.items():
        print(f"{kind:10s}: {float(np.median(ts)):7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
