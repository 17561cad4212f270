"""A/B: pallas direct 3x3 conv (kernels/conv3x3.py) vs XLA conv emitter at
the encoder's hot shapes (round 5).

Motivation: tools/exp_conv_probe.py measured the emitter paying im2col-scale
traffic (conv64 0.670 ms == its 264-MB im2col matmul; true footprint 58 MB).
The pallas kernel streams rows once (3x with halo specs) and does nine
shifted MXU dots in VMEM.

Interleaved rounds, chained fori_loop, one scalar fetch (docs/PERF.md
methodology). Run ALONE on the host.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from flow_supervisor_tpu.kernels.conv3x3 import conv3x3_fused


def build(kind, n, shape, c):
    b, h, w = shape
    rng = np.random.RandomState(1)
    k = jnp.asarray(rng.normal(0, 0.05, (3, 3, c, c)), jnp.bfloat16)
    bias = jnp.asarray(rng.normal(0, 0.01, (c,)), jnp.bfloat16)
    x = jnp.asarray(rng.uniform(-1, 1, (b, h, w, c)), jnp.bfloat16)

    if kind == "pallas":
        def one(x_):
            return conv3x3_fused(x_, k, bias)
    else:
        def one(x_):
            y = jax.lax.conv_general_dilated(
                x_, k, window_strides=(1, 1), padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32,
            ) + bias.astype(jnp.float32)
            return y.astype(x_.dtype)

    @jax.jit
    def chained(x0, s0):
        def body(i, s):
            y = one(x0 + s * jnp.bfloat16(1e-3))
            return jnp.mean(y).astype(jnp.bfloat16)

        return jax.lax.fori_loop(0, n, body, s0)

    return chained, x

def main():
    import signal

    def _alarm(signum, frame):
        raise RuntimeError("watchdog")

    signal.signal(signal.SIGALRM, _alarm)
    signal.alarm(int(sys.argv[sys.argv.index("--watchdog") + 1])
                 if "--watchdog" in sys.argv else 900)

    n = int(sys.argv[sys.argv.index("--n") + 1]) if "--n" in sys.argv else 100
    shapes = {
        "s1": ((2, 224, 512), 64),
        "s2": ((2, 112, 256), 96),
        "s3": ((2, 56, 128), 128),
    }
    variants = {}
    for tag, (shape, c) in shapes.items():
        for kind in ("xla", "pallas"):
            variants[f"{kind}_{tag}"] = (kind, shape, c)

    fns = {}
    for name, (kind, shape, c) in variants.items():
        t0 = time.perf_counter()
        fn, x = build(kind, n, shape, c)
        v = float(fn(x, jnp.bfloat16(0)))
        assert np.isfinite(v), name
        fns[name] = (fn, x)
        print(f"{name:12s} warm ({time.perf_counter()-t0:.0f}s)", flush=True)

    results = {k: [] for k in fns}
    for rnd in range(3):
        for name, (fn, x) in fns.items():
            t0 = time.perf_counter()
            v = float(fn(x, jnp.bfloat16(rnd + 1)))
            dt = (time.perf_counter() - t0) / n * 1e3
            assert np.isfinite(v)
            results[name].append(dt)
            print(f"round {rnd} {name:12s}: {dt:7.3f} ms", flush=True)
    print("--- medians ---")
    for name, ts in results.items():
        print(f"{name:12s}: {float(np.median(ts)):7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
