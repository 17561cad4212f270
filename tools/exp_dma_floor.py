"""What is the real HBM floor at the encoder's stage-1 layout? (round 5)

Both the XLA conv emitter and the pallas direct conv measure ~0.7 ms at
[2,224,512,64] 3x3 — 10x over the naive 58-MB read+write floor. Suspects:
(a) half-empty 128-lane tiles at C=64 doubling effective DMA bytes,
(b) the chain protocol's own elementwise+mean passes, (c) compute.

Carried-tensor chains (y_{i+1} = f(y_i), ONE fetch at the end — no
per-trip elementwise or reduction passes):

  copy64   : pallas identity copy at [2,224,512,64]
  copy128  : pallas identity copy of the SAME bytes viewed [2,224,256,128]
  pconv    : pallas direct 3x3 conv, weights scaled for ~unit gain
  xconv    : XLA conv, same weights
  pconv128 : pallas conv on the lane-packed view (weights rearranged so
             the packed conv equals the unpacked one; only needs W even)

Run ALONE. Chained fori_loop, one fetch (docs/PERF.md methodology).
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from flow_supervisor_tpu.kernels.conv3x3 import conv3x3_fused

B, H, W, C = 2, 224, 512, 64


def copy_kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...]


def build_copy(n, shape, tr):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w, c = shape
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.uniform(-1, 1, shape), jnp.bfloat16)

    def one(x_):
        return pl.pallas_call(
            copy_kernel,
            grid=(b, h // tr),
            in_specs=[pl.BlockSpec((1, tr, w, c), lambda b_, i: (b_, i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, tr, w, c), lambda b_, i: (b_, i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(shape, x_.dtype),
        )(x_)

    @jax.jit
    def chained(y0, n_):
        return jax.lax.fori_loop(0, n_, lambda i, y: one(y), y0)

    return chained, x


def build_conv(n, kind):
    rng = np.random.RandomState(1)
    # ~unit spectral gain so a carried chain neither explodes nor vanishes
    k = jnp.asarray(rng.normal(0, 1.0 / np.sqrt(9 * C), (3, 3, C, C)),
                    jnp.bfloat16)
    bias = jnp.zeros((C,), jnp.bfloat16)
    x = jnp.asarray(rng.uniform(-1, 1, (B, H, W, C)), jnp.bfloat16)

    if kind == "pallas":
        def one(y):
            return conv3x3_fused(y, k, bias)
    else:
        def one(y):
            return jax.lax.conv_general_dilated(
                y, k, window_strides=(1, 1), padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32,
            ).astype(y.dtype)

    @jax.jit
    def chained(y0, n_):
        return jax.lax.fori_loop(0, n_, lambda i, y: one(y), y0)

    return chained, x


def main():
    import signal

    def _alarm(signum, frame):
        raise RuntimeError("watchdog")

    signal.signal(signal.SIGALRM, _alarm)
    signal.alarm(int(sys.argv[sys.argv.index("--watchdog") + 1])
                 if "--watchdog" in sys.argv else 900)
    n = int(sys.argv[sys.argv.index("--n") + 1]) if "--n" in sys.argv else 100

    builders = {
        "copy64": lambda: build_copy(n, (B, H, W, C), 8),
        "copy128": lambda: build_copy(n, (B, H, W // 2, C * 2), 8),
        "pconv": lambda: build_conv(n, "pallas"),
        "xconv": lambda: build_conv(n, "xla"),
    }
    fns = {}
    for name, bld in builders.items():
        t0 = time.perf_counter()
        fn, x = bld()
        y = fn(x, jnp.int32(2))
        assert np.isfinite(float(jnp.mean(jnp.abs(y.astype(jnp.float32))))), name
        fns[name] = (fn, x)
        print(f"{name:9s} warm ({time.perf_counter()-t0:.0f}s)", flush=True)

    results = {k: [] for k in fns}
    for rnd in range(3):
        for name, (fn, x) in fns.items():
            t0 = time.perf_counter()
            y = fn(x, jnp.int32(n))
            v = float(jnp.mean(jnp.abs(y.astype(jnp.float32))))
            dt = (time.perf_counter() - t0) / n * 1e3
            assert np.isfinite(v)
            results[name].append(dt)
            print(f"round {rnd} {name:9s}: {dt:7.3f} ms", flush=True)
    print("--- medians (ms/op) ---")
    for name, ts in results.items():
        med = float(np.median(ts))
        gbs = (B * H * W * C * 2 * 2) / med / 1e6  # rd+wr GB/s
        print(f"{name:9s}: {med:7.3f} ms   {gbs:6.0f} GB/s effective", flush=True)


if __name__ == "__main__":
    main()
