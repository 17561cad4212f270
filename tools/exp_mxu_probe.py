"""Pure-MXU pallas dot throughput probe: what TFLOP/s can a Mosaic
dot_general sustain at the fused-lookup's shapes vs bigger shapes?

Each kernel does `inner` dependent-free dots and accumulates a slice, fori
chain outside, one fetch. FLOPs are counted exactly.
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def make_kernel(m, k, n, inner, out_dtype):
    def kernel(a_ref, b_ref, o_ref):
        acc = jnp.zeros((m, 128), jnp.float32)
        for i in range(inner):
            # per-dot distinct rhs slice defeats CSE
            p = jax.lax.dot_general(
                a_ref[:, :], b_ref[:, i * 128 : i * 128 + n],
                (((1,), (0,)), ((), ())),
                preferred_element_type=out_dtype,
            )
            # consume EVERY column tile so nothing can be DCE'd
            for t in range(n // 128):
                acc = acc + p[:, t * 128 : (t + 1) * 128]
        o_ref[:, :] = acc

    return kernel


def run(m, k, n, inner=8, steps=8, reps=2000, out_dtype=jnp.float32):
    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.randn(m, k), jnp.bfloat16)
    b = jnp.asarray(rng.randn(k, n + 128 * inner), jnp.bfloat16)
    call = pl.pallas_call(
        make_kernel(m, k, n, inner, out_dtype),
        grid=(steps,),
        in_specs=[
            pl.BlockSpec((m, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, n + 128 * inner), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, 128), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((steps * m, 128), jnp.float32),
    )

    @jax.jit
    def chain(a, b):
        def it(i, acc):
            o = call(a + acc * 1e-20, b)
            return acc + jnp.sum(o[:1, :1]) * 1e-9
        return jax.lax.fori_loop(0, reps, it, jnp.float32(0))

    try:
        t0 = time.perf_counter()
        float(chain(a, b))
        cs = time.perf_counter() - t0
    except Exception as e:
        print(f"[{m:5d},{k:5d},{n:5d}] FAILED: {str(e)[:120]}")
        return
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(chain(a, b))
        ts.append(time.perf_counter() - t0)
    med = sorted(ts)[1] / reps
    flops = 2.0 * m * k * n * inner * steps
    tf = flops / med / 1e12
    od = "f32" if out_dtype == jnp.float32 else "bf16"
    print(f"[{m:5d},{k:5d},{n:5d}] out={od}: {med*1e6:8.1f} us/launch "
          f"({inner}x{steps} dots) = {tf:7.1f} TFLOP/s", flush=True)


def main():
    import signal

    def _alarm(s, f):
        raise RuntimeError("watchdog")

    signal.signal(signal.SIGALRM, _alarm)
    signal.alarm(520)

    run(128, 256, 1024)                    # fused-lookup group-dot shape
    run(128, 256, 7168, inner=1, reps=1000)           # whole level-0 plane in one dot
    run(256, 256, 1024)                    # 2 query tiles per dot
    run(512, 256, 1024)
    run(512, 512, 512)
    run(1024, 1024, 1024, inner=2, reps=1000)
    run(128, 256, 128, inner=56)           # production per-row dot shape


if __name__ == "__main__":
    main()
