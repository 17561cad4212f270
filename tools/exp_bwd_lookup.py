"""Price the fused-lookup BACKWARD on TPU: fp32 vs bf16 cotangent paths.

The closed-form VJP (kernels/corr_fused.py _lookup_bwd) materializes a
transient per-level cotangent volume d_vol [B, Q, h2, w2] in HBM and runs two
big factor contractions over it. With fp32 cotangents that volume is fp32 and
the contractions run fp32-operand MXU (~1/8 throughput); with bf16 cotangents
(the production out_dtype) lookup_vjp_dvols emits d_vol in bf16 and the
contractions run bf16. This tool measures fwd+bwd per lookup for both paths,
interleaved in one process, at the semi-recipe teacher shape (432x1024 -> 54x128
query grid) and the sup-crop shape (400x720 -> 50x90).

Protocol: each variant chains `reps` value_and_grad evaluations inside one
jitted fori_loop (grads feed the next iteration's f1 so nothing is DCE'd),
single scalar fetch (docs/PERF.md methodology #1).
"""
import functools
import signal
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from flow_supervisor_tpu.kernels import corr_fused as cf


def build(h8, w8, c, out_dtype, reps):
    rng = np.random.RandomState(0)
    f1 = jnp.asarray(rng.randn(1, h8, w8, c), jnp.bfloat16)
    f2 = jnp.asarray(rng.randn(1, h8, w8, c), jnp.bfloat16)
    coords = jnp.asarray(
        np.stack(
            [rng.uniform(0, w8, (1, h8, w8)), rng.uniform(0, h8, (1, h8, w8))],
            -1,
        ),
        jnp.float32,
    )

    def loss(f1_, f2_):
        pyr = cf.build_fused_pyramid(f1_, f2_, 4, 4)
        out = cf.corr_pyramid_lookup_fused(pyr, coords, 4, out_dtype=out_dtype)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    gfn = jax.value_and_grad(loss, argnums=(0, 1))

    @jax.jit
    def chain(f1_, f2_, tick):
        def body(i, carry):
            a, b, acc = carry
            v, (da, db) = gfn(a, b)
            # feed grads back so every iteration depends on the previous
            return (
                (a + 1e-6 * da.astype(a.dtype)).astype(a.dtype),
                (b + 1e-6 * db.astype(b.dtype)).astype(b.dtype),
                acc + v,
            )

        a, b, acc = jax.lax.fori_loop(
            0, reps, body, (f1_ + tick, f2_, jnp.zeros([], jnp.float32))
        )
        return acc + jnp.sum(a.astype(jnp.float32)[0, 0, 0])

    return chain, f1, f2


def main():
    signal.alarm(
        int(sys.argv[sys.argv.index("--watchdog") + 1])
        if "--watchdog" in sys.argv
        else 560
    )
    reps = (
        int(sys.argv[sys.argv.index("--reps") + 1])
        if "--reps" in sys.argv
        else 24
    )
    shapes = {"teacher_432x1024": (54, 128), "sup_400x720": (50, 90)}
    # (label, cotangent dtype, use the volume-free backward kernels)
    variants = (
        ("einsum_fp32", jnp.float32, False),
        ("einsum_bf16", jnp.bfloat16, False),
        ("kernel_bf16", jnp.bfloat16, True),
    )
    for name, (h8, w8) in shapes.items():
        fns = {}
        for vname, dt, use_kernel in variants:
            cf.BWD_KERNEL = use_kernel  # captured at trace time (first call)
            try:
                fn, f1, f2 = build(h8, w8, 256, dt, reps)
                t0 = time.perf_counter()
                v = float(fn(f1, f2, jnp.bfloat16(0)))
                print(
                    f"{name} {vname} warm: {v:.3e} "
                    f"({time.perf_counter() - t0:.0f}s)",
                    flush=True,
                )
                fns[vname] = (fn, f1, f2)
            except Exception as e:  # Mosaic regression must not kill the A/B
                print(f"{name} {vname} FAILED {type(e).__name__}: {e}",
                      flush=True)
            finally:
                cf.BWD_KERNEL = True
        times = {k: [] for k in fns}
        for r in range(3):
            for vname, (fn, f1, f2) in fns.items():
                t0 = time.perf_counter()
                float(fn(f1, f2, jnp.bfloat16(r + 1) * 1e-6))
                dt_ms = (time.perf_counter() - t0) / reps * 1e3
                times[vname].append(dt_ms)
                print(f"round {r} {name} {vname}: {dt_ms:7.3f} ms/fwd+bwd",
                      flush=True)
        for vname, ts in times.items():
            med = sorted(ts)[len(ts) // 2]
            print(f"{name} {vname}: {med:7.3f} ms/fwd+bwd (median)",
                  flush=True)


if __name__ == "__main__":
    main()
