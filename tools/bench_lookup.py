"""Microbench: correlation-pyramid window lookup, einsum vs pallas-v2.

Times ONE jitted function that runs `reps` chained lookups (each lookup's
output perturbs the next coords, forcing serialization inside the program),
then fetches a scalar. The relay's async/memoizing behavior can't distort a
single launch, and contention shows up as run-to-run spread, not bias.

Shapes mirror the production forward: B=1, 448x1024 -> /8 = 56x128 queries,
4 levels, r=4, bf16 volume. 12 reps ~= one forward's worth of lookups.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    import signal

    def _alarm(signum, frame):
        raise RuntimeError("relay watchdog")

    signal.signal(signal.SIGALRM, _alarm)
    signal.alarm(480)

    from flow_supervisor_tpu.kernels import corr_lookup_v2 as v2
    from flow_supervisor_tpu.ops.corr import (
        build_corr_pyramid_from_fmaps,
        corr_pyramid_lookup,
    )

    b, h1, w1, c = 1, 56, 128, 256
    radius, levels, reps = 4, 4, 12
    rng = np.random.RandomState(0)
    f1 = jnp.asarray(rng.randn(b, h1, w1, c), jnp.bfloat16)
    f2 = jnp.asarray(rng.randn(b, h1, w1, c), jnp.bfloat16)
    coords0 = jnp.stack(
        jnp.meshgrid(
            jnp.arange(w1, dtype=jnp.float32),
            jnp.arange(h1, dtype=jnp.float32),
            indexing="xy",
        ),
        axis=-1,
    )[None]

    @jax.jit
    def run_einsum(f1, f2, coords):
        pyr = build_corr_pyramid_from_fmaps(f1, f2, levels, jnp.bfloat16)
        acc = jnp.float32(0)
        for i in range(reps):
            out = corr_pyramid_lookup(pyr, coords, radius, dy_major=True)
            d = jnp.mean(out, axis=-1, keepdims=True) * 1e-6
            coords = coords + jnp.concatenate([d, -d], axis=-1)
            acc = acc + jnp.mean(out)
        return acc

    @jax.jit
    def run_pallas(f1, f2, coords):
        pyr = v2.build_padded_pyramid(f1, f2, levels, radius, jnp.bfloat16)
        acc = jnp.float32(0)
        for i in range(reps):
            out = v2.corr_pyramid_lookup_v2(pyr, coords, radius, dy_major=True)
            d = jnp.mean(out, axis=-1, keepdims=True) * 1e-6
            coords = coords + jnp.concatenate([d, -d], axis=-1)
            acc = acc + jnp.mean(out)
        return acc

    fns = {"einsum": run_einsum, "pallas": run_pallas}
    for name, fn in fns.items():
        print(f"compile {name}: {float(fn(f1, f2, coords0)):.4f}", flush=True)

    times = {n: [] for n in fns}
    for r in range(7):
        df1 = jnp.asarray(rng.randn(b, h1, w1, c), jnp.bfloat16)
        for name, fn in fns.items():
            t0 = time.perf_counter()
            val = float(fn(df1, f2, coords0))
            dt = time.perf_counter() - t0
            times[name].append(dt)
            print(f"round {r} {name}: {dt * 1e3:8.2f} ms ({val:.4f})", flush=True)
    print("---")
    for name, ts in times.items():
        med = sorted(ts)[len(ts) // 2]
        print(
            f"{name}: median {med * 1e3:.2f} ms for {reps} lookups+pyramid "
            f"(~{med * 1e3 / reps:.3f} ms/lookup-all-levels)"
        )


if __name__ == "__main__":
    main()
