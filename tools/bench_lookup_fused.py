"""Microbench: fused volume-free lookup vs einsum vs pallas-v2 on TPU.

Same protocol as bench_lookup.py (one jitted launch of `reps` chained
lookups + pyramid build, scalar fetch). Also reports per-backend compile wall
time — the relay's remote compile is the round-3 bench bottleneck.
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
    signal.alarm(int(sys.argv[sys.argv.index("--watchdog") + 1])
                 if "--watchdog" in sys.argv else 540)

    from flow_supervisor_tpu.kernels import corr_fused as cf
    from flow_supervisor_tpu.kernels import corr_lookup_v2 as v2
    from flow_supervisor_tpu.ops.corr import (
        build_corr_pyramid_from_fmaps,
        corr_pyramid_lookup,
    )

    b, h1, w1, c = 1, 56, 128, 256
    radius, levels = 4, 4
    reps = int(sys.argv[sys.argv.index("--reps") + 1]) if "--reps" in sys.argv else 12
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

    def chain(lookup_fn, build_fn):
        @jax.jit
        def run(f1, f2, coords):
            pyr = build_fn(f1, f2)
            acc = jnp.float32(0)
            for i in range(reps):
                out = lookup_fn(pyr, coords)
                d = jnp.mean(out, axis=-1, keepdims=True) * 1e-6
                coords = coords + jnp.concatenate([d, -d], axis=-1)
                acc = acc + jnp.mean(out)
            return acc

        return run

    fns = {}
    which = [a for a in sys.argv[1:] if not a.startswith("--")] or [
        "einsum", "pallas", "fused"]
    if "einsum" in which:
        fns["einsum"] = chain(
            lambda p, cds: corr_pyramid_lookup(p, cds, radius, dy_major=True),
            lambda a, b2: build_corr_pyramid_from_fmaps(a, b2, levels, jnp.bfloat16),
        )
    if "pallas" in which:
        fns["pallas"] = chain(
            lambda p, cds: v2.corr_pyramid_lookup_v2(p, cds, radius, dy_major=True),
            lambda a, b2: v2.build_padded_pyramid(a, b2, levels, radius, jnp.bfloat16),
        )
    if "fused" in which:
        fns["fused"] = chain(
            lambda p, cds: cf.corr_pyramid_lookup_fused(p, cds, radius, dy_major=True),
            lambda a, b2: cf.build_fused_pyramid(a, b2, levels, radius),
        )

    for name, fn in fns.items():
        t0 = time.perf_counter()
        val = float(fn(f1, f2, coords0))
        print(f"compile {name}: {time.perf_counter()-t0:.1f}s ({val:.4f})",
              flush=True)

    times = {n: [] for n in fns}
    for r in range(5):
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
