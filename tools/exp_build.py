"""Microbench build_padded_pyramid (the plane materialization) on TPU.

Model-level ablation (exp_model_plane_ablate.py) shows the build costs ~10
ms/fwd at 448x1024 — more than all 12 lookup kernels. Decompose:

  dot     : level-0 all-pairs matmul only ([BQ,256]x[256,BQ] -> bf16)
  vols    : all 4 correlation volumes (matmul + fmap pooling)
  pad     : vols + pad_plane copies (no barrier)
  full    : production build_padded_pyramid (incl. optimization_barrier)

Each variant chains `reps` builds inside one jitted fori_loop with fmap1
drifting per iteration; one scalar fetch.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from flow_supervisor_tpu.kernels import corr_lookup_v2 as v2
from flow_supervisor_tpu.ops.corr import (
    all_pairs_correlation,
    build_corr_pyramid_from_fmaps,
)


def main():
    import signal

    def _alarm(signum, frame):
        raise RuntimeError("relay watchdog")

    signal.signal(signal.SIGALRM, _alarm)
    signal.alarm(560)

    b, h1, w1, c = 1, 56, 128, 256
    reps = int(sys.argv[sys.argv.index("--reps") + 1]) \
        if "--reps" in sys.argv else 64
    rng = np.random.RandomState(0)
    f1 = jnp.asarray(rng.randn(b, h1, w1, c), jnp.bfloat16)
    f2 = jnp.asarray(rng.randn(b, h1, w1, c), jnp.bfloat16)

    def var_dot(f1_, f2_):
        return [all_pairs_correlation(f1_, f2_, jnp.bfloat16)]

    def var_vols(f1_, f2_):
        return build_corr_pyramid_from_fmaps(f1_, f2_, 4, jnp.bfloat16)

    def var_pad(f1_, f2_):
        return [
            v2.pad_plane(v, 4)
            for v in build_corr_pyramid_from_fmaps(f1_, f2_, 4, jnp.bfloat16)
        ]

    def var_full(f1_, f2_):
        return list(v2.build_padded_pyramid(f1_, f2_, 4, 4,
                                            out_dtype=jnp.bfloat16).planes)

    for name, fn in (("dot", var_dot), ("vols", var_vols),
                     ("pad", var_pad), ("full", var_full)):
        try:
            @jax.jit
            def chain(f1_, f2_):
                def it(i, carry):
                    acc, f1c = carry
                    outs = fn(f1c, f2_)
                    s = sum(jnp.mean(o.astype(jnp.float32)) for o in outs)
                    # drift f1 from the result so iterations can't dedupe
                    f1c = f1c + (s * 1e-9).astype(f1c.dtype)
                    return (acc + s, f1c)

                acc, _ = jax.lax.fori_loop(
                    0, reps, it, (jnp.float32(0), f1_))
                return acc

            t0 = time.perf_counter()
            v = float(chain(f1, f2))
            compile_s = time.perf_counter() - t0
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                float(chain(f1, f2))
                times.append(time.perf_counter() - t0)
            med = sorted(times)[len(times) // 2]
            print(f"{name:5s}: {med / reps * 1e3:7.3f} ms/build "
                  f"(compile {compile_s:.1f}s, v={v:.4f})", flush=True)
        except Exception as e:
            print(f"{name:5s}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
