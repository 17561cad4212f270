"""Probe: query-tile size (tq) sweep for the plane lookup kernel.

The resident plane-block DMA floor (0.724-0.758 ms/all-levels lookup at
448x1024 bf16) is ~4x the raw HBM byte time of the ~162 MB the lookup
fetches; per-grid-step overheads (DMA setup, pipeline bubbles at 56 tiles)
are a candidate. Sweep tq by monkeypatching corr_plane's _pick_tq.

  PYTHONPATH=/root/repo:/root/.axon_site python -u tools/exp_plane_tq.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from flow_supervisor_tpu.kernels import corr_plane as cp


def main():
    import signal

    def _alarm(signum, frame):
        raise RuntimeError("relay watchdog")

    signal.signal(signal.SIGALRM, _alarm)
    signal.alarm(560)

    b, h1, w1, c = 1, 56, 128, 256
    reps = 96
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
    )[None] + 2.3

    pyr = cp.build_packed_pyramid(f1, f2, 4, 4, out_dtype=jnp.bfloat16)
    tqs = [int(a) for a in sys.argv[1:] if a.isdigit()] or [128, 256, 512]
    orig = cp._pick_tq
    results = {}
    for tq in tqs:
        cp._pick_tq = lambda bqp, lo=128, _t=tq: _t
        try:
            @jax.jit
            def chain(pyr_, coords):
                def it(i, carry):
                    acc, cds = carry
                    out = cp.corr_pyramid_lookup_plane(
                        pyr_, cds, 4, dy_major=True)
                    d = jnp.mean(out, axis=-1, keepdims=True) * 1e-6
                    cds = cds + jnp.concatenate([d, -d], axis=-1)
                    return (acc + jnp.mean(out), cds)

                acc, _ = jax.lax.fori_loop(
                    0, reps, it, (jnp.float32(0), coords))
                return acc

            t0 = time.perf_counter()
            v = float(chain(pyr, coords0))
            compile_s = time.perf_counter() - t0
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                float(chain(pyr, coords0))
                times.append(time.perf_counter() - t0)
            med = sorted(times)[len(times) // 2]
            results[tq] = med / reps * 1e3
            print(f"tq={tq:4d}: {med / reps * 1e3:7.3f} ms/lookup "
                  f"(compile {compile_s:.1f}s, v={v:.4f})", flush=True)
        except Exception as e:
            print(f"tq={tq:4d}: FAILED {type(e).__name__}: {e}", flush=True)
        finally:
            cp._pick_tq = orig


if __name__ == "__main__":
    main()
