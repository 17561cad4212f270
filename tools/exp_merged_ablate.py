"""Phase ablation of the MERGED all-levels fused lookup kernel on TPU.

The round-3 headline kernel runs all 4 pyramid levels in one pallas_call
(corr_fused._fused_all_kernel). The zero-lookup model ablation says the
lookup still costs ~27 ms of the 37 ms forward (~2.2 ms per lookup), while
exp_extract measured the extraction loop at only ~10 ns/query (~0.5 ms per
lookup at 4x7168 query-extractions). This tool decomposes the production
merged kernel in place:

  nothing  : const store (grid + f1/idx/frac block-DMA floor)
  nodots   : skip the plane MXU dots (extraction reads stale scratch)
  dotsonly : plane dots only; const out (no extraction/combine)
  nocombine: dots + extraction; skip the one-hot combine dots
  nofrac   : full minus the final frac lerp (4 vector FMAs on [TQ, CHT])
  full     : production body

Each variant chains `reps` full-pyramid lookups inside one jitted fori_loop
with coords drifting per iteration (single lowering, one scalar fetch).
Monkeypatches corr_fused._fused_all_kernel; everything else (layouts, specs,
index maps) is the production path.
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

from flow_supervisor_tpu.kernels import corr_fused as cf


def make_kernel(mode):
    def kernel(idx_ref, frac_ref, f1_ref, *rest,
               tq, sup, cht, level_meta, scale_recip, highest):
        nl = len(level_meta)
        f2_refs = rest[:nl]
        s_ref = rest[nl]
        out_ref = rest[nl + 1]
        plane_ref = rest[nl + 2]
        sup_ref = rest[nl + 3]
        precision = jax.lax.Precision.HIGHEST if highest else None
        if mode == "nothing":
            out_ref[:, :] = jnp.zeros(out_ref.shape, out_ref.dtype) + (
                frac_ref[0, 0].astype(out_ref.dtype))
            return
        f1 = f1_ref[0]
        for lvl, (h2, w2, wp, ngr) in enumerate(level_meta):
            if mode != "nodots":
                cf._plane_dots(
                    f1, f2_refs[lvl].at[0], plane_ref,
                    ngr=ngr, g_base=0, w2=w2, wp=wp,
                    scale_recip=scale_recip, precision=precision, tq=tq,
                )
            if mode == "dotsonly":
                continue
            _extract(
                idx_ref, frac_ref, s_ref, plane_ref, sup_ref, out_ref,
                tq=tq, sup=sup, cht=cht, h2=h2, w2=w2, wp=wp,
                ch0=lvl * cht, precision=precision, qoff=lvl * tq, mode=mode,
            )
        if mode == "dotsonly":
            out_ref[:, :] = jnp.zeros(out_ref.shape, out_ref.dtype) + (
                frac_ref[0, 0].astype(out_ref.dtype))

    return kernel


def _extract(idx_ref, frac_ref, s_ref, plane_ref, sup_ref, out_ref, *,
             tq, sup, cht, h2, w2, wp, ch0, precision, qoff, mode):
    from flow_supervisor_tpu.kernels.corr_lookup_v2 import BAND

    iu = jax.lax.broadcasted_iota(jnp.int32, (sup, 16), 0)
    iv = jax.lax.broadcasted_iota(jnp.int32, (sup, 16), 1)
    for q in range(tq):
        by8 = pl.multiple_of(idx_ref[qoff + q, 0], 8)
        sy = idx_ref[qoff + q, 1]
        sx = idx_ref[qoff + q, 2]
        by = idx_ref[qoff + q, 3]
        bx = idx_ref[qoff + q, 4]
        band = plane_ref[q, pl.ds(by8, BAND), 0:wp]
        band = pltpu.roll(band, sy, axis=0)
        patch = pltpu.roll(band[:16], sx, axis=1)[:sup, :16]
        valid = (iu >= -by) & (iu < h2 - by) & (iv >= -bx) & (iv < w2 - bx)
        sup_ref[q, :, :] = jnp.where(valid, patch, 0.0)
    if mode == "nocombine":
        out_ref[:, ch0 : ch0 + cht] = (
            jnp.zeros((tq, cht), jnp.float32) + sup_ref[0, 0, 0]
        ).astype(out_ref.dtype)
        return
    acc = jax.lax.dot_general(
        sup_ref[:, 0, :], s_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )
    for u in range(1, sup):
        acc += jax.lax.dot_general(
            sup_ref[:, u, :], s_ref[u], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )
    if mode == "nofrac":
        out_ref[:, ch0 : ch0 + cht] = acc[:, :cht].astype(out_ref.dtype)
        return
    fx = frac_ref[qoff : qoff + tq, 0:1]
    fy = frac_ref[qoff : qoff + tq, 1:2]
    out = (
        ((1.0 - fy) * (1.0 - fx)) * acc[:, 0 * cht : 1 * cht]
        + ((1.0 - fy) * fx) * acc[:, 1 * cht : 2 * cht]
        + (fy * (1.0 - fx)) * acc[:, 2 * cht : 3 * cht]
        + (fy * fx) * acc[:, 3 * cht : 4 * cht]
    )
    out_ref[:, ch0 : ch0 + cht] = out.astype(out_ref.dtype)


def main():
    import signal

    def _alarm(signum, frame):
        raise RuntimeError("relay watchdog")

    signal.signal(signal.SIGALRM, _alarm)
    signal.alarm(int(sys.argv[sys.argv.index("--watchdog") + 1])
                 if "--watchdog" in sys.argv else 560)

    b, h1, w1, c = 1, 56, 128, 256
    reps = int(sys.argv[sys.argv.index("--reps") + 1]) \
        if "--reps" in sys.argv else 96
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

    names = [a for a in sys.argv[1:] if not a.startswith("--")
             and not a.lstrip("-").isdigit()] or [
        "nothing", "nodots", "dotsonly", "nocombine", "nofrac", "full"]

    pyr = cf.build_fused_pyramid(f1, f2, 4, 4)
    orig = cf._fused_all_kernel
    for name in names:
        cf._fused_all_kernel = orig if name == "full" else make_kernel(name)
        try:
            @jax.jit
            def chain(pyr, coords):
                def it(i, carry):
                    acc, cds = carry
                    out = cf.corr_pyramid_lookup_fused(
                        pyr, cds, 4, dy_major=True)
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
            per = med / reps
            print(f"{name:10s}: {per * 1e3:7.3f} ms/lookup-all-levels "
                  f"(compile {compile_s:.1f}s, v={v:.4f})", flush=True)
        except Exception as e:
            print(f"{name:10s}: FAILED {type(e).__name__}: {e}", flush=True)
        finally:
            cf._fused_all_kernel = orig


if __name__ == "__main__":
    main()
