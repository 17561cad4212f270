"""Phase ablation of the PRODUCTION fused lookup kernel on TPU.

exp_extract.py showed the per-query extraction+combine costs only ~10 ns/query
(the earlier "78 ns/query" attribution divided the whole kernel by queries).
This tool decomposes the production kernel's real cost:

  full      : production body (plane dots + row stores + extraction + combine)
  noext     : plane dots + stores only; extraction/combine replaced by const
  slimstore : full, but plane row stores write only lane 0 (keeps the MXU dots
              alive, kills 127/128 of the strided store traffic; extraction
              reads mostly-garbage — timing only)
  nodot     : no plane compute at all (extraction reads stale scratch)
  nothing   : const write (grid + block-DMA floor of the production grid)

Each variant runs the full 4-level pyramid x `reps` chained lookups inside one
jitted fori_loop (one lowering per level, reps executions; single scalar
fetch). Per-level timing via --level N.
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
from flow_supervisor_tpu.kernels.corr_lookup_v2 import BAND


def make_kernel_variant(mode):
    def kernel(idx_ref, frac_ref, f1_ref, f2_ref, s_ref, out_ref, plane_ref,
               sup_ref, *, tq, sup, cht, h2, w2, wp, ych, scale_recip,
               highest):
        yc = pl.program_id(2)
        nyc = pl.num_programs(2)
        if mode == "nothing":
            out_ref[:, :] = jnp.zeros(out_ref.shape, out_ref.dtype) + (
                frac_ref[0, 0].astype(out_ref.dtype))
            return
        precision = jax.lax.Precision.HIGHEST if highest else None
        if mode != "nodot":
            f1 = f1_ref[0]
            if mode == "groupstore" and ych % 8 == 0 and w2 == wp:
                # one dot per 8-row group: [TQ, C] x [C, 8*w2], then ONE
                # contiguous store (reshape is in-register)
                for g in range(ych // 8):
                    cols8 = jnp.concatenate(
                        [f2_ref[0, g * 8 + k] for k in range(8)], axis=1
                    )  # [C, 8*w2]
                    prod8 = jax.lax.dot_general(
                        f1, cols8, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=precision,
                    )
                    if scale_recip is not None:
                        prod8 = prod8 * scale_recip
                    else:
                        prod8 = prod8 / jnp.sqrt(
                            jnp.asarray(f1.shape[-1], jnp.float32))
                    g0 = pl.multiple_of(yc * ych + g * 8, 8)
                    plane_ref[:, pl.ds(g0, 8), 0:w2] = prod8.reshape(
                        tq, 8, w2).astype(plane_ref.dtype)
            else:
                for j in range(ych):
                    col = f2_ref[0, j]
                    prod = jax.lax.dot_general(
                        f1, col, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=precision,
                    )
                    if scale_recip is not None:
                        prod = prod * scale_recip
                    else:
                        prod = prod / jnp.sqrt(
                            jnp.asarray(f1.shape[-1], jnp.float32))
                    if mode == "slimstore":
                        plane_ref[:, yc * ych + j, 0:1] = prod[:, 0:1].astype(
                            plane_ref.dtype)
                    else:
                        plane_ref[:, yc * ych + j, 0:w2] = prod.astype(
                            plane_ref.dtype)

        if mode == "noext":
            @pl.when(yc == nyc - 1)
            def _():
                out_ref[:, :] = jnp.zeros(out_ref.shape, out_ref.dtype) + (
                    frac_ref[0, 0].astype(out_ref.dtype))
            return

        @pl.when(yc == nyc - 1)
        def _():
            iu = jax.lax.broadcasted_iota(jnp.int32, (sup, 16), 0)
            iv = jax.lax.broadcasted_iota(jnp.int32, (sup, 16), 1)
            for q in range(tq):
                by8 = pl.multiple_of(idx_ref[q, 0], 8)
                sy = idx_ref[q, 1]
                sx = idx_ref[q, 2]
                by = idx_ref[q, 3]
                bx = idx_ref[q, 4]
                band = plane_ref[q, pl.ds(by8, BAND), :]
                band = pltpu.roll(band, sy, axis=0)
                patch = pltpu.roll(band[:16], sx, axis=1)[:sup, :16]
                valid = (iu >= -by) & (iu < h2 - by) & (iv >= -bx) & (
                    iv < w2 - bx)
                sup_ref[q, :, :] = jnp.where(valid, patch, 0.0)
            acc = jax.lax.dot_general(
                sup_ref[:, 0, :], s_ref[0], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision,
            )
            for u in range(1, sup):
                acc += jax.lax.dot_general(
                    sup_ref[:, u, :], s_ref[u], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=precision,
                )
            fx = frac_ref[:, 0:1]
            fy = frac_ref[:, 1:2]
            out = (
                ((1.0 - fy) * (1.0 - fx)) * acc[:, 0 * cht : 1 * cht]
                + ((1.0 - fy) * fx) * acc[:, 1 * cht : 2 * cht]
                + (fy * (1.0 - fx)) * acc[:, 2 * cht : 3 * cht]
                + (fy * fx) * acc[:, 3 * cht : 4 * cht]
            )
            out_ref[:, :] = out.astype(out_ref.dtype)

    return kernel


def main():
    import signal

    def _alarm(signum, frame):
        raise RuntimeError("relay watchdog")

    signal.signal(signal.SIGALRM, _alarm)
    signal.alarm(540)

    b, h1, w1, c = 1, 56, 128, 256
    reps = int(sys.argv[sys.argv.index("--reps") + 1]) \
        if "--reps" in sys.argv else 96
    only_level = int(sys.argv[sys.argv.index("--level") + 1]) \
        if "--level" in sys.argv else None
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
        "nothing", "nodot", "noext", "slimstore", "full"]

    pyr = cf.build_fused_pyramid(f1, f2, 4, 4)

    orig_pick_ych = cf._pick_ych

    for name in names:
        kernel_fn = make_kernel_variant(name)
        orig = cf._fused_level_kernel
        cf._fused_level_kernel = kernel_fn
        if name == "groupstore":
            # whole plane per chunk, rounded to 8-row groups (padded f2 rows
            # are zero -> zero plane rows; validity masks unaffected)
            cf._pick_ych = lambda b, h2, c, w2, isz: ((h2 + 7) // 8) * 8
            pyr_v = cf.build_fused_pyramid(f1, f2, 4, 4)
        else:
            pyr_v = pyr
        try:
            @jax.jit
            def chain(pyr, coords):
                def it(i, carry):
                    acc, cds = carry
                    if only_level is not None:
                        lf = cf._fused_level(
                            pyr.f1, pyr.f2ts[only_level],
                            cds.reshape(b, h1 * w1, 2) / (2.0 ** only_level),
                            pyr.shapes[only_level], 4, 81, 0, True,
                            jnp.float32, jnp.float32,
                        )
                        out = lf.reshape(b, h1, w1, 81)
                    else:
                        out = cf.corr_pyramid_lookup_fused(
                            pyr, cds, 4, dy_major=True)
                    d = jnp.mean(out, axis=-1, keepdims=True) * 1e-6
                    cds = cds + jnp.concatenate([d, -d], axis=-1)
                    return (acc + jnp.mean(out), cds)

                acc, _ = jax.lax.fori_loop(
                    0, reps, it, (jnp.float32(0), coords))
                return acc

            t0 = time.perf_counter()
            v = float(chain(pyr_v, coords0))
            compile_s = time.perf_counter() - t0
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                float(chain(pyr_v, coords0))
                times.append(time.perf_counter() - t0)
            med = sorted(times)[len(times) // 2]
            per = med / reps
            print(f"{name:10s}: {per * 1e3:7.3f} ms/lookup-all-levels "
                  f"(compile {compile_s:.1f}s, v={v:.4f})", flush=True)
        finally:
            cf._fused_level_kernel = orig
            cf._pick_ych = orig_pick_ych


if __name__ == "__main__":
    main()
