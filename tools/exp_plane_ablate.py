"""Phase ablation of the PLANE lookup kernel (corr_plane._plane_kernel) on TPU.

The plane backend materializes the padded planes once per forward and runs
one pallas call per lookup (in-kernel index math + extraction + one-hot
combine + frac lerp). This decomposes that call in place:

  nothing   : const store (grid + plane/coords block-DMA floor — the plane
              blocks are DMA'd to VMEM per grid step regardless of use)
  noscalar  : extraction + combine + lerp with STATIC per-query indices
              (no SMEM coord reads, no scalar-unit index math)
  noextract : scalar index math + combine dots + lerp on stale sup_ref
  extract   : scalar math + extraction only, const out
  full      : production body

Each variant chains `reps` full-pyramid lookups inside one jitted fori_loop
with coords drifting per iteration. Monkeypatches corr_plane._plane_kernel;
everything else (plane build, layouts, specs) is the production path.
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

from flow_supervisor_tpu.kernels import corr_plane as cp
from flow_supervisor_tpu.kernels.corr_lookup_v2 import BAND, build_padded_pyramid


def make_kernel(mode):
    """Production-layout variants (round-4 SMEM-fed index planes: the kernel
    receives [5*nl, tq] precomputed indices; scalar math lives in the XLA
    prologue — see corr_plane._index_planes)."""

    def kernel(ix_ref, cv_ref, *rest, tq, sup, cht, level_meta, plans, radius,
               highest):
        ng = len(plans)
        group_refs = rest[:ng]
        s_ref = rest[ng]
        out_ref = rest[ng + 1]
        scratch_ref = rest[ng + 2]
        sup_ref = rest[ng + 3]
        LANES = cp.LANES
        if mode == "nothing":
            out_ref[:, :] = jnp.zeros(out_ref.shape, out_ref.dtype) + (
                cv_ref[0, 0].astype(out_ref.dtype))
            return
        iu = jax.lax.broadcasted_iota(jnp.int32, (sup, 16), 0)
        iv = jax.lax.broadcasted_iota(jnp.int32, (sup, 16), 1)
        cvec = cv_ref[...].astype(jnp.float32)
        precision = jax.lax.Precision.HIGHEST if highest else None
        for lvl, (grp, off, h2, w2) in enumerate(level_meta):
            hp_g, wg = plans[grp]
            wp_pad = cp._round_up(w2, LANES)
            scale = 1.0 / (2.0 ** lvl)
            base = 5 * lvl
            for q in range(tq):
                by8 = pl.multiple_of(ix_ref[base + 0, q], 8)
                sy = ix_ref[base + 1, q]
                sx = ix_ref[base + 2, q]
                by = ix_ref[base + 3, q]
                bx = ix_ref[base + 4, q]
                band = group_refs[grp][q, pl.ds(by8, BAND), :].astype(
                    jnp.float32)
                band = pltpu.roll(band, sy, axis=0)
                if wg % LANES == 0:
                    patch = pltpu.roll(band[:16], sx, axis=1)[:sup, :16]
                else:
                    scratch_ref[:, 0:w2] = band[:16, :]
                    patch = pltpu.roll(
                        scratch_ref[:, 0:wp_pad], sx, axis=1
                    )[:sup, :16]
                valid = (iu >= -by) & (iu < h2 - by) & \
                        (iv >= -bx) & (iv < w2 - bx)
                sup_ref[q, :, :] = jnp.where(valid, patch, 0.0)
            if mode == "extract":
                out_ref[:, lvl * cht : (lvl + 1) * cht] = (
                    jnp.zeros((tq, cht), jnp.float32) + sup_ref[0, 0, 0]
                ).astype(out_ref.dtype)
                continue
            acc = jax.lax.dot_general(
                sup_ref[:, 0, :], s_ref[0], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision,
            )
            for u in range(1, sup):
                acc += jax.lax.dot_general(
                    sup_ref[:, u, :], s_ref[u], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=precision,
                )
            cl = cvec * scale
            frac = cl - jnp.floor(cl)
            fx = frac[:, 0:1]
            fy = frac[:, 1:2]
            out = (
                ((1.0 - fy) * (1.0 - fx)) * acc[:, 0 * cht : 1 * cht]
                + ((1.0 - fy) * fx) * acc[:, 1 * cht : 2 * cht]
                + (fy * (1.0 - fx)) * acc[:, 2 * cht : 3 * cht]
                + (fy * fx) * acc[:, 3 * cht : 4 * cht]
            )
            out_ref[:, lvl * cht : (lvl + 1) * cht] = out.astype(out_ref.dtype)

    return kernel


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
        "nothing", "extract", "full"]

    pyr = build_padded_pyramid(f1, f2, 4, 4, out_dtype=jnp.bfloat16)
    orig = cp._plane_kernel
    for name in names:
        cp._plane_kernel = orig if name == "full" else make_kernel(name)
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
            per = med / reps
            print(f"{name:10s}: {per * 1e3:7.3f} ms/lookup-all-levels "
                  f"(compile {compile_s:.1f}s, v={v:.4f})", flush=True)
        except Exception as e:
            print(f"{name:10s}: FAILED {type(e).__name__}: {e}", flush=True)
        finally:
            cp._plane_kernel = orig


if __name__ == "__main__":
    main()
