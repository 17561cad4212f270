"""Decompose the fused-lookup extraction loop cost and prototype faster bodies.

The round-3 profile puts the per-query window extraction at ~78 ns/query x
344k query-extractions/fwd = ~27 ms of the 37 ms forward. This harness times
extraction VARIANTS on level-0 shapes (448x1024 -> plane [72,128] per query,
7168 queries) with the plane precomputed as a jit argument, isolating the
extraction+combine phase from the plane matmuls.

Variants:
  nothing   : constant store (grid + DMA floor)
  noop_q    : per-query aligned row-ds + store, no rolls/mask (ds+store floor)
  yonly     : ds + sublane roll (y canonicalization) only
  xonly     : ds + lane roll (x canonicalization) only
  full      : production body (ds + 2 rolls + mask + combine dots)
  nomask    : full minus the validity select
  nocombine : full extraction, skip the one-hot combine dots
  ysel8     : y fine-offset via 8-way static-slice select instead of the
              dynamic sublane roll; x roll as production
  gmxu      : per-query y (ds+roll+mask), then X-selection for 8 queries at a
              time as ONE one-hot MXU dot ([128, wp] gbuf x [wp, 128] E) with
              static-slice diagonal extraction; x-validity free (OOB columns
              match no one-hot row)

Protocol: jitted fori_loop chain (one lowering, reps executions), scalar
fetch, relay watchdog. One process at a time on the relay (docs/PERF.md).
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

from flow_supervisor_tpu.kernels.corr_fused import _combine_matrix, _TAPS
from flow_supervisor_tpu.kernels.corr_lookup_v2 import BAND, plane_height

SUP = 10
RADIUS = 4
CHT = 81


def _extract_full(idx_ref, plane_ref, sup_ref, q, h2, w2, mask=True):
    by8 = pl.multiple_of(idx_ref[q, 0], 8)
    sy = idx_ref[q, 1]
    sx = idx_ref[q, 2]
    by = idx_ref[q, 3]
    bx = idx_ref[q, 4]
    band = plane_ref[q, pl.ds(by8, BAND), :]
    band = pltpu.roll(band, sy, axis=0)
    patch = pltpu.roll(band[:16], sx, axis=1)[:SUP, :16]
    if mask:
        iu = jax.lax.broadcasted_iota(jnp.int32, (SUP, 16), 0)
        iv = jax.lax.broadcasted_iota(jnp.int32, (SUP, 16), 1)
        valid = (iu >= -by) & (iu < h2 - by) & (iv >= -bx) & (iv < w2 - bx)
        patch = jnp.where(valid, patch, 0.0)
    sup_ref[q, :, :] = patch


def _combine(sup_ref, frac_ref, s_ref, out_ref, tq):
    acc = jax.lax.dot_general(
        sup_ref[:, 0, :], s_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    for u in range(1, SUP):
        acc += jax.lax.dot_general(
            sup_ref[:, u, :], s_ref[u], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    fx = frac_ref[:, 0:1]
    fy = frac_ref[:, 1:2]
    out_ref[:, :] = (
        ((1.0 - fy) * (1.0 - fx)) * acc[:, 0 * CHT : 1 * CHT]
        + ((1.0 - fy) * fx) * acc[:, 1 * CHT : 2 * CHT]
        + (fy * (1.0 - fx)) * acc[:, 2 * CHT : 3 * CHT]
        + (fy * fx) * acc[:, 3 * CHT : 4 * CHT]
    )


def body_nothing(idx_ref, frac_ref, plane_ref, s_ref, out_ref, sup_ref,
                 gbuf_ref, *, tq, h2, w2, wp):
    out_ref[:, :] = jnp.zeros(out_ref.shape, jnp.float32) + frac_ref[0, 0]


def body_noop_q(idx_ref, frac_ref, plane_ref, s_ref, out_ref, sup_ref,
                gbuf_ref, *, tq, h2, w2, wp):
    for q in range(tq):
        by8 = pl.multiple_of(idx_ref[q, 0], 8)
        band = plane_ref[q, pl.ds(by8, 16), :]
        sup_ref[q, :, :] = band[:SUP, :16]
    _combine(sup_ref, frac_ref, s_ref, out_ref, tq)


def body_yonly(idx_ref, frac_ref, plane_ref, s_ref, out_ref, sup_ref,
               gbuf_ref, *, tq, h2, w2, wp):
    for q in range(tq):
        by8 = pl.multiple_of(idx_ref[q, 0], 8)
        sy = idx_ref[q, 1]
        band = plane_ref[q, pl.ds(by8, BAND), :]
        band = pltpu.roll(band, sy, axis=0)
        sup_ref[q, :, :] = band[:SUP, :16]
    _combine(sup_ref, frac_ref, s_ref, out_ref, tq)


def body_xonly(idx_ref, frac_ref, plane_ref, s_ref, out_ref, sup_ref,
               gbuf_ref, *, tq, h2, w2, wp):
    for q in range(tq):
        by8 = pl.multiple_of(idx_ref[q, 0], 8)
        sx = idx_ref[q, 2]
        band = plane_ref[q, pl.ds(by8, 16), :]
        patch = pltpu.roll(band, sx, axis=1)[:SUP, :16]
        sup_ref[q, :, :] = patch
    _combine(sup_ref, frac_ref, s_ref, out_ref, tq)


def body_full(idx_ref, frac_ref, plane_ref, s_ref, out_ref, sup_ref,
              gbuf_ref, *, tq, h2, w2, wp):
    for q in range(tq):
        _extract_full(idx_ref, plane_ref, sup_ref, q, h2, w2, mask=True)
    _combine(sup_ref, frac_ref, s_ref, out_ref, tq)


def body_nomask(idx_ref, frac_ref, plane_ref, s_ref, out_ref, sup_ref,
                gbuf_ref, *, tq, h2, w2, wp):
    for q in range(tq):
        _extract_full(idx_ref, plane_ref, sup_ref, q, h2, w2, mask=False)
    _combine(sup_ref, frac_ref, s_ref, out_ref, tq)


def body_nocombine(idx_ref, frac_ref, plane_ref, s_ref, out_ref, sup_ref,
                   gbuf_ref, *, tq, h2, w2, wp):
    for q in range(tq):
        _extract_full(idx_ref, plane_ref, sup_ref, q, h2, w2, mask=True)
    out_ref[:, :] = sup_ref[:, 0, :] + frac_ref[0, 0]


def body_ysel8(idx_ref, frac_ref, plane_ref, s_ref, out_ref, sup_ref,
               gbuf_ref, *, tq, h2, w2, wp):
    iu = jax.lax.broadcasted_iota(jnp.int32, (SUP, 16), 0)
    iv = jax.lax.broadcasted_iota(jnp.int32, (SUP, 16), 1)
    for q in range(tq):
        by8 = pl.multiple_of(idx_ref[q, 0], 8)
        fy = idx_ref[q, 1]  # here: by - by8 in 0..7 (direct fine offset)
        sx = idx_ref[q, 2]
        by = idx_ref[q, 3]
        bx = idx_ref[q, 4]
        band = plane_ref[q, pl.ds(by8, BAND), :]
        # 8-way static-slice select of rows fy..fy+15
        sel = band[0:16]
        for f in range(1, 8):
            sel = jnp.where(fy == f, band[f : f + 16], sel)
        patch = pltpu.roll(sel, sx, axis=1)[:SUP, :16]
        valid = (iu >= -by) & (iu < h2 - by) & (iv >= -bx) & (iv < w2 - bx)
        sup_ref[q, :, :] = jnp.where(valid, patch, 0.0)
    _combine(sup_ref, frac_ref, s_ref, out_ref, tq)


def body_gmxu(idx_ref, frac_ref, plane_ref, s_ref, out_ref, sup_ref,
              gbuf_ref, *, tq, h2, w2, wp):
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    jj = iota_l // 16  # group-member id per lane
    vv = iota_l - jj * 16  # window dx per lane
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (wp, 128), 0)
    iu16 = jax.lax.broadcasted_iota(jnp.int32, (16, wp), 0)
    for g0 in range(0, tq, 8):
        for j in range(8):
            q = g0 + j
            by8 = pl.multiple_of(idx_ref[q, 0], 8)
            sy = idx_ref[q, 1]
            by = idx_ref[q, 3]
            band = plane_ref[q, pl.ds(by8, BAND), :]
            band = pltpu.roll(band, sy, axis=0)[:16]
            # y-validity: rows u with by+u outside [0, h2) are wrapped garbage
            yok = (iu16 >= -by) & (iu16 < h2 - by)
            gbuf_ref[j * 16 : (j + 1) * 16, :] = jnp.where(yok, band, 0.0)
        # bxv[lane = j*16+v] = bx[g0+j] + v
        bxv = vv
        for j in range(8):
            bxv = jnp.where(jj == j, bxv + idx_ref[g0 + j, 4], bxv)
        # x-validity is FREE: negative bxv never matches iota_w, and columns
        # at/beyond w2 are masked out of the one-hot here
        e = jnp.where((iota_w == bxv) & (bxv < w2), 1.0, 0.0)  # [wp, 128]
        p = jax.lax.dot_general(
            gbuf_ref[:, :], e, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [(q,u)=128, (q',v)=128]
        for j in range(8):
            sup_ref[g0 + j, :, :] = p[
                j * 16 : j * 16 + SUP, j * 16 : j * 16 + 16
            ]
    _combine(sup_ref, frac_ref, s_ref, out_ref, tq)


BODIES = dict(
    nothing=body_nothing,
    noop_q=body_noop_q,
    yonly=body_yonly,
    xonly=body_xonly,
    full=body_full,
    nomask=body_nomask,
    nocombine=body_nocombine,
    ysel8=body_ysel8,
    gmxu=body_gmxu,
)


def run_variant(name, plane, idx, frac, s_mat, tq, h2, w2, reps):
    """plane is ONE resident [tq, hp, wp] tile (constant block index); only
    idx/frac/out blocks stream per grid step, so the timing deltas are the
    extraction issue cost, not plane DMA (which the production kernel does
    not pay — its plane lives in scratch)."""
    nq = idx.shape[0] // tq
    _, hp, wp = plane.shape
    body = functools.partial(BODIES[name], tq=tq, h2=h2, w2=w2, wp=wp)
    out_cols = 16 if name == "nocombine" else CHT

    def launch(plane, idx, frac):
        return pl.pallas_call(
            body,
            grid=(nq,),
            in_specs=[
                pl.BlockSpec((tq, 5), lambda i: (i, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((tq, 2), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tq, hp, wp), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((SUP, 16, 4 * CHT), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tq, out_cols), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((nq * tq, out_cols), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((tq, SUP, 16), jnp.float32),
                pltpu.VMEM((128, wp), jnp.float32),
            ],
        )(idx, frac, plane, s_mat)

    @jax.jit
    def chain(plane, idx, frac):
        def it(i, acc):
            out = launch(plane, idx, frac + acc * 1e-20)
            return acc + jnp.sum(out[:, :1]) * 1e-6

        return jax.lax.fori_loop(0, reps, it, jnp.float32(0))

    t0 = time.perf_counter()
    v = float(chain(plane, idx, frac))
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(4):
        t0 = time.perf_counter()
        float(chain(plane, idx, frac))
        times.append(time.perf_counter() - t0)
    med = sorted(times)[len(times) // 2]
    per_launch = med / reps
    ns_q = per_launch / idx.shape[0] * 1e9
    print(
        f"{name:10s}: {per_launch * 1e3:7.3f} ms/launch  {ns_q:6.1f} ns/query"
        f"  (compile {compile_s:.1f}s, v={v:.4f})",
        flush=True,
    )
    return per_launch


def _run_interpret(name, plane, idx, frac, s_mat, tq, h2, w2):
    bq, hp, wp = plane.shape
    body = functools.partial(BODIES[name], tq=tq, h2=h2, w2=w2, wp=wp)
    return pl.pallas_call(
        body,
        grid=(bq // tq,),
        in_specs=[
            pl.BlockSpec((tq, 5), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((tq, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tq, hp, wp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SUP, 16, 4 * CHT), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tq, CHT), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((bq, CHT), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((tq, SUP, 16), jnp.float32),
            pltpu.VMEM((128, wp), jnp.float32),
        ],
        interpret=True,
    )(idx, frac, plane, s_mat)


def check_correctness(plane, idx, idx_sel, frac, s_mat, tq, h2, w2):
    """Interpret-mode cross-check of the semantics-preserving variants."""
    ref = np.asarray(
        _run_interpret("full", plane, idx, frac, s_mat, tq, h2, w2))
    for name, iv in (("ysel8", idx_sel), ("gmxu", idx)):
        o = _run_interpret(name, plane, iv, frac, s_mat, tq, h2, w2)
        d = np.abs(np.asarray(o) - ref).max()
        print(f"  interpret {name} vs full: max|d| = {d:.2e}", flush=True)


def main():
    import signal

    def _alarm(signum, frame):
        raise RuntimeError("relay watchdog")

    signal.signal(signal.SIGALRM, _alarm)
    signal.alarm(int(sys.argv[sys.argv.index("--watchdog") + 1])
                 if "--watchdog" in sys.argv else 560)

    h2, w2 = 56, 128
    hp, wp = plane_height(h2), 128
    bq = h2 * w2
    tq = 64
    if "--check" in sys.argv:  # interpret mode is slow: shrink the problem
        bq = 2 * tq
    reps = int(sys.argv[sys.argv.index("--reps") + 1]) if "--reps" in sys.argv else 24
    rng = np.random.RandomState(0)
    plane = jnp.asarray(rng.randn(bq, hp, wp), jnp.float32)
    # realistic coords: centers anywhere in the plane incl. near edges
    by = rng.randint(-SUP + 1, h2 - 1, bq).astype(np.int32)
    bx = rng.randint(-SUP + 1, w2 - 1, bq).astype(np.int32)
    by8 = np.clip((by // 8) * 8, 0, hp - BAND)
    sy = np.mod(BAND - (by - by8), BAND)
    idx = jnp.asarray(np.stack([by8, sy, bx % 256 * 0 + np.mod(wp - bx, wp),
                                by, bx], -1))
    frac = jnp.asarray(rng.rand(bq, 2), jnp.float32)
    s_mat = jnp.asarray(_combine_matrix(SUP, RADIUS, CHT, 0, False))

    names = [a for a in sys.argv[1:] if not a.startswith("--") and
             not a.lstrip("-").isdigit()] or list(BODIES)

    # ysel8 uses idx[:,1] = fine offset fy in 0..7, not the roll amount
    a = np.asarray(idx).copy()
    a[:, 1] = by - by8
    idx_sel = jnp.asarray(a)

    if "--check" in sys.argv:
        check_correctness(plane, idx, idx_sel, frac, s_mat, tq, h2, w2)
        return

    for name in names:
        idx_v = idx_sel if name == "ysel8" else idx
        run_variant(name, plane[:tq], idx_v, frac, s_mat, tq, h2, w2, reps)


if __name__ == "__main__":
    main()
