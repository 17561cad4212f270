"""Interleaved A/B: in-kernel per-query scalar index math (round-3 revision)
vs XLA vector-plane index prologue + SMEM-fed kernel (round 4).

Round-4 ablation found the kernel's scalar-unit index math costs ~0.7 ms of a
1.55 ms all-levels lookup (tools/exp_plane_ablate.py). The round-3 A/B that
justified in-kernel math (exp_plane_idx_ab.py, -1.7 ms/fwd) compared against
a [BQ, 5]-minor-dim XLA prologue; the new prologue builds [5*nl, BQp]
MAJOR-stacked planes (full-lane 1-D ops). Variant "old" reconstructs the
round-3 kernel inline; "new" is the production path.

  PYTHONPATH=/root/repo:/root/.axon_site python -u tools/exp_plane_idx_ab2.py
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


def _old_plane_kernel(
    cs_ref, cv_ref, *rest, tq, sup, cht, level_meta, plans, radius, highest,
):
    """Round-3 kernel body: scalar-unit index math per query."""
    ng = len(plans)
    group_refs = rest[:ng]
    s_ref = rest[ng]
    out_ref = rest[ng + 1]
    scratch_ref = rest[ng + 2]
    sup_ref = rest[ng + 3]
    LANES = cp.LANES
    iu = jax.lax.broadcasted_iota(jnp.int32, (sup, 16), 0)
    iv = jax.lax.broadcasted_iota(jnp.int32, (sup, 16), 1)
    cvec = cv_ref[...].astype(jnp.float32)
    for lvl, (grp, off, h2, w2) in enumerate(level_meta):
        hp_g, wg = plans[grp]
        wp_pad = cp._round_up(w2, LANES)
        scale = 1.0 / (2.0 ** lvl)
        for q in range(tq):
            cx = cs_ref[q, 0] * scale
            cy = cs_ref[q, 1] * scale
            tx = cx.astype(jnp.int32)
            ty = cy.astype(jnp.int32)
            bx = tx - (cx < tx.astype(jnp.float32)).astype(jnp.int32) - radius
            by = ty - (cy < ty.astype(jnp.float32)).astype(jnp.int32) - radius
            by = jnp.clip(by, -sup, h2)
            bx = jnp.clip(bx, -sup, w2)
            by8 = pl.multiple_of(
                jnp.clip((jnp.maximum(by, 0) // 8) * 8, 0, hp_g - BAND), 8
            )
            sy = jax.lax.rem(BAND - (by - by8), BAND)
            band = group_refs[grp][q, pl.ds(by8, BAND), :].astype(jnp.float32)
            band = pltpu.roll(band, sy, axis=0)
            if wg % LANES == 0:
                sx = jax.lax.rem(wg - (off + bx), wg)
                patch = pltpu.roll(band[:16], sx, axis=1)[:sup, :16]
            else:
                sx = jax.lax.rem(wp_pad - bx, wp_pad)
                scratch_ref[:, 0:w2] = band[:16, :]
                patch = pltpu.roll(
                    scratch_ref[:, 0:wp_pad], sx, axis=1
                )[:sup, :16]
            valid = (iu >= -by) & (iu < h2 - by) & (iv >= -bx) & (iv < w2 - bx)
            sup_ref[q, :, :] = jnp.where(valid, patch, 0.0)
        precision = jax.lax.Precision.HIGHEST if highest else None
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


def _old_lookup(pyr, coords, radius=4, dy_major=True):
    """Round-3 _lookup_impl: coords fed twice (SMEM + VMEM views)."""
    from flow_supervisor_tpu.kernels.corr_fused import _combine_matrix

    groups, level_meta = list(pyr.groups), pyr.level_meta
    b, h1, w1, _ = coords.shape
    bq = b * h1 * w1
    k = 2 * radius + 1
    cht = k * k
    sup = 2 * radius + 2
    nl = len(level_meta)
    bqp = groups[0].shape[0]
    tq = cp._pick_tq(bqp, 128)
    qt = bqp // tq
    cq = coords.reshape(bq, 2).astype(jnp.float32)
    if bqp != bq:
        cq = jnp.pad(cq, ((0, bqp - bq), (0, 0)))
    plans = tuple((g.shape[1], g.shape[2]) for g in groups)
    s_mat = jnp.asarray(_combine_matrix(sup, radius, cht, 0, dy_major))
    kernel = functools.partial(
        _old_plane_kernel, tq=tq, sup=sup, cht=cht, level_meta=level_meta,
        plans=plans, radius=radius, highest=groups[0].dtype == jnp.float32,
    )
    group_specs = [
        pl.BlockSpec((tq,) + g.shape[1:], lambda i, _t=tq: (i, 0, 0),
                     memory_space=pltpu.VMEM)
        for g in groups
    ]
    scratch_w = max(
        [cp._round_up(w2, cp.LANES) for (_g, off, _h2, w2) in level_meta
         if w2 > cp.LANES and w2 % cp.LANES != 0] or [cp.LANES]
    )
    out = pl.pallas_call(
        kernel,
        grid=(qt,),
        in_specs=[
            pl.BlockSpec((tq, 2), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((tq, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            *group_specs,
            pl.BlockSpec((sup, 16, 4 * cht), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tq, nl * cht), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((bqp, nl * cht), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((16, scratch_w), jnp.float32),
            pltpu.VMEM((tq, sup, 16), jnp.float32),
        ],
    )(cq, cq, *groups, s_mat)
    return out[:bq].reshape(b, h1, w1, nl * cht)


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
        jnp.meshgrid(jnp.arange(w1, dtype=jnp.float32),
                     jnp.arange(h1, dtype=jnp.float32), indexing="xy"),
        axis=-1,
    )[None]
    pyr = cp.pack_padded(build_padded_pyramid(f1, f2, 4, 4,
                                              out_dtype=jnp.bfloat16))

    def make_chain(fn):
        @jax.jit
        def chain(groups, coords):
            p = cp.PackedPyramid(list(groups), pyr.level_meta, pyr.radius)

            def it(i, carry):
                acc, cds = carry
                out = fn(p, cds)
                d = jnp.mean(out, axis=-1, keepdims=True) * 1e-6
                cds = cds + jnp.concatenate([d, -d], axis=-1)
                return (acc + jnp.mean(out), cds)

            acc, _ = jax.lax.fori_loop(0, reps, it, (jnp.float32(0), coords))
            return acc

        return chain

    new = make_chain(lambda p, c_: cp.corr_pyramid_lookup_plane(
        p, c_, 4, dy_major=True))
    old = make_chain(lambda p, c_: _old_lookup(p, c_, 4, dy_major=True))

    groups = tuple(pyr.groups)
    for name, fn in (("old", old), ("new", new)):  # warm both before timing
        t0 = time.perf_counter()
        v = float(fn(groups, coords0))
        print(f"{name}: compile {time.perf_counter() - t0:.1f}s v={v:.4f}",
              flush=True)
    res = {"old": [], "new": []}
    for r in range(4):  # interleave rounds (relay drift rule)
        for name, fn in (("old", old), ("new", new)):
            t0 = time.perf_counter()
            float(fn(groups, coords0))
            res[name].append((time.perf_counter() - t0) / reps * 1e3)
    for name, ts in res.items():
        med = sorted(ts)[len(ts) // 2]
        print(f"{name}: {med:.3f} ms/lookup (all rounds: "
              + " ".join(f"{t:.3f}" for t in ts) + ")", flush=True)


if __name__ == "__main__":
    main()
