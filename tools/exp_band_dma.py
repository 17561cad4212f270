"""Probe: per-query BAND-only manual DMA for the level-0 plane group.

The plane lookup is DMA-bound (tools/exp_plane_ablate.py: full 0.775 ms vs
plane-block DMA floor 0.724 ms after the SMEM-fed index rework) and the
whole-plane tile DMA fetches hp rows per query when the window needs only a
16-row band: at 448x1024 the level-0 group is [7168, hp0, 128] and banding it
cuts that group's bytes by hp0/16 (the packed levels-1..3 group stays
resident: its hp_g is smaller than 3 members' worth of full-width bands).

Variants (all production layout, production index planes):
  full       : production resident kernel (baseline)
  band_floor : g0 banded via per-query make_async_copy, const store (DMA +
               issue-overhead floor for the banded scheme)
  band_full  : g0 banded, full extraction+combine body (g0 reads from the
               band scratch; packed group resident as in production)

  PYTHONPATH=/root/repo:/root/.axon_site python -u tools/exp_band_dma.py
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
from flow_supervisor_tpu.kernels.corr_fused import _combine_matrix
from flow_supervisor_tpu.kernels.corr_lookup_v2 import BAND, _pick_tq, _round_up

LANES = cp.LANES


def banded_lookup(pyr, coords, k, dy_major=True, floor_only=False,
                  interpret=False):
    """corr_plane._lookup_impl twin with the level-0 group banded."""
    groups, level_meta, radius = pyr.groups, pyr.level_meta, pyr.radius
    out_dtype = jnp.float32
    b, h1, w1, _ = coords.shape
    bq = b * h1 * w1
    cht = k * k
    sup = 2 * radius + 2
    nl = len(level_meta)
    bqp = groups[0].shape[0]
    tq = _pick_tq(bqp, 128)
    qt = bqp // tq
    cq = coords.reshape(bq, 2).astype(jnp.float32)
    if bqp != bq:
        cq = jnp.pad(cq, ((0, bqp - bq), (0, 0)))
    plans = tuple((g.shape[1], g.shape[2]) for g in groups)
    s_mat = jnp.asarray(_combine_matrix(sup, radius, cht, 0, dy_major))

    cx0 = coords[..., 0].reshape(bq).astype(jnp.float32)
    cy0 = coords[..., 1].reshape(bq).astype(jnp.float32)
    if bqp != bq:
        cx0 = jnp.pad(cx0, (0, bqp - bq))
        cy0 = jnp.pad(cy0, (0, bqp - bq))
    ix = cp._index_planes(cx0, cy0, level_meta, plans, radius, sup)
    ixr = _round_up(5 * nl, 8)
    ix = jnp.pad(ix, ((0, ixr - 5 * nl), (0, 0)))
    ix = ix.reshape(ixr, qt, tq).swapaxes(0, 1).reshape(qt * ixr, tq)

    # band only single-member groups taller than 2*BAND (worth it)
    banded = tuple(
        g for g in range(len(plans))
        if plans[g][0] > 2 * BAND
        and sum(1 for (gg, *_rest) in level_meta if gg == g) == 1
    )
    assert banded, plans

    def kernel(ix_ref, cv_ref, *rest):
        ng = len(plans)
        group_refs = rest[:ng]
        s_ref = rest[ng]
        out_ref = rest[ng + 1]
        scratch_ref = rest[ng + 2]
        sup_ref = rest[ng + 3]
        band_scrs = {g: rest[ng + 4 + i] for i, g in enumerate(banded)}
        sems = {g: rest[ng + 4 + len(banded) + i] for i, g in enumerate(banded)}
        i = pl.program_id(0)

        # issue ALL band copies for this tile up front (overlapping)
        for gi, g in enumerate(banded):
            lvl = next(l for l, (gg, *_r) in enumerate(level_meta) if gg == g)
            base = 5 * lvl
            for q in range(tq):
                by8 = pl.multiple_of(ix_ref[base + 0, q], 8)
                pltpu.make_async_copy(
                    group_refs[g].at[i * tq + q, pl.ds(by8, BAND), :],
                    band_scrs[g].at[q],
                    sems[g].at[q],
                ).start()

        if floor_only:
            for g in banded:
                for q in range(tq):
                    pltpu.make_async_copy(
                        group_refs[g].at[0, pl.ds(0, BAND), :],
                        band_scrs[g].at[q],
                        sems[g].at[q],
                    ).wait()
            out_ref[:, :] = jnp.zeros(out_ref.shape, out_ref.dtype) + (
                cv_ref[0, 0].astype(out_ref.dtype)
            ) + band_scrs[banded[0]][0, 0, 0].astype(out_ref.dtype)
            return

        iu = jax.lax.broadcasted_iota(jnp.int32, (sup, 16), 0)
        iv = jax.lax.broadcasted_iota(jnp.int32, (sup, 16), 1)
        cvec = cv_ref[...].astype(jnp.float32)
        for lvl, (grp, off, h2, w2) in enumerate(level_meta):
            hp_g, wg = plans[grp]
            wp_pad = _round_up(w2, LANES)
            scale = 1.0 / (2.0 ** lvl)
            base = 5 * lvl
            for q in range(tq):
                sy = ix_ref[base + 1, q]
                sx = ix_ref[base + 2, q]
                by = ix_ref[base + 3, q]
                bx = ix_ref[base + 4, q]
                if grp in banded:
                    pltpu.make_async_copy(
                        group_refs[grp].at[0, pl.ds(0, BAND), :],
                        band_scrs[grp].at[q],
                        sems[grp].at[q],
                    ).wait()
                    band = band_scrs[grp][q].astype(jnp.float32)
                else:
                    by8 = pl.multiple_of(ix_ref[base + 0, q], 8)
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
                valid = (iu >= -by) & (iu < h2 - by) & (iv >= -bx) & (iv < w2 - bx)
                sup_ref[q, :, :] = jnp.where(valid, patch, 0.0)
            precision = None  # bf16 planes in this probe
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

    group_specs = []
    for g, garr in enumerate(groups):
        if g in banded:
            group_specs.append(pl.BlockSpec(memory_space=pltpu.ANY))
        else:
            group_specs.append(
                pl.BlockSpec(
                    (tq,) + garr.shape[1:], lambda i: (i, 0, 0),
                    memory_space=pltpu.VMEM,
                )
            )
    scratch_w = max(
        [
            _round_up(w2, LANES)
            for (_g, off, _h2, w2) in level_meta
            if w2 > LANES and w2 % LANES != 0
        ]
        or [LANES]
    )
    out = pl.pallas_call(
        kernel,
        grid=(qt,),
        in_specs=[
            pl.BlockSpec((ixr, tq), lambda i: (i, 0), memory_space=pltpu.SMEM),
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
        ] + [
            pltpu.VMEM((tq, BAND, plans[g][1]), groups[g].dtype)
            for g in banded
        ] + [
            pltpu.SemaphoreType.DMA((tq,)) for _ in banded
        ],
        interpret=interpret,
    )(ix, cq, *groups, s_mat)
    return out[:bq].reshape(b, h1, w1, nl * cht)


def main():
    import signal

    def _alarm(signum, frame):
        raise RuntimeError("relay watchdog")

    signal.signal(signal.SIGALRM, _alarm)
    signal.alarm(560)

    check = "--check" in sys.argv
    if check:
        jax.config.update("jax_platforms", "cpu")

    b, h1, w1, c = 1, 56, 128, 256
    reps = 8 if check else 96
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

    if check:
        ref = cp.corr_pyramid_lookup_plane(pyr, coords0, 4, dy_major=True)
        # interpret=True path for the probe kernel needs pallas interpret —
        # run via jit on CPU backend with interpret pallas? the probe kernel
        # has manual DMA which interpret mode emulates
        got = banded_lookup(pyr, coords0, 9, dy_major=True, interpret=True)
        err = float(jnp.abs(ref - got).max())
        print(f"banded vs production max|d| = {err:.2e}")
        assert err < 1e-5, err
        return

    variants = {
        # production with BAND_DMA forced OFF (resident baseline)
        "full": lambda p, cds: cp.corr_pyramid_lookup_plane(
            p, cds, 4, dy_major=True),
        "band_floor": functools.partial(banded_lookup, k=9, floor_only=True),
        # production path (BAND_DMA on)
        "band_full": lambda p, cds: cp.corr_pyramid_lookup_plane(
            p, cds, 4, dy_major=True),
    }
    names = [a for a in sys.argv[1:] if not a.startswith("--")] or list(variants)
    for name in names:
        fn = variants[name]
        cp.BAND_DMA = name != "full"
        try:
            @jax.jit
            def chain(pyr_, coords):
                def it(i, carry):
                    acc, cds = carry
                    out = (fn(pyr_, cds) if name == "full"
                           else fn(pyr_, cds))
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
            print(f"{name:10s}: {med / reps * 1e3:7.3f} ms/lookup-all-levels "
                  f"(compile {compile_s:.1f}s, v={v:.4f})", flush=True)
        except Exception as e:
            print(f"{name:10s}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
