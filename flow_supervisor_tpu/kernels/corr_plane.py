"""Pallas TPU kernel: correlation lookup from MATERIALIZED padded planes with
the in-kernel one-hot combine AND in-kernel index math.

Third lookup backend ("plane"), the inference speed path. The two existing
backends bracket a trade-off:

- corr_lookup_v2 ("pallas"): materializes the padded pyramid once per forward
  (the volume depends only on the fmaps — coords change per iteration, the
  volume does NOT), then per lookup DMAs each query's plane and extracts the
  window in-kernel — but emits [BQ, SUP, 16] support patches that an XLA-side
  bilinear combine must finish (layout-hostile minor-dim slices).
- corr_fused ("fused"): never materializes the volume; recomputes every plane
  tile with MXU dots at EVERY lookup — 12x the dot work per forward — and
  finishes with the one-hot combine inside the kernel.

This backend takes the cheap half of each: planes are built once per forward
(one big MXU matmul + pooling, exactly corr_lookup_v2.build_padded_pyramid),
and each lookup is ONE pallas call over all pyramid levels that extracts the
(2r+2)x(2r+2) support with the proven slice+roll scheme and reduces it to
window channels with the shared one-hot combine dots (corr_fused
._combine_matrix) — nothing leaves the kernel but the final [BQ, L*(2r+1)^2]
window block.

Lane packing: TPU arrays tile the minor dim to 128 lanes, so a level plane
stored at its natural width w2 < 128 (levels 1-3 at every recipe resolution)
physically transfers round_up(w2, 128) lanes per row — 2x/4x/8x its logical
bytes, and the plane-block DMA is the measured dominant lookup cost
(docs/PERF.md: 0.63 of 0.81 ms/lookup). ``build_packed_pyramid`` therefore
first-fit packs levels whose widths sum to <=128 side by side in ONE
128-lane group array ([BQp, hp_g, 128], hp_g = max member height); at
448x1024 levels 1+2+3 (64+32+16 lanes) share one group and total plane bytes
exactly halve. In-kernel the packing is free: the per-query lane roll that
brings window column 0 to lane 0 simply adds the member's static lane offset
to its shift (``sx = (128 - (off + bx)) mod 128``), and the existing tap
validity mask already zeroes reads that wrap into a neighbor level's lanes.
Levels wider than 128 lanes (KITTI-class level 0) keep their own unpacked
group and the staged-scratch roll path.

The kernel's ONLY per-iteration input besides the planes is the raw coords
array, fed twice (an SMEM view for per-query scalar index math, a VMEM view
for the vectorized bilinear fractions). Moving the index math in-kernel was
measured at -1.7 ms/fwd at 448x1024x12 (interleaved A/B vs the XLA-prologue
revision, 32.9 vs 34.6 ms/fwd — tools/exp_plane_idx_ab.py): the XLA-side
floor/clip/mod/stack ops ran on [BQ, 2]/[BQ, 5] tensors whose 2-5-wide minor
dims waste 96% of each vector register; in-kernel the same math is ~15
scalar-unit ops per query, issued alongside the VPU extraction. (An earlier
"staticidx saves 13 ms" ablation was an artifact: constant indices make all
12 lookups iteration-invariant, so XLA hoisted 11 of them out of the
refinement loop.)

Reference parity: same lookup semantics as raft/allfield.py:109-135
(smurf_corr_block — per level (2r+1)^2 bilinear window, zero OOB) and the
same materialize-once volume life-cycle as the reference's TF backend
(raft/allfield.py:62-106); the alt_cuda_corr-style volume-free path stays
available as "fused" for memory-bound shapes (training batches, >1080p).

Gradient: identical closed-form VJP as corr_lookup_v2 (d_planes via
lookup_vjp_dvols, reassembled into the packed-group layout; coords grads are
zero by the reference's own detach, raft/__init__.py:155).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flow_supervisor_tpu.kernels.corr_lookup_v2 import (
    BAND,
    PaddedPyramid,
    _auto_interpret,
    _pick_tq,
    _round_up,
    build_padded_pyramid,
    plane_height,
)

__all__ = [
    "build_padded_pyramid",
    "build_packed_pyramid",
    "PackedPyramid",
    "corr_pyramid_lookup_plane",
]

LANES = 128

# Per-query BAND-only manual DMA for groups holding a single level taller
# than 2*BAND (level 0 at every recipe resolution): the group stays in HBM
# (memory_space=ANY) and the kernel async-copies only the 16-row band each
# query actually reads, instead of BlockSpec-DMAing the whole hp-row plane
# per query — a 3.5x byte cut on level 0 at 448x1024.
#
# MEASURED AND REJECTED (round 4, tools/exp_band_dma.py on TPU): 1.463 vs
# 0.758 ms/all-levels-lookup — per-query async-copy ISSUE overhead (~0.14 us
# x 7168 copies/lookup) is ~2x the whole-plane DMA bytes it saves; the
# BlockSpec pipeline's few large per-tile block copies win. Kept as a probed
# escape hatch: flips on per-query banding for single-member groups, bit-
# exact vs the oracle (tests run the production value of this flag).
BAND_DMA = False


def _banded_groups(plans, level_meta):
    """Groups worth banding: single member, taller than 2*BAND."""
    if not BAND_DMA:
        return ()
    return tuple(
        g for g in range(len(plans))
        if plans[g][0] > 2 * BAND
        and sum(1 for (gg, *_r) in level_meta if gg == g) == 1
    )


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class PackedPyramid:
    """Correlation pyramid as lane-packed per-query plane groups.

    groups[g]: [BQp, hp_g, wg]; level_meta[l] = (grp, lane_off, h2, w2)
    locates level l's plane inside its group; radius sizes the layout.
    """

    groups: list[jax.Array]
    level_meta: tuple[tuple[int, int, int, int], ...]
    radius: int

    @property
    def shapes(self) -> tuple[tuple[int, int], ...]:
        return tuple((h2, w2) for (_g, _o, h2, w2) in self.level_meta)

    def tree_flatten(self):
        return list(self.groups), (self.level_meta, self.radius)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(list(children), aux[0], aux[1])


def _plan_groups(shapes):
    """First-fit lane packing: (level_meta, group_plan).

    level_meta[l] = (grp, lane_off, h2, w2); group_plan[g] = (hp_g, wg_store)
    with wg_store = LANES for packed groups (lane pad is explicit zeros so the
    in-kernel roll modulus equals the physical width) and the natural w2 for
    a single level wider than LANES (staged-scratch path, as before).
    """
    level_meta: list[tuple[int, int, int, int]] = []
    group_plan: list[list] = []  # [hp_g, used_lanes, wide?]
    for h2, w2 in shapes:
        hp = plane_height(h2)
        if w2 > LANES:
            group_plan.append([hp, w2, True])
            level_meta.append((len(group_plan) - 1, 0, h2, w2))
            continue
        for g, plan in enumerate(group_plan):
            if not plan[2] and plan[1] + w2 <= LANES:
                level_meta.append((g, plan[1], h2, w2))
                plan[0] = max(plan[0], hp)
                plan[1] += w2
                break
        else:
            group_plan.append([hp, w2, False])
            level_meta.append((len(group_plan) - 1, 0, h2, w2))
    plans = tuple(
        (hp, used if wide else LANES) for hp, used, wide in group_plan
    )
    return tuple(level_meta), plans


def _assemble_groups(d_vols, level_meta, plans, bqp):
    """Pad each level's [BQ, h2, w2] plane to its group height and lane-concat
    group members (shared by the forward build and the VJP)."""
    members: list[list] = [[] for _ in plans]
    for (g, _off, h2, w2), dv in zip(level_meta, d_vols):
        bq = dv.shape[0]
        hp_g = plans[g][0]
        members[g].append(
            jnp.pad(dv, ((0, bqp - bq), (0, hp_g - h2), (0, 0)))
        )
    groups = []
    for (hp_g, wg), mem in zip(plans, members):
        garr = mem[0] if len(mem) == 1 else jnp.concatenate(mem, axis=-1)
        if garr.shape[-1] < wg:
            garr = jnp.pad(garr, ((0, 0), (0, 0), (0, wg - garr.shape[-1])))
        groups.append(garr)
    return groups


def build_packed_pyramid(
    fmap1: jax.Array,
    fmap2: jax.Array,
    num_levels: int = 4,
    radius: int = 4,
    out_dtype: Any = jnp.float32,
) -> PackedPyramid:
    """Pyramid via the pooled-fmap identity, lane-packed and padded once."""
    from flow_supervisor_tpu.ops.corr import build_corr_pyramid_from_fmaps

    vols = build_corr_pyramid_from_fmaps(fmap1, fmap2, num_levels, out_dtype)
    shapes = tuple(v.shape[3:5] for v in vols)
    level_meta, plans = _plan_groups(shapes)
    b, h1, w1 = vols[0].shape[:3]
    bqp = _round_up(b * h1 * w1, 128)
    flat = [v.reshape(b * h1 * w1, *v.shape[3:5]) for v in vols]
    # Barrier: materialize each packed group exactly once. Without it XLA is
    # free to fuse the pad/concat into every per-iteration consumer,
    # recomputing it 12x per forward.
    groups = jax.lax.optimization_barrier(
        tuple(_assemble_groups(flat, level_meta, plans, bqp))
    )
    return PackedPyramid(list(groups), level_meta, radius)


def pack_padded(pyr: PaddedPyramid) -> PackedPyramid:
    """Re-layout a per-level PaddedPyramid into packed groups (compat path
    for callers/tests that built via corr_lookup_v2.build_padded_pyramid;
    production forwards should build packed directly)."""
    level_meta, plans = _plan_groups(pyr.shapes)
    bqp = pyr.planes[0].shape[0]
    flat = [
        p[:, :h2, :] for p, (h2, _w2) in zip(pyr.planes, pyr.shapes)
    ]
    return PackedPyramid(
        _assemble_groups(flat, level_meta, plans, bqp), level_meta, pyr.radius
    )


def _index_planes(cx0, cy0, level_meta, plans, radius, sup):
    """XLA-side per-query index math as FIVE [BQp] vector planes per level,
    stacked MAJOR-axis-first into one [5*nl, BQp] int32 array.

    Round-4 kernel ablation (tools/exp_plane_ablate.py): post lane-packing,
    the per-query SCALAR-UNIT index math inside the kernel costs ~0.7 ms of a
    1.55 ms all-levels lookup — more than extraction+combine together. The
    round-3 measurement that moved the math in-kernel (-1.7 ms/fwd,
    tools/exp_plane_idx_ab.py) was against a [BQ, 5]-stacked XLA prologue
    whose 5-wide minor dim wasted 96% of every vector register; these
    [BQp]-per-plane ops are full-lane 1-D, and the stack axis is MAJOR, so the
    prologue is ~free and the kernel's scalar core only issues SMEM reads."""
    rows = []
    for lvl, (grp, off, h2, w2) in enumerate(level_meta):
        hp_g, wg = plans[grp]
        wp_pad = _round_up(w2, LANES)
        scale = 1.0 / (2.0 ** lvl)
        cx = cx0 * scale
        cy = cy0 * scale
        bx = jnp.floor(cx).astype(jnp.int32) - radius
        by = jnp.floor(cy).astype(jnp.int32) - radius
        by = jnp.clip(by, -sup, h2)
        bx = jnp.clip(bx, -sup, w2)
        # clip-before-div keeps the floordiv nonnegative (trunc == floor);
        # the clamp to hp_g - BAND is exact: wrapped rows land at plane
        # rows >= hp_g >= h2 and are masked (see plane_height)
        by8 = jnp.clip((jnp.maximum(by, 0) // 8) * 8, 0, hp_g - BAND)
        # operands are nonnegative by construction: rem == mod
        sy = jax.lax.rem(BAND - (by - by8), BAND)
        if wg % LANES == 0:
            # packed group: the stored width IS the roll modulus (explicit
            # zero lane-pad); the member's static lane offset folds into the
            # shift. off + bx <= off + w2 <= wg keeps the operand nonneg.
            sx = jax.lax.rem(wg - (off + bx), wg)
        else:
            sx = jax.lax.rem(wp_pad - bx, wp_pad)
        rows += [by8, sy, sx, by, bx]
    return jnp.stack(rows, axis=0).astype(jnp.int32)


def _plane_kernel(
    ix_ref, cv_ref, *rest, tq, sup, cht, level_meta, plans, banded, radius,
    highest,
):
    """All levels of one query tile: SMEM-fed per-query indices + slice+roll
    extraction from the level's resident group block (or from the per-query
    band scratch for BAND_DMA groups), then the shared one-hot combine into
    the level's channel stripe and the vectorized bilinear lerp.
    ix_ref: [5*nl, tq] SMEM int32 from ``_index_planes`` (by8, sy, sx, by, bx
    per level); level_meta: per level (grp, lane_off, h2, w2); plans: per
    group (hp_g, wg_store); banded: group ids DMA'd band-wise (see BAND_DMA)."""
    ng = len(plans)
    group_refs = rest[:ng]
    s_ref = rest[ng]
    out_ref = rest[ng + 1]
    scratch_ref = rest[ng + 2]
    sup_ref = rest[ng + 3]
    band_scrs = {g: rest[ng + 4 + i] for i, g in enumerate(banded)}
    band_sems = {g: rest[ng + 4 + len(banded) + i] for i, g in enumerate(banded)}

    def band_copy(g, lvl, q):
        # wait() rebuilds the same-shaped descriptor; only shape + semaphore
        # matter for the wait
        by8 = pl.multiple_of(ix_ref[5 * lvl + 0, q], 8)
        return pltpu.make_async_copy(
            group_refs[g].at[pl.program_id(0) * tq + q, pl.ds(by8, BAND), :],
            band_scrs[g].at[q],
            band_sems[g].at[q],
        )

    # issue every band copy for this tile up front so the transfers overlap
    # each other and the resident-group extraction below
    for g in banded:
        lvl_g = next(l for l, (gg, *_r) in enumerate(level_meta) if gg == g)
        for q in range(tq):
            band_copy(g, lvl_g, q).start()

    iu = jax.lax.broadcasted_iota(jnp.int32, (sup, 16), 0)
    iv = jax.lax.broadcasted_iota(jnp.int32, (sup, 16), 1)
    cvec = cv_ref[...].astype(jnp.float32)  # [tq, 2]
    # banded levels LAST: their waits then overlap the resident extraction
    # (out stripes are level-indexed, so processing order is free)
    order = sorted(
        range(len(level_meta)), key=lambda l: level_meta[l][0] in band_scrs
    )
    for lvl in order:
        grp, off, h2, w2 = level_meta[lvl]
        hp_g, wg = plans[grp]
        wp_pad = _round_up(w2, LANES)
        scale = 1.0 / (2.0 ** lvl)
        base = 5 * lvl
        for q in range(tq):
            sy = ix_ref[base + 1, q]
            sx = ix_ref[base + 2, q]
            by = ix_ref[base + 3, q]
            bx = ix_ref[base + 4, q]
            # dynamic rotates are 32-bit only: upcast bf16 bands in-register
            if grp in band_scrs:
                band_copy(grp, lvl, q).wait()
                band = band_scrs[grp][q].astype(jnp.float32)
            else:
                by8 = pl.multiple_of(ix_ref[base + 0, q], 8)
                band = group_refs[grp][q, pl.ds(by8, BAND), :].astype(
                    jnp.float32)
            band = pltpu.roll(band, sy, axis=0)  # window row 0 -> band row 0
            if wg % LANES == 0:
                # slice rows BEFORE the per-query lane roll (corr_fused: the
                # y-kept rows are 0..sup-1, so the narrower roll suffices)
                patch = pltpu.roll(band[:16], sx, axis=1)[:sup, :16]
            else:
                # single wide level narrower than its lane pad (KITTI-class
                # w2 in (128, 256]): stage into the shared scratch and roll
                # over wp_pad lanes (the roll modulus must match the sx
                # modulus; stale lanes are masked)
                scratch_ref[:, 0:w2] = band[:16, :]
                patch = pltpu.roll(
                    scratch_ref[:, 0:wp_pad], sx, axis=1
                )[:sup, :16]
            valid = (iu >= -by) & (iu < h2 - by) & (iv >= -bx) & (iv < w2 - bx)
            # where (not multiply): wrapped/stale values may be anything
            sup_ref[q, :, :] = jnp.where(valid, patch, 0.0)
        # one-hot selection dots: with f32 planes the MXU's default bf16
        # input truncation costs ~4e-3 relative — force HIGHEST there
        # (bf16 planes are already coarser than the truncation)
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


def _lookup_impl(groups, level_meta, radius, coords, dy_major, out_dtype,
                 interpret=None):
    interpret = _auto_interpret(interpret)
    from flow_supervisor_tpu.kernels.corr_fused import _combine_matrix

    b, h1, w1, _ = coords.shape
    bq = b * h1 * w1
    k = 2 * radius + 1
    cht = k * k
    sup = 2 * radius + 2
    nl = len(level_meta)
    bqp = groups[0].shape[0]  # query axis padded to 128 at build
    assert bqp >= bq and bqp % 128 == 0, (bqp, bq)
    # interpret mode (CPU tests): the kernel body is retraced per op per
    # query — a small tile keeps the trace tractable; result is tq-invariant
    tq = _pick_tq(bqp, 8 if interpret else 128)
    qt = bqp // tq
    cq = coords.reshape(bq, 2).astype(jnp.float32)
    if bqp != bq:
        cq = jnp.pad(cq, ((0, bqp - bq), (0, 0)))

    plans = tuple((g.shape[1], g.shape[2]) for g in groups)
    s_mat = jnp.asarray(_combine_matrix(sup, radius, cht, 0, dy_major))

    # per-query indices as [5*nl, BQp] vector planes (1-D full-lane math;
    # sliced from the 4-D coords BEFORE the [BQ, 2] reshape so no 2-wide
    # minor-dim op ever materializes — see _index_planes docstring)
    cx0 = coords[..., 0].reshape(bq).astype(jnp.float32)
    cy0 = coords[..., 1].reshape(bq).astype(jnp.float32)
    if bqp != bq:
        cx0 = jnp.pad(cx0, (0, bqp - bq))
        cy0 = jnp.pad(cy0, (0, bqp - bq))
    ix = _index_planes(cx0, cy0, level_meta, plans, radius, sup)
    # tile-major interleave: [5*nl, BQp] -> [qt*ixr, tq] so the SMEM block
    # windows the MAJOR axis. Mosaic cannot window an SMEM operand along the
    # minor dim — a (5*nl, tq) block at (0, i) silently promotes the whole
    # array into double-buffered scoped VMEM (measured: fused merged kernel
    # blew the 16M scoped limit by exactly 2x the array bytes on TPU) —
    # and the block's sublane dim must be 8-divisible, hence the row pad.
    ixr = _round_up(5 * nl, 8)
    ix = jnp.pad(ix, ((0, ixr - 5 * nl), (0, 0)))
    ix = ix.reshape(ixr, qt, tq).swapaxes(0, 1).reshape(qt * ixr, tq)

    banded = _banded_groups(plans, level_meta)
    kernel = functools.partial(
        _plane_kernel, tq=tq, sup=sup, cht=cht, level_meta=level_meta,
        plans=plans, banded=banded, radius=radius,
        highest=groups[0].dtype == jnp.float32,
    )
    group_specs = [
        pl.BlockSpec(memory_space=pltpu.ANY)
        if g in banded
        else pl.BlockSpec(
            (tq,) + garr.shape[1:],
            lambda i, _t=tq: (i, 0, 0),
            memory_space=pltpu.VMEM,
        )
        for g, garr in enumerate(groups)
    ]
    # lane-roll staging only for single wide levels (w2 in (LANES, pad))
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
            # SMEM index planes (all levels' by8/sy/sx/by/bx for this tile)
            # + a VMEM coords view for the vectorized bilinear fractions
            pl.BlockSpec((ixr, tq), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((tq, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            *group_specs,
            pl.BlockSpec((sup, 16, 4 * cht), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tq, nl * cht), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((bqp, nl * cht), out_dtype),
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


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 4, 5))
def _lookup(groups, level_meta, radius, coords, dy_major, out_dtype_name):
    return _lookup_impl(
        groups, level_meta, radius, coords, dy_major, jnp.dtype(out_dtype_name)
    )


def _lookup_fwd(groups, level_meta, radius, coords, dy_major, out_dtype_name):
    # residuals: coords + zero-size tokens carrying each PRIMAL group's
    # (hp_g, wg) layout and dtype — nothing plane-sized is kept alive,
    # nothing of the forward re-runs (corr_lookup_v2 contract), and the
    # backward reassembles cotangents into the layout the primal groups were
    # actually built with (not a re-derived plan that could drift)
    dtype_tokens = tuple(jnp.zeros((0,) + g.shape[1:], g.dtype) for g in groups)
    return (
        _lookup_impl(
            groups, level_meta, radius, coords, dy_major,
            jnp.dtype(out_dtype_name),
        ),
        (coords, dtype_tokens),
    )


def _lookup_bwd(level_meta, radius, dy_major, out_dtype_name, res, g):
    from flow_supervisor_tpu.kernels.corr_fused import lookup_vjp_dvols

    coords, dtype_tokens = res
    shapes = tuple((h2, w2) for (_g, _o, h2, w2) in level_meta)
    plans = tuple(tok.shape[1:3] for tok in dtype_tokens)
    d_vols = lookup_vjp_dvols(g, coords, shapes, radius, dy_major)
    bq = d_vols[0].shape[0] * d_vols[0].shape[1]
    bqp = _round_up(bq, 128)
    flat = [dv.reshape(bq, h2, w2) for dv, (h2, w2) in zip(d_vols, shapes)]
    d_groups = [
        dg.astype(tok.dtype)
        for dg, tok in zip(
            _assemble_groups(flat, level_meta, plans, bqp), dtype_tokens
        )
    ]
    return d_groups, jnp.zeros_like(coords)


_lookup.defvjp(_lookup_fwd, _lookup_bwd)


def corr_pyramid_lookup_plane(
    pyramid: PackedPyramid | PaddedPyramid,
    coords: jax.Array,
    radius: int = 4,
    dy_major: bool = False,
    out_dtype: Any = jnp.float32,
) -> jax.Array:
    """Lane-packed plane lookup with in-kernel combine + index math:
    [B, h1, w1, L*(2r+1)^2]. A per-level PaddedPyramid is re-packed per call
    (compat/test path — production builds packed once per forward)."""
    if isinstance(pyramid, PaddedPyramid):
        packed = pack_padded(pyramid)
        # barrier so a jitted refinement loop materializes the repack once
        # per pyramid instead of fusing the pad/concat into every lookup
        groups = jax.lax.optimization_barrier(tuple(packed.groups))
        pyramid = PackedPyramid(list(groups), packed.level_meta, packed.radius)
    assert radius == pyramid.radius, (radius, pyramid.radius)
    return _lookup(
        list(pyramid.groups),
        pyramid.level_meta,
        radius,
        coords,
        dy_major,
        jnp.dtype(out_dtype).name,
    )
