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
lookup_vjp_dvols; coords grads are zero by the reference's own detach,
raft/__init__.py:155).
"""
from __future__ import annotations

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

__all__ = ["build_padded_pyramid", "corr_pyramid_lookup_plane"]


def _plane_kernel(
    cs_ref, cv_ref, *rest, tq, sup, cht, level_meta, radius, highest,
):
    """All levels of one query tile: per-query scalar index math + slice+roll
    extraction from each level's resident plane block, then the shared
    one-hot combine into the level's channel stripe and the vectorized
    bilinear lerp. level_meta: per level (h2, w2, hp, wp_pad)."""
    nl = len(level_meta)
    plane_refs = rest[:nl]
    s_ref = rest[nl]
    out_ref = rest[nl + 1]
    scratch_ref = rest[nl + 2]
    sup_ref = rest[nl + 3]
    iu = jax.lax.broadcasted_iota(jnp.int32, (sup, 16), 0)
    iv = jax.lax.broadcasted_iota(jnp.int32, (sup, 16), 1)
    cvec = cv_ref[...].astype(jnp.float32)  # [tq, 2]
    for lvl, (h2, w2, hp, wp_pad) in enumerate(level_meta):
        scale = 1.0 / (2.0 ** lvl)
        for q in range(tq):
            # scalar-unit index math (issued alongside the VPU extraction)
            cx = cs_ref[q, 0] * scale
            cy = cs_ref[q, 1] * scale
            # scalar floor via trunc-cast + fixup (int cast truncates toward
            # zero; coords may be negative)
            tx = cx.astype(jnp.int32)
            ty = cy.astype(jnp.int32)
            bx = tx - (cx < tx.astype(jnp.float32)).astype(jnp.int32) - radius
            by = ty - (cy < ty.astype(jnp.float32)).astype(jnp.int32) - radius
            by = jnp.clip(by, -sup, h2)
            bx = jnp.clip(bx, -sup, w2)
            # clip-before-div keeps the floordiv nonnegative (trunc == floor)
            by8 = pl.multiple_of(
                jnp.clip((jnp.maximum(by, 0) // 8) * 8, 0, hp - BAND), 8
            )
            # operands are nonnegative by construction: rem == mod
            sy = jax.lax.rem(BAND - (by - by8), BAND)
            sx = jax.lax.rem(wp_pad - bx, wp_pad)
            # dynamic rotates are 32-bit only: upcast bf16 bands in-register
            band = plane_refs[lvl][q, pl.ds(by8, BAND), :].astype(jnp.float32)
            band = pltpu.roll(band, sy, axis=0)  # window row 0 -> band row 0
            if w2 == wp_pad:
                # slice rows BEFORE the lane roll (corr_fused: the y-kept rows
                # are 0..sup-1, so the narrower [16, wp] roll suffices)
                patch = pltpu.roll(band[:16], sx, axis=1)[:sup, :16]
            else:
                # plane narrower than its lane pad: stage into the shared
                # scratch and roll over THIS level's wp_pad lanes (the roll
                # modulus must match the sx modulus; stale lanes are masked)
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


def _lookup_impl(planes, shapes, radius, coords, dy_major, out_dtype,
                 interpret=None):
    interpret = _auto_interpret(interpret)
    from flow_supervisor_tpu.kernels.corr_fused import _combine_matrix

    b, h1, w1, _ = coords.shape
    bq = b * h1 * w1
    k = 2 * radius + 1
    cht = k * k
    sup = 2 * radius + 2
    nl = len(planes)
    bqp = planes[0].shape[0]  # query axis padded to 128 by pad_plane
    assert bqp >= bq and bqp % 128 == 0, (bqp, bq)
    # interpret mode (CPU tests): the kernel body is retraced per op per
    # query — a small tile keeps the trace tractable; result is tq-invariant
    tq = _pick_tq(bqp, 8 if interpret else 128)
    qt = bqp // tq
    cq = coords.reshape(bq, 2).astype(jnp.float32)
    if bqp != bq:
        cq = jnp.pad(cq, ((0, bqp - bq), (0, 0)))

    level_meta = tuple(
        (h2, w2, plane.shape[1], _round_up(w2, 128))
        for plane, (h2, w2) in zip(planes, shapes)
    )
    s_mat = jnp.asarray(_combine_matrix(sup, radius, cht, 0, dy_major))

    kernel = functools.partial(
        _plane_kernel, tq=tq, sup=sup, cht=cht, level_meta=level_meta,
        radius=radius, highest=planes[0].dtype == jnp.float32,
    )
    plane_specs = [
        pl.BlockSpec(
            (tq,) + plane.shape[1:],
            lambda i, _t=tq: (i, 0, 0),
            memory_space=pltpu.VMEM,
        )
        for plane in planes
    ]
    out = pl.pallas_call(
        kernel,
        grid=(qt,),
        in_specs=[
            # the SAME coords tile twice: an SMEM view for per-query scalar
            # index math, a VMEM view for the vectorized bilinear fractions
            pl.BlockSpec((tq, 2), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((tq, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            *plane_specs,
            pl.BlockSpec((sup, 16, 4 * cht), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tq, nl * cht), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((bqp, nl * cht), out_dtype),
        scratch_shapes=[
            # lane-roll staging for sub-128-lane planes, sized for the widest
            # level (KITTI-class widths give w2 in (128, 256])
            pltpu.VMEM((16, max(m[3] for m in level_meta)), jnp.float32),
            pltpu.VMEM((tq, sup, 16), jnp.float32),
        ],
        interpret=interpret,
    )(cq, cq, *planes, s_mat)
    return out[:bq].reshape(b, h1, w1, nl * cht)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 4, 5))
def _lookup(planes, shapes, radius, coords, dy_major, out_dtype_name):
    return _lookup_impl(
        planes, shapes, radius, coords, dy_major, jnp.dtype(out_dtype_name)
    )


def _lookup_fwd(planes, shapes, radius, coords, dy_major, out_dtype_name):
    # residuals: coords + zero-size dtype tokens — nothing plane-sized is
    # kept alive, nothing of the forward re-runs (corr_lookup_v2 contract)
    dtype_tokens = tuple(jnp.zeros((0,), p.dtype) for p in planes)
    return (
        _lookup_impl(
            planes, shapes, radius, coords, dy_major, jnp.dtype(out_dtype_name)
        ),
        (coords, dtype_tokens),
    )


def _lookup_bwd(shapes, radius, dy_major, out_dtype_name, res, g):
    from flow_supervisor_tpu.kernels.corr_fused import lookup_vjp_dvols

    coords, dtype_tokens = res
    d_vols = lookup_vjp_dvols(g, coords, shapes, radius, dy_major)
    d_planes = []
    for (h2, w2), dv, tok in zip(shapes, d_vols, dtype_tokens):
        bq = dv.shape[0] * dv.shape[1]
        bqp = _round_up(bq, 128)  # mirror pad_plane's query-axis padding
        hp = plane_height(h2)
        d_planes.append(
            jnp.pad(
                dv.reshape(bq, h2, w2), ((0, bqp - bq), (0, hp - h2), (0, 0))
            ).astype(tok.dtype)
        )
    return d_planes, jnp.zeros_like(coords)


_lookup.defvjp(_lookup_fwd, _lookup_bwd)


def corr_pyramid_lookup_plane(
    pyramid: PaddedPyramid,
    coords: jax.Array,
    radius: int = 4,
    dy_major: bool = False,
    out_dtype: Any = jnp.float32,
) -> jax.Array:
    """Materialized-plane lookup with in-kernel combine + index math:
    [B, h1, w1, L*(2r+1)^2]."""
    assert radius == pyramid.radius, (radius, pyramid.radius)
    return _lookup(
        list(pyramid.planes),
        pyramid.shapes,
        radius,
        coords,
        dy_major,
        jnp.dtype(out_dtype).name,
    )
