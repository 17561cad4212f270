"""Pallas TPU kernel v2: fused correlation-pyramid window lookup.

TPU-native counterpart of the reference's ``alt_cuda_corr``
(pytorch/alt_cuda_corr/correlation_kernel.cu:19-119): for each query, extract
the (K+1)x(K+1) bilinear support patch from its (zero-padded) correlation
plane entirely in VMEM, with ZERO matmuls:

  1. an 8-aligned dynamic sublane slice pulls a 24-row band
     (``pl.multiple_of`` satisfies Mosaic's sublane-alignment proof),
  2. a dynamic sublane roll aligns the window's first row,
  3. a dynamic lane roll (on a 128-multiple-wide scratch copy) aligns the
     window's first column,
  4. the [SUP, 16] support corner is written out; the 4-tap bilinear combine
     runs outside in XLA where it fuses with the level concat.

This replaces round 1's per-query one-hot matmuls (kernels/corr_lookup.py),
which were MXU-latency-bound at M=10 per query. Planes are padded ONCE per
forward (``build_padded_pyramid``) — round 1 re-padded on every refinement
iteration.

OOB->0 semantics: planes carry a K+1 zero ring; window bases are clamped into
the padded plane so fully out-of-bounds windows land entirely inside the ring
(identical contract to ops/corr.py, which remains the correctness oracle; the
kernel is bit-exact against it on TPU).

Gradients: coords always arrive behind ``stop_gradient`` in RAFT (the
reference detaches coords before every lookup, raft/__init__.py:155), so the
custom VJP returns zero coordinate gradients; the plane gradient is the
transposed one-hot scatter computed by XLA via the oracle's autodiff.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BAND = 24  # rows fetched per query: 8-alignment slack (<=7) + SUP (10) <= 24


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _pick_tq(bq: int, preferred: int = 16) -> int:
    for tq in (preferred, 8, 4, 2, 1):
        if bq % tq == 0:
            return tq
    return 1


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class PaddedPyramid:
    """Correlation pyramid stored as zero-padded per-query planes.

    planes[l]: [BQ, Hp_l, Wp_l]; shapes[l] = (h2_l, w2_l) unpadded target dims;
    radius is the lookup radius the padding was sized for.
    """

    planes: list[jax.Array]
    shapes: tuple[tuple[int, int], ...]
    radius: int

    def tree_flatten(self):
        return list(self.planes), (self.shapes, self.radius)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(list(children), aux[0], aux[1])


def pad_plane(vol: jax.Array, radius: int) -> jax.Array:
    """[B, h1, w1, h2, w2] volume -> [BQ, Hp, Wp] zero-padded plane."""
    b, h1, w1, h2, w2 = vol.shape
    sup = 2 * radius + 2
    pad = sup
    bq = b * h1 * w1
    hp_data = h2 + 2 * pad
    max_base = h2 + 2 * pad - sup
    hp = max(_round_up((max_base // 8) * 8 + BAND, 8), hp_data)
    return jnp.pad(
        vol.reshape(bq, h2, w2), ((0, 0), (pad, hp - hp_data + pad), (pad, pad))
    )


def build_padded_pyramid(
    fmap1: jax.Array,
    fmap2: jax.Array,
    num_levels: int = 4,
    radius: int = 4,
    out_dtype: Any = jnp.float32,
) -> PaddedPyramid:
    """Pyramid via the pooled-fmap identity (ops/corr.py), padded once."""
    from flow_supervisor_tpu.ops.corr import build_corr_pyramid_from_fmaps

    vols = build_corr_pyramid_from_fmaps(fmap1, fmap2, num_levels, out_dtype)
    # Barrier: materialize each padded plane exactly once. Without it XLA is
    # free to fuse the pad into every per-iteration consumer, recomputing the
    # 100+ MB pad 12x per forward.
    planes = jax.lax.optimization_barrier(
        tuple(pad_plane(v, radius) for v in vols)
    )
    return PaddedPyramid(
        planes=list(planes),
        shapes=tuple(v.shape[3:5] for v in vols),
        radius=radius,
    )


def _window_kernel(idx_ref, plane_ref, out_ref, scratch_ref, *, tq, sup, wp, wp_pad):
    for q in range(tq):
        by8 = pl.multiple_of(idx_ref[q, 0], 8)
        offy = idx_ref[q, 1]
        bx = idx_ref[q, 2]
        # dynamic rotates are 32-bit only: upcast bf16 bands in-register
        band = plane_ref[q, pl.ds(by8, BAND), :].astype(jnp.float32)
        band = pltpu.roll(band, BAND - offy, axis=0)  # window rows -> [0..SUP)
        scratch_ref[:, :wp] = band[:16, :]
        patch = pltpu.roll(scratch_ref[:, :], wp_pad - bx, axis=1)
        out_ref[q, :, :] = patch[:sup, :16]


def _window_kernel_mxu(
    idx_ref, colidx_ref, plane_ref, out_ref, bands_ref, *, tq, sup, wp
):
    """MXU variant: per-query aligned 24-row bands are gathered into one
    scratch, then a SINGLE block-diagonal one-hot matmul selects every query's
    16 window columns at once — [tq*24, Wp] @ [Wp, tq*16] on the MXU replaces
    tq per-query lane rotations on the VPU. Row alignment (offy) is fixed by a
    cheap [24, 16] dynamic rotate per query after the dot."""
    for q in range(tq):
        by8 = pl.multiple_of(idx_ref[q, 0], 8)
        bands_ref[q * BAND : (q + 1) * BAND, :] = plane_ref[q, pl.ds(by8, BAND), :]
    # one-hot: OH[r, j] = 1{r == colidx[j]}  (colidx = bx_q + c, columns j=q*16+c)
    r_ids = jax.lax.broadcasted_iota(jnp.int32, (wp, tq * 16), 0)
    oh = (r_ids == colidx_ref[0][None, :]).astype(bands_ref.dtype)
    patch_big = jnp.dot(
        bands_ref[:, :], oh, preferred_element_type=jnp.float32
    )  # [tq*BAND, tq*16]
    for q in range(tq):
        offy = idx_ref[q, 1]
        blk = patch_big[q * BAND : (q + 1) * BAND, q * 16 : (q + 1) * 16]
        blk = pltpu.roll(blk, BAND - offy, axis=0)
        out_ref[q, :, :] = blk[:sup, :16]


def _auto_interpret(interpret):
    """Mosaic compiles only on TPU; everywhere else (CPU tests, virtual-device
    meshes) the kernel runs through the Pallas interpreter."""
    if interpret is None:
        return jax.default_backend() not in ("tpu", "axon")
    return interpret


def _level_support(plane, hw, coords_flat, radius, interpret=None, mxu=True):
    """Extract [BQ, SUP, 16] support patches (rows/cols [0..SUP) valid)."""
    interpret = _auto_interpret(interpret)
    h2, w2 = hw
    sup = 2 * radius + 2
    pad = sup
    bq, hp, wp = plane.shape
    tq = _pick_tq(bq)

    fl = jnp.floor(coords_flat)
    frac = (coords_flat - fl).astype(jnp.float32)
    base = fl.astype(jnp.int32) - radius + pad
    by = jnp.clip(base[:, 1], 0, h2 + 2 * pad - sup)
    bx = jnp.clip(base[:, 0], 0, w2 + 2 * pad - sup)
    by8 = (by // 8) * 8

    if mxu:
        idx = jnp.stack([by8, by - by8], axis=-1)
        colidx = (bx[:, None] + jax.lax.broadcasted_iota(jnp.int32, (1, 16), 1)).reshape(
            bq // tq, 1, tq * 16
        )
        # VMEM blocks need an 8-divisible sublane dim; replicate rows (tiny)
        colidx = jnp.broadcast_to(colidx, (bq // tq, 8, tq * 16)).reshape(
            (bq // tq) * 8, tq * 16
        )
        out = pl.pallas_call(
            functools.partial(_window_kernel_mxu, tq=tq, sup=sup, wp=wp),
            grid=(bq // tq,),
            in_specs=[
                pl.BlockSpec((tq, 2), lambda i: (i, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((8, tq * 16), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tq, hp, wp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (tq, sup, 16), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((bq, sup, 16), jnp.float32),
            scratch_shapes=[pltpu.VMEM((tq * BAND, wp), plane.dtype)],
            interpret=interpret,
        )(idx, colidx, plane)
        return out, frac

    idx = jnp.stack([by8, by - by8, bx], axis=-1)
    wp_pad = _round_up(wp, 128)
    out = pl.pallas_call(
        functools.partial(
            _window_kernel, tq=tq, sup=sup, wp=wp, wp_pad=wp_pad
        ),
        grid=(bq // tq,),
        in_specs=[
            pl.BlockSpec((tq, 3), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((tq, hp, wp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tq, sup, 16), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bq, sup, 16), jnp.float32),
        scratch_shapes=[pltpu.VMEM((16, wp_pad), jnp.float32)],
        interpret=interpret,
    )(idx, plane)
    return out, frac


def _combine(support, frac, k):
    """4-tap bilinear combine of the [BQ, SUP, 16] support -> [BQ, k, k]."""
    fx = frac[:, 0][:, None, None]
    fy = frac[:, 1][:, None, None]
    p = support
    return (
        (1 - fy) * (1 - fx) * p[:, :k, :k]
        + (1 - fy) * fx * p[:, :k, 1 : k + 1]
        + fy * (1 - fx) * p[:, 1 : k + 1, :k]
        + fy * fx * p[:, 1 : k + 1, 1 : k + 1]
    )


def _lookup_impl(planes, shapes, radius, coords, interpret=None, mxu=True):
    b, h1, w1, _ = coords.shape
    bq = b * h1 * w1
    k = 2 * radius + 1
    outs = []
    for i, (plane, hw) in enumerate(zip(planes, shapes)):
        cl = (coords / (2.0**i)).reshape(bq, 2)
        support, frac = _level_support(plane, hw, cl, radius, interpret, mxu)
        out = _combine(support, frac, k)
        # [dy, dx] -> the framework's dx-major channel order
        outs.append(jnp.transpose(out, (0, 2, 1)).reshape(b, h1, w1, k * k))
    return jnp.concatenate(outs, axis=-1)


def _oracle_lookup(planes, shapes, radius, coords):
    """The einsum oracle evaluated on the unpadded volumes recovered from the
    planes — used only to derive the backward pass."""
    from flow_supervisor_tpu.ops.corr import corr_pyramid_lookup

    b, h1, w1, _ = coords.shape
    pad = 2 * radius + 2
    vols = [
        p[:, pad : pad + h2, pad : pad + w2].reshape(b, h1, w1, h2, w2)
        for p, (h2, w2) in zip(planes, shapes)
    ]
    return corr_pyramid_lookup(vols, coords, radius)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _lookup(planes, shapes, radius, coords):
    return _lookup_impl(planes, shapes, radius, coords)


def _lookup_fwd(planes, shapes, radius, coords):
    return _lookup_impl(planes, shapes, radius, coords), (planes, coords)


def _lookup_bwd(shapes, radius, res, g):
    planes, coords = res
    # d(planes) via the oracle's autodiff (transposed one-hot scatter on the
    # MXU); coords are stop-gradient at every call site (reference detaches
    # coords before lookup, raft/__init__.py:155) so their grad is zero.
    _, vjp = jax.vjp(lambda ps: _oracle_lookup(ps, shapes, radius, coords), planes)
    (d_planes,) = vjp(g)
    return d_planes, jnp.zeros_like(coords)


_lookup.defvjp(_lookup_fwd, _lookup_bwd)


def corr_pyramid_lookup_v2(
    pyramid: PaddedPyramid, coords: jax.Array, radius: int = 4
) -> jax.Array:
    """Drop-in lookup on a PaddedPyramid: [B, h1, w1, L*(2r+1)^2]."""
    assert radius == pyramid.radius, (radius, pyramid.radius)
    return _lookup(list(pyramid.planes), pyramid.shapes, radius, coords)
