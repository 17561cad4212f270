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
    return PaddedPyramid(
        planes=[pad_plane(v, radius) for v in vols],
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


def _auto_interpret(interpret):
    """Mosaic compiles only on TPU; everywhere else (CPU tests, virtual-device
    meshes) the kernel runs through the Pallas interpreter."""
    if interpret is None:
        return jax.default_backend() not in ("tpu", "axon")
    return interpret


def _level_support(plane, hw, coords_flat, radius, interpret=None):
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


def _lookup_impl(planes, shapes, radius, coords, interpret=None):
    b, h1, w1, _ = coords.shape
    bq = b * h1 * w1
    k = 2 * radius + 1
    outs = []
    for i, (plane, hw) in enumerate(zip(planes, shapes)):
        cl = (coords / (2.0**i)).reshape(bq, 2)
        support, frac = _level_support(plane, hw, cl, radius, interpret)
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
