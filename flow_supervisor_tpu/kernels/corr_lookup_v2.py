"""Pallas TPU kernel: fused correlation-pyramid window lookup.

TPU-native counterpart of the reference's ``alt_cuda_corr``
(pytorch/alt_cuda_corr/correlation_kernel.cu:19-119): for each query, extract
the (K+1)x(K+1) bilinear support patch from its correlation plane entirely in
VMEM, with zero gathers and zero matmuls:

  1. an 8-aligned dynamic sublane slice pulls the 24-row band containing the
     window (``pl.multiple_of`` satisfies Mosaic's sublane-alignment proof),
  2. a circular sublane roll brings the window's first row to row 0,
  3. a circular lane roll (on a 128-multiple-wide scratch) brings the window's
     first column to column 0,
  4. out-of-bounds taps are zeroed IN-KERNEL by an iota mask (circular wrap
     plus mask replaces the zero-padding ring entirely), and the [SUP, 16]
     support corner is written out; the 4-tap bilinear combine runs outside in
     XLA where it fuses with the level concat.

Layout (v3, this file's second iteration): planes are stored UNPADDED in x and
padded only at the bottom to the band-slice bound — 1.0x the volume bytes in x
and ~1.2x in y, vs the 1.8x zero-ring layout of the first iteration. Queries
are processed in groups of 128 per grid step (vs 16), cutting grid steps per
forward ~8x. OOB windows are handled by clamping the window base into
[-(SUP-1), dim-1] (everything further is fully out of bounds and masks to
zero; circularly-wrapped garbage rows/cols are masked too).

Gradients: coords always arrive behind ``stop_gradient`` in RAFT (the
reference detaches coords before every lookup, raft/__init__.py:155), so the
custom VJP returns zero coordinate gradients; the plane gradient is the
transposed one-hot scatter computed by XLA via the einsum oracle's autodiff.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BAND = 24  # rows fetched per query: 8-alignment slack + SUP (10) <= 24


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _pick_tq(bq: int, preferred: int = 128) -> int:
    for tq in (preferred, 64, 32, 16, 8, 4, 2, 1):
        if tq <= preferred and bq % tq == 0:
            return tq
    return 1


def plane_height(h2: int) -> int:
    """Padded plane height: the minimal 8-aligned height that fits the rows
    AND a full band slice.

    The band-start clamp (``by8 = clip(floor8(by), 0, hp - BAND)``) plus the
    in-kernel validity mask make any ``hp >= max(round_up(h2, 8), BAND)``
    exact: when the clamp engages, the sublane roll wraps rows whose PLANE row
    index is ``>= by8 + BAND = hp >= h2`` — all out of range, all masked to
    zero. The earlier ``floor8(h2-1) + BAND`` formula (guaranteeing an
    unclamped band for every valid base) over-padded level planes by up to 16
    rows — ~24% of the plane-block DMA bytes at 448x1024, the measured
    dominant lookup cost (docs/PERF.md)."""
    return max(_round_up(h2, 8), BAND)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class PaddedPyramid:
    """Correlation pyramid stored as per-query planes, bottom-padded to the
    band bound.

    planes[l]: [BQ, Hp_l, w2_l]; shapes[l] = (h2_l, w2_l) unpadded target dims;
    radius is the lookup radius the layout was sized for.
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
    """[B, h1, w1, h2, w2] volume -> [BQp, Hp, w2] bottom-padded plane.

    The query axis is padded to a 128-multiple as well: eval shapes like
    KITTI's 376x1248 give BQ = 7332 whose largest small divisor is 4, which
    would collapse the kernel's query tile (and Mosaic's block divisibility)
    — padded queries cost one zero block per plane and are sliced off the
    lookup output."""
    b, h1, w1, h2, w2 = vol.shape
    bq = b * h1 * w1
    bqp = _round_up(bq, 128)
    hp = plane_height(h2)
    return jnp.pad(
        vol.reshape(bq, h2, w2), ((0, bqp - bq), (0, hp - h2), (0, 0))
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
    # free to fuse the pad into every per-iteration consumer, recomputing it
    # 12x per forward.
    planes = jax.lax.optimization_barrier(
        tuple(pad_plane(v, radius) for v in vols)
    )
    return PaddedPyramid(
        planes=list(planes),
        shapes=tuple(v.shape[3:5] for v in vols),
        radius=radius,
    )


def _window_kernel(idx_ref, plane_ref, out_ref, scratch_ref, *, tq, sup, h2, w2, wp_pad):
    # tap-validity iotas are shared by every query in the group
    iu = jax.lax.broadcasted_iota(jnp.int32, (sup, 16), 0)
    iv = jax.lax.broadcasted_iota(jnp.int32, (sup, 16), 1)
    for q in range(tq):
        by8 = pl.multiple_of(idx_ref[q, 0], 8)
        sy = idx_ref[q, 1]
        sx = idx_ref[q, 2]
        by = idx_ref[q, 3]
        bx = idx_ref[q, 4]
        # dynamic rotates are 32-bit only: upcast bf16 bands in-register
        band = plane_ref[q, pl.ds(by8, BAND), :].astype(jnp.float32)
        band = pltpu.roll(band, sy, axis=0)  # window row 0 -> band row 0
        scratch_ref[:, :w2] = band[:16, :]
        patch = pltpu.roll(scratch_ref[:, :], sx, axis=1)[:sup, :16]
        valid = (
            (iu >= -by) & (iu < h2 - by) & (iv >= -bx) & (iv < w2 - bx)
        )
        # where (not multiply): wrapped/stale scratch values may be anything
        out_ref[q, :, :] = jnp.where(valid, patch, 0.0)


def _auto_interpret(interpret):
    """Mosaic compiles only on TPU; everywhere else (CPU tests, virtual-device
    meshes) the kernel runs through the Pallas interpreter."""
    if interpret is None:
        return jax.default_backend() not in ("tpu", "axon")
    return interpret


def _level_support(plane, hw, coords_flat, radius, interpret=None):
    """Extract [BQ, SUP, 16] support patches (rows [0..SUP), cols [0..SUP+1)
    hold the window; the rest is zero)."""
    interpret = _auto_interpret(interpret)
    h2, w2 = hw
    sup = 2 * radius + 2
    bq = coords_flat.shape[0]
    bqp, hp, wp = plane.shape
    assert wp == w2, (wp, w2)
    assert bqp >= bq, (bqp, bq)
    tq = _pick_tq(bqp)
    wp_pad = _round_up(w2, 128)

    if bqp != bq:
        coords_flat = jnp.pad(coords_flat, ((0, bqp - bq), (0, 0)))
    fl = jnp.floor(coords_flat)
    frac = (coords_flat - fl).astype(jnp.float32)
    base = fl.astype(jnp.int32) - radius
    # beyond [-sup, dim] every tap is OOB, and at the bounds themselves the
    # window is already fully OOB too — clamping there keeps the mask all-zero
    by = jnp.clip(base[:, 1], -sup, h2)
    bx = jnp.clip(base[:, 0], -sup, w2)
    by8 = jnp.clip((by // 8) * 8, 0, hp - BAND)
    sy = jnp.mod(BAND - (by - by8), BAND)
    sx = jnp.mod(wp_pad - bx, wp_pad)

    idx = jnp.stack([by8, sy, sx, by, bx], axis=-1)
    out = pl.pallas_call(
        functools.partial(
            _window_kernel, tq=tq, sup=sup, h2=h2, w2=w2, wp_pad=wp_pad
        ),
        grid=(bqp // tq,),
        in_specs=[
            pl.BlockSpec((tq, 5), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((tq, hp, wp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tq, sup, 16), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bqp, sup, 16), jnp.float32),
        scratch_shapes=[pltpu.VMEM((16, wp_pad), jnp.float32)],
        interpret=interpret,
    )(idx, plane)
    return out[:bq], frac[:bq]


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


def _lookup_impl(planes, shapes, radius, coords, interpret=None, dy_major=False):
    b, h1, w1, _ = coords.shape
    bq = b * h1 * w1
    k = 2 * radius + 1
    outs = []
    for i, (plane, hw) in enumerate(zip(planes, shapes)):
        cl = (coords / (2.0**i)).reshape(bq, 2)
        support, frac = _level_support(plane, hw, cl, radius, interpret)
        out = _combine(support, frac, k)
        if dy_major:
            # keep the kernel's natural [dy, dx] order; the consumer folds the
            # dx-major permutation into its first 1x1 conv weights instead
            # (models/update.py corr_perm) — the XLA minor-dims transpose here
            # cost 7.1 ms/fwd by profile
            outs.append(out.reshape(b, h1, w1, k * k))
        else:
            # [dy, dx] -> the reference's dx-major channel order
            outs.append(jnp.transpose(out, (0, 2, 1)).reshape(b, h1, w1, k * k))
    return jnp.concatenate(outs, axis=-1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 4))
def _lookup(planes, shapes, radius, coords, dy_major=False):
    return _lookup_impl(planes, shapes, radius, coords, dy_major=dy_major)


def _lookup_fwd(planes, shapes, radius, coords, dy_major):
    # residuals: coords plus zero-size dtype tokens for the planes — nothing
    # plane-sized is kept alive for the backward, and (unlike the round-2
    # VJP) nothing of the forward is ever re-run.
    dtype_tokens = tuple(jnp.zeros((0,), p.dtype) for p in planes)
    return (
        _lookup_impl(planes, shapes, radius, coords, dy_major=dy_major),
        (coords, dtype_tokens),
    )


def _lookup_bwd(shapes, radius, dy_major, res, g):
    """Closed-form transposed lookup (shared with corr_fused): shifted pads +
    one-hot MXU scatters give d(plane) directly from (g, coords); coords are
    stop-gradient at every call site (reference detaches coords before lookup,
    raft/__init__.py:155) so their grad is zero."""
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


def corr_pyramid_lookup_v2(
    pyramid: PaddedPyramid,
    coords: jax.Array,
    radius: int = 4,
    dy_major: bool = False,
) -> jax.Array:
    """Drop-in lookup on a PaddedPyramid: [B, h1, w1, L*(2r+1)^2].

    ``dy_major=True`` emits each level's window channels as dy*k+dx instead of
    the reference's dx*k+dy, skipping a costly channel transpose; the consumer
    must fold the permutation into its weights (models/update.py)."""
    assert radius == pyramid.radius, (radius, pyramid.radius)
    return _lookup(list(pyramid.planes), pyramid.shapes, radius, coords, dy_major)
