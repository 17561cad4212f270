"""Pallas TPU kernel: volume-free fused correlation lookup.

TPU-native counterpart of the reference's ``alt_cuda_corr`` with its defining
property intact (pytorch/alt_cuda_corr/correlation_kernel.cu:19-119, python
wrapper pytorch/core/corr.py:63-91): the all-pairs correlation volume is NEVER
materialized in HBM. Each grid step recomputes a [TQ, h2, w2] slab of the
correlation plane IN VMEM from the feature maps with MXU dots (good shapes:
M=TQ=128, K=C, N=w2), extracts every query's (2r+2)x(2r+2) bilinear support
with the slice+roll scheme proven in corr_lookup_v2, and reduces the support
to final window channels with one-hot MXU dots that fold, in a single pass:

  - the 4-tap bilinear combine (the external combine on the 8x tile-padded
    [BQ, SUP, 16] f32 output cost 4.6 ms/fwd by xplane profile),
  - the dx-major/dy-major channel permutation (no transpose either way).

Each level emits its own [BQ, k^2] stripe and the stripes are concatenated
level-major outside the kernel: an in-kernel stripe offset (the round-3 first
cut) made the one-hot dot's N = 4*L*k^2 = 1296 with 3/4 structural zeros --
11 MXU column passes per dot where 3 suffice.

Recompute trades ~35 GFLOP/fwd of MXU work (~0.2 ms at measured matmul rates)
for the volume's entire HBM life-cycle: the 0.5-2 GB build+pad traffic, the
per-iteration band reads, and the HBM capacity ceiling that capped batch size
and single-chip eval resolution (reference trains at bs 6-10, train.sh:3-6).

Feature maps are streamed per y-chunk when fmap2 does not fit in VMEM
(grid dim YC), so >1080p single-chip eval compiles with bf16 planes.

Gradients: a custom VJP computes d(fmap1)/d(fmap2) directly as transposed
one-hot einsums (scatter into a transient d_volume, then two big MXU
contractions) -- residuals are just (fmap1, pooled fmap2, coords); nothing of
the forward is re-run, unlike corr_lookup_v2's round-2 oracle-recompute VJP.
Coordinate gradients are zero by the reference's own contract (coords are
detached before every lookup, raft/__init__.py:155).
"""
from __future__ import annotations

import dataclasses
import functools
import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flow_supervisor_tpu.kernels.corr_lookup_v2 import (
    BAND,
    _auto_interpret,
    _pick_tq,
    _round_up,
    plane_height,
)

# taps of the bilinear combine in the einsum-oracle's summation order:
# (row shift a into the y-support, col shift b into the x-support)
_TAPS = ((0, 0), (0, 1), (1, 0), (1, 1))

_VMEM_BUDGET = 12 * 1024 * 1024


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class FusedCorrPyramid:
    """Correlation pyramid stored as its FACTORS: fmap1 queries and per-level
    pooled fmap2 columns. The volume itself is recomputed tile-by-tile in VMEM
    at every lookup.

    f1:     [B, Q, C] query features (Q = h1*w1)
    f2ts:   per level, [B, h2c_l, C, w2_l] pooled target features, transposed
            channel-middle for direct [C, w2] column dots, rows zero-padded to
            the kernel's y-chunk multiple h2c_l
    shapes: per level (h2, w2) true target dims
    h1w1:   query grid dims
    radius: lookup radius the channel layout is sized for
    """

    f1: jax.Array
    f2ts: list[jax.Array]
    shapes: tuple[tuple[int, int], ...]
    h1w1: tuple[int, int]
    radius: int

    def tree_flatten(self):
        return [self.f1, *self.f2ts], (self.shapes, self.h1w1, self.radius)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], list(children[1:]), aux[0], aux[1], aux[2])


def _pick_ych(b: int, h2: int, c: int, w2: int, itemsize: int) -> int:
    """Whole-fmap2 chunk when it fits the scoped-VMEM budget, else 8-row
    streaming chunks.

    The budget depends on the BATCH: at b == 1 (and nyc == 1) the f2 block's
    index map is constant across grid steps, so Mosaic single-buffers it; any
    batch grid dimension makes the block revolve and DOUBLE-buffer, which blew
    the 16 MB scoped-vmem limit at 448x1024 B>=4 (level-0 block 3.67 MB ->
    7.3 MB buffered, measured 17.5 MB total scoped on-chip)."""
    budget = (6 if b == 1 else 2) * 1024 * 1024
    if h2 * c * w2 * itemsize <= budget:
        return h2
    return 8


def build_fused_pyramid(
    fmap1: jax.Array,
    fmap2: jax.Array,
    num_levels: int = 4,
    radius: int = 4,
    out_dtype: Any = jnp.float32,
) -> FusedCorrPyramid:
    """Pool fmap2 per level (the pooled-fmap identity, ops/corr.py) and lay
    the factors out for the kernel. Nothing volume-sized is created."""
    from flow_supervisor_tpu.ops.corr import _avg_pool_fmap_same

    b, h1, w1, c = fmap1.shape
    f1 = fmap1.reshape(b, h1 * w1, c)
    f2ts, shapes = [], []
    scale = 1
    for lvl in range(num_levels):
        pooled = fmap2 if lvl == 0 else _avg_pool_fmap_same(fmap2, scale)
        _, h2, w2, _ = pooled.shape
        ych = _pick_ych(b, h2, c, w2, pooled.dtype.itemsize)
        h2c = _round_up(h2, ych)
        f2t = jnp.transpose(pooled, (0, 1, 3, 2))  # [B, h2, C, w2]
        f2t = jnp.pad(f2t, ((0, 0), (0, h2c - h2), (0, 0), (0, 0)))
        f2ts.append(f2t)
        shapes.append((h2, w2))
        scale *= 2
    return FusedCorrPyramid(f1, f2ts, tuple(shapes), (h1, w1), radius)


@functools.lru_cache(maxsize=64)
def _combine_matrix(
    sup: int, radius: int, cht: int, ch_off: int, dy_major: bool
) -> np.ndarray:
    """[SUP, 16, 4*CHT] one-hot map from support taps to output channels.

    S[u, v, t*CHT + ch_off + o] = 1 iff window offset (dy, dx) of output
    channel o is touched by support tap (u, v) under bilinear tap t. The dot
    against S performs tap-gather, channel permutation (dy- or dx-major,
    reference order allfield.py:109-135), and the level's stripe placement in
    one MXU pass; stripes of other levels stay exactly zero so level outputs
    sum instead of concatenate."""
    k = 2 * radius + 1
    s = np.zeros((sup, 16, 4 * cht), np.float32)
    for t, (a, bshift) in enumerate(_TAPS):
        for dy in range(k):
            for dx in range(k):
                o = dy * k + dx if dy_major else dx * k + dy
                s[dy + a, dx + bshift, t * cht + ch_off + o] = 1.0
    return s


def _fused_level_kernel(
    idx_ref, frac_ref, f1_ref, f2_ref, s_ref, out_ref, plane_ref, sup_ref,
    *, tq, sup, cht, h2, w2, wp, ych, scale_recip, highest,
):
    yc = pl.program_id(2)
    nyc = pl.num_programs(2)

    # ---- plane slab: corr rows for this y-chunk, straight off the MXU ------
    f1 = f1_ref[0]  # [TQ, C]
    precision = jax.lax.Precision.HIGHEST if highest else None
    for j in range(ych):
        col = f2_ref[0, j]  # [C, w2]
        prod = jax.lax.dot_general(
            f1, col, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )
        if scale_recip is not None:
            prod = prod * scale_recip  # exact: 1/sqrt(C) is a power of two
        else:
            prod = prod / jnp.sqrt(jnp.asarray(f1.shape[-1], jnp.float32))
        plane_ref[:, yc * ych + j, 0:w2] = prod.astype(plane_ref.dtype)

    # ---- window extraction + fused combine, once the plane is complete -----
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
            band = pltpu.roll(band, sy, axis=0)  # window row 0 -> band row 0
            # slice rows BEFORE the lane roll: the y-kept rows are 0..sup-1
            # (by - by8 <= 7 and 7 + 16 <= BAND, so no wrap pollutes them),
            # which shrinks the widest per-query op from [24,128] to [16,128]
            patch = pltpu.roll(band[:16], sx, axis=1)[:sup, :16]
            valid = (iu >= -by) & (iu < h2 - by) & (iv >= -bx) & (iv < w2 - bx)
            # where (not multiply): wrapped/stale plane values may be anything
            sup_ref[q, :, :] = jnp.where(valid, patch, 0.0)
        # one-hot MXU reduction: tap gather + channel order + level stripe.
        # Each output channel receives exactly ONE support tap, so the only
        # precision risk is operand truncation: at DEFAULT the MXU casts the
        # f32 support to bf16 (measured 5e-3 error vs the oracle on-chip);
        # HIGHEST keeps f32 planes bit-faithful. bf16 planes lose nothing to
        # the cast (sup values already came from bf16), so DEFAULT is right.
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


def _level_indices(coords, lvl, h2, w2, hp, wp, radius):
    """Per-query slice/roll/mask indices, identical math to corr_lookup_v2."""
    sup = 2 * radius + 2
    cl = coords / (2.0 ** lvl)
    fl = jnp.floor(cl)
    frac = (cl - fl).astype(jnp.float32)
    base = fl.astype(jnp.int32) - radius
    by = jnp.clip(base[:, 1], -sup, h2)
    bx = jnp.clip(base[:, 0], -sup, w2)
    by8 = jnp.clip((by // 8) * 8, 0, hp - BAND)
    sy = jnp.mod(BAND - (by - by8), BAND)
    sx = jnp.mod(wp - bx, wp)
    return jnp.stack([by8, sy, sx, by, bx], axis=-1), frac


def _fused_level(
    f1, f2t, coords_flat, hw, radius, cht, ch_off, dy_major,
    plane_dtype, out_dtype, interpret=None,
):
    """One level's lookup: [BQ, CHT] with only this level's stripe non-zero."""
    interpret = _auto_interpret(interpret)
    b, q, c = f1.shape
    h2, w2 = hw
    h2c = f2t.shape[1]
    sup = 2 * radius + 2
    hp = plane_height(h2)
    wp = _round_up(w2, 128)
    # Pad the query axis to a 128-multiple: recipe crops give q with no large
    # power-of-two divisor (400x720 -> q=4500 -> tq=4), which both violates
    # Mosaic's (8,128) block-divisibility rule on the SMEM idx block and
    # wastes the tile. Padded queries carry coords (0,0) -> valid indices.
    q_real = q
    q = _round_up(q, 128)
    if q != q_real:
        f1 = jnp.pad(f1, ((0, 0), (0, q - q_real), (0, 0)))
        coords_flat = jnp.pad(
            coords_flat.reshape(b, q_real, 2),
            ((0, 0), (0, q - q_real), (0, 0)),
        )
    tq = _pick_tq(q)
    ych = min(_pick_ych(b, h2, c, w2, f2t.dtype.itemsize), h2c)
    assert h2c % ych == 0, (h2c, ych)
    nyc = h2c // ych
    assert nyc * ych <= hp, (nyc, ych, hp)
    qt = q // tq

    # The slab is ALWAYS f32: the dynamic rotates are 32-bit only (the band
    # would be upcast in-register regardless), and a bf16 slab's (16, 128)
    # tiling breaks the 8-aligned band-slice proof Mosaic needs
    # ("cannot statically prove that index ... is a multiple of 8") as well
    # as small-w2 row inserts (vector<8x6xbf16> shape cast). The bf16 perf
    # path still reads bf16 fmap FACTORS from HBM — the slab never leaves
    # VMEM, so its dtype costs capacity, not bandwidth.
    plane_dtype = jnp.float32
    plane_isz = jnp.dtype(plane_dtype).itemsize
    while tq > 8 and tq * hp * wp * plane_isz > _VMEM_BUDGET - (
        ych * c * w2 * f2t.dtype.itemsize
    ):
        tq //= 2
        qt = q // tq

    idx, frac = _level_indices(
        coords_flat.reshape(b * q, 2), 0, h2, w2, hp, wp, radius
    )
    s_mat = jnp.asarray(_combine_matrix(sup, radius, cht, ch_off, dy_major))

    scale_recip = None
    inv = 1.0 / math.sqrt(c)
    if math.sqrt(c) == int(math.sqrt(c)) and (int(math.sqrt(c)) & (int(math.sqrt(c)) - 1)) == 0:
        scale_recip = inv  # power-of-two sqrt: multiply is bit-exact division

    kernel = functools.partial(
        _fused_level_kernel,
        tq=tq, sup=sup, cht=cht, h2=h2, w2=w2, wp=wp, ych=ych,
        scale_recip=scale_recip, highest=f1.dtype == jnp.float32,
    )
    out = pl.pallas_call(
        kernel,
        grid=(b, qt, nyc),
        in_specs=[
            pl.BlockSpec(
                (tq, 5), lambda bi, qi, yi, _qt=qt: (bi * _qt + qi, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (tq, 2), lambda bi, qi, yi, _qt=qt: (bi * _qt + qi, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, tq, c), lambda bi, qi, yi: (bi, qi, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, ych, c, w2), lambda bi, qi, yi: (bi, yi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (sup, 16, 4 * cht), lambda bi, qi, yi: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (tq, cht), lambda bi, qi, yi, _qt=qt: (bi * _qt + qi, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b * q, cht), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((tq, hp, wp), plane_dtype),
            pltpu.VMEM((tq, sup, 16), jnp.float32),
        ],
        interpret=interpret,
    )(idx, frac, f1, f2t, s_mat)
    if q != q_real:
        out = out.reshape(b, q, cht)[:, :q_real].reshape(b * q_real, cht)
    return out


def _num_levels(pyr: FusedCorrPyramid) -> int:
    return len(pyr.f2ts)


def _lookup_impl(
    f1, f2ts, shapes, h1w1, radius, coords,
    plane_dtype, out_dtype, dy_major, interpret=None,
):
    b, q, _ = f1.shape
    h1, w1 = h1w1
    k = 2 * radius + 1
    coords_flat = coords.reshape(b, q, 2)
    outs = []
    for lvl, (f2t, hw) in enumerate(zip(f2ts, shapes)):
        cl = coords_flat / (2.0 ** lvl)
        outs.append(
            _fused_level(
                f1, f2t, cl, hw, radius, k * k, 0, dy_major,
                plane_dtype, out_dtype, interpret,
            )
        )
    # level-major channel concat (reference pyramid layout, ops/corr.py)
    return jnp.concatenate(outs, axis=-1).reshape(b, h1, w1, len(f2ts) * k * k)


# ---- custom VJP: direct transposed einsums, no forward recompute -----------


def lookup_vjp_dvols(g, coords, shapes, radius, dy_major):
    """Cotangent of any bilinear window lookup w.r.t. the (virtual) volumes.

    g: [B, h1, w1, L*k^2] output cotangent -> list of d_vol [B, Q, h2, w2]
    per level. Pure transposed math (shifted pads + one-hot scatters); shared
    by corr_lookup_v2's VJP, which pads these into its plane layout."""
    from flow_supervisor_tpu.ops.corr import _interp_matrix

    b, h1, w1, _ = g.shape
    q = h1 * w1
    k = 2 * radius + 1
    sup = k + 1
    gq = g.reshape(b, q, len(shapes), k * k).astype(jnp.float32)
    d_vols = []
    for lvl, (h2, w2) in enumerate(shapes):
        cl = coords.reshape(b, q, 2) / (2.0 ** lvl)
        x, y = cl[..., 0], cl[..., 1]
        fx = (x - jnp.floor(x)).astype(jnp.float32)[..., None, None]
        fy = (y - jnp.floor(y)).astype(jnp.float32)[..., None, None]
        gl = gq[:, :, lvl].reshape(b, q, k, k)
        if not dy_major:
            gl = jnp.swapaxes(gl, -1, -2)  # dx-major channels -> [dy, dx]
        # d_support[u, v] = sum_taps w_tap * g[u - a, v - b]
        g_sup = (
            (1 - fy) * (1 - fx) * jnp.pad(gl, ((0, 0), (0, 0), (0, 1), (0, 1)))
            + (1 - fy) * fx * jnp.pad(gl, ((0, 0), (0, 0), (0, 1), (1, 0)))
            + fy * (1 - fx) * jnp.pad(gl, ((0, 0), (0, 0), (1, 0), (0, 1)))
            + fy * fx * jnp.pad(gl, ((0, 0), (0, 0), (1, 0), (1, 0)))
        )  # [B, Q, SUP, SUP]
        ry = _interp_matrix(y, h2, radius)  # [B, Q, SUP, h2]
        rx = _interp_matrix(x, w2, radius)  # [B, Q, SUP, w2]
        t = jnp.einsum(
            "bquv,bquy->bqvy", g_sup, ry, preferred_element_type=jnp.float32
        )
        d_vols.append(
            jnp.einsum(
                "bqvy,bqvx->bqyx", t, rx, preferred_element_type=jnp.float32
            )
        )
    return d_vols


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7))
def _lookup(f1, f2ts, shapes, h1w1, radius, plane_dtype_name, dy_major,
            out_dtype_name, coords):
    return _lookup_impl(
        f1, f2ts, shapes, h1w1, radius, coords,
        jnp.dtype(plane_dtype_name), jnp.dtype(out_dtype_name), dy_major,
    )


def _lookup_fwd(f1, f2ts, shapes, h1w1, radius, plane_dtype_name, dy_major,
                out_dtype_name, coords):
    out = _lookup_impl(
        f1, f2ts, shapes, h1w1, radius, coords,
        jnp.dtype(plane_dtype_name), jnp.dtype(out_dtype_name), dy_major,
    )
    return out, (f1, f2ts, coords)


def _lookup_bwd(shapes, h1w1, radius, plane_dtype_name, dy_major,
                out_dtype_name, res, g):
    f1, f2ts, coords = res
    b, q, c = f1.shape
    scale = 1.0 / jnp.sqrt(jnp.asarray(c, jnp.float32))
    d_vols = lookup_vjp_dvols(g, coords, shapes, radius, dy_major)
    d_f1 = jnp.zeros((b, q, c), jnp.float32)
    d_f2ts = []
    for (h2, w2), f2t, d_vol in zip(shapes, f2ts, d_vols):
        h2c = f2t.shape[1]
        # d_plane = scale * d_vol; then the two transposed factor products
        d_f1 += scale * jnp.einsum(
            "bqyx,bycx->bqc", d_vol, f2t[:, :h2].astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        d_f2 = scale * jnp.einsum(
            "bqyx,bqc->bycx", d_vol, f1.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        d_f2ts.append(
            jnp.pad(d_f2, ((0, 0), (0, h2c - h2), (0, 0), (0, 0))).astype(
                f2t.dtype
            )
        )
    return d_f1.astype(f1.dtype), d_f2ts, jnp.zeros_like(coords)


_lookup.defvjp(_lookup_fwd, _lookup_bwd)


def corr_pyramid_lookup_fused(
    pyramid: FusedCorrPyramid,
    coords: jax.Array,
    radius: int = 4,
    dy_major: bool = False,
    plane_dtype: Any = None,
    out_dtype: Any = jnp.float32,
) -> jax.Array:
    """Volume-free lookup on a FusedCorrPyramid: [B, h1, w1, L*(2r+1)^2].

    ``plane_dtype`` is accepted for API stability but the in-VMEM slab is
    always f32 (see _fused_level — 32-bit rotates + Mosaic bf16 tiling);
    ``out_dtype`` is the emitted window-channel dtype."""
    assert radius == pyramid.radius, (radius, pyramid.radius)
    if plane_dtype is None:
        plane_dtype = (
            jnp.bfloat16 if pyramid.f1.dtype == jnp.bfloat16 else jnp.float32
        )
    return _lookup(
        pyramid.f1,
        list(pyramid.f2ts),
        pyramid.shapes,
        pyramid.h1w1,
        radius,
        jnp.dtype(plane_dtype).name,
        dy_major,
        jnp.dtype(out_dtype).name,
        coords,
    )
