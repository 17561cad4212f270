"""Pallas TPU kernel: affine-free instance norm with optional fused relu.

Why a kernel: instance norm is 3x-HBM-bandwidth work (read for stats, read +
write to normalize — ~0.8 ms/fwd for the whole fnet stack at 448x1024), but
the measured cost of the XLA lowering is ~18.7 ms/fwd (tools/bench_norm_ab.py,
interleaved A/B of the full forward with norms vs identity): every reduce
forces a layout pivot between convs, and the normalize re-expands through
full-size fp32 intermediates. Two tiny pallas passes pin the layout and the
arithmetic:

- stats pass: accumulate per-(sample, channel) sum / sum-of-squares across
  row tiles in a VMEM scratch (the TPU grid is sequential), emit
  [B, 2, C] = (mean, rsqrt(var + eps)) at the last tile;
- apply pass: (x - mean) * rsqrt, optional relu, cast back — one read, one
  write, no layout change (tiles stay [rows, C] with C on lanes).

Semantics match ``layers.instance_norm`` (center=False/scale=False, eps 1e-5,
fp32 statistics via the E[x^2]-E[x]^2 identity — reference
raft/smurf_models/raft_extractor.py:94-116); the torch/TF golden-parity
tests pin the numerics.

Gradient: custom VJP with the closed-form affine-free instance-norm backward
(dx = r * (g - mean(g) - yhat * mean(g * yhat)), relu mask folded in),
computed in plain XLA from (x, stats) residuals — nothing of the forward
re-runs.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["instance_norm_fused"]


def _auto_interpret(interpret):
    if interpret is not None:
        return interpret
    return jax.default_backend() not in ("tpu", "axon")


def _round_up(n: int, k: int) -> int:
    return (n + k - 1) // k * k


def _pick_tm(m: int) -> int:
    """Row-tile size: big enough to amortize the grid step, small enough to
    keep the [tm, C] fp32 block ~1 MB."""
    return min(2048, _round_up(m, 512))


def _stats_kernel(x_ref, o_ref, acc_ref, *, m, tm, eps, c, pack):
    """Accumulate sums over row tiles; at the last tile, fold the ``pack``
    lane slots (each channel appears in lanes c_i, c_i+c, ... when spatial
    rows are lane-packed) and emit (mean, rsqrt) REPLICATED into every slot,
    so the apply kernel is a plain elementwise op on the packed layout."""
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[0].astype(jnp.float32)  # [tm, c*pack]
    if m % tm != 0:
        # final tile straddles m: out-of-bounds rows are undefined
        rows = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0) + i * tm
        x = jnp.where(rows < m, x, 0.0)
    acc_ref[0:1, :] += jnp.sum(x, axis=0, keepdims=True)
    acc_ref[1:2, :] += jnp.sum(x * x, axis=0, keepdims=True)

    @pl.when(i == pl.num_programs(1) - 1)
    def _emit():
        denom = jnp.float32(m * pack)
        s1 = acc_ref[0:1, 0:c]
        s2 = acc_ref[1:2, 0:c]
        for p in range(1, pack):
            s1 = s1 + acc_ref[0:1, p * c:(p + 1) * c]
            s2 = s2 + acc_ref[1:2, p * c:(p + 1) * c]
        mean = s1 / denom
        var = jnp.maximum(s2 / denom - mean * mean, 0.0)
        r = jax.lax.rsqrt(var + eps)
        for p in range(pack):
            o_ref[0, 0:1, p * c:(p + 1) * c] = mean
            o_ref[0, 1:2, p * c:(p + 1) * c] = r


def _apply_kernel(x_ref, s_ref, o_ref, *, relu):
    x = x_ref[0].astype(jnp.float32)
    y = (x - s_ref[0, 0:1, :]) * s_ref[0, 1:2, :]
    if relu:
        y = jnp.maximum(y, 0.0)
    o_ref[0] = y.astype(o_ref.dtype)


def _norm_impl(x, eps, relu, interpret=None):
    interpret = _auto_interpret(interpret)
    b, h, w, c = x.shape
    m = h * w
    # Lane packing: at c < 128 the lane dimension runs half (c=64) or
    # quarter (c=32) empty; viewing [m, c] as [m/pack, pack*c] fills the
    # lanes (channel c_i lives in lanes c_i, c_i+c, ...). The stats kernel
    # folds the slots at emit and replicates (mean, rsqrt) into each slot,
    # so the apply kernel stays elementwise. Measured on the fnet stack:
    # the packed layout's DMA tiles are full-width instead of half-padded.
    pack = 128 // c if (c < 128 and 128 % c == 0) else 1
    while pack > 1 and m % pack != 0:
        pack //= 2
    mp, cp = m // pack, c * pack
    xm = x.reshape(b, mp, cp)
    tm = _pick_tm(mp)
    nm = (mp + tm - 1) // tm
    stats_packed = pl.pallas_call(
        functools.partial(_stats_kernel, m=mp, tm=tm, eps=eps, c=c, pack=pack),
        grid=(b, nm),
        in_specs=[
            pl.BlockSpec((1, tm, cp), lambda b_, i: (b_, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2, cp), lambda b_, i: (b_, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 2, cp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((2, cp), jnp.float32)],
        interpret=interpret,
    )(xm)
    y = pl.pallas_call(
        functools.partial(_apply_kernel, relu=relu),
        grid=(b, nm),
        in_specs=[
            pl.BlockSpec((1, tm, cp), lambda b_, i: (b_, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, cp), lambda b_, i: (b_, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tm, cp), lambda b_, i: (b_, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, mp, cp), x.dtype),
        interpret=interpret,
    )(xm, stats_packed)
    # slot 0 holds the folded (mean, rsqrt) — the VJP residual layout
    stats = stats_packed[:, :, :c]
    return y.reshape(b, h, w, c), stats


def instance_norm_apply(x, stats, relu: bool = False, interpret=None):
    """Apply-only instance norm: normalize x by precomputed per-(sample,
    channel) (mean, rsqrt) stats — e.g. from conv3x3_stats' free epilogue —
    in ONE read + one write (no stats pass). Forward-only building block;
    lane-packs like the fused kernel."""
    interpret = _auto_interpret(interpret)
    b, h, w, c = x.shape
    m = h * w
    pack = 128 // c if (c < 128 and 128 % c == 0) else 1
    while pack > 1 and m % pack != 0:
        pack //= 2
    mp, cp = m // pack, c * pack
    xm = x.reshape(b, mp, cp)
    stats_packed = jnp.tile(stats.astype(jnp.float32), (1, 1, pack))
    tm = _pick_tm(mp)
    nm = (mp + tm - 1) // tm
    y = pl.pallas_call(
        functools.partial(_apply_kernel, relu=relu),
        grid=(b, nm),
        in_specs=[
            pl.BlockSpec((1, tm, cp), lambda b_, i: (b_, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, cp), lambda b_, i: (b_, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tm, cp), lambda b_, i: (b_, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, mp, cp), x.dtype),
        interpret=interpret,
    )(xm, stats_packed)
    return y.reshape(b, h, w, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def instance_norm_fused(x, eps: float = 1e-5, relu: bool = False):
    """Affine-free instance norm (optionally + relu) over [B, H, W, C]."""
    return _norm_impl(x, eps, relu)[0]


def _norm_fwd(x, eps, relu):
    y, stats = _norm_impl(x, eps, relu)
    return y, (x, stats)


def _norm_bwd(eps, relu, res, g):
    x, stats = res
    b, _, _, c = x.shape
    mean = stats[:, 0].reshape(b, 1, 1, c)
    r = stats[:, 1].reshape(b, 1, 1, c)
    x32 = x.astype(jnp.float32)
    yhat = (x32 - mean) * r
    g32 = g.astype(jnp.float32)
    if relu:
        g32 = jnp.where(yhat > 0, g32, 0.0)
    gm = jnp.mean(g32, axis=(1, 2), keepdims=True)
    gym = jnp.mean(g32 * yhat, axis=(1, 2), keepdims=True)
    dx = r * (g32 - gm - yhat * gym)
    return (dx.astype(x.dtype),)


instance_norm_fused.defvjp(_norm_fwd, _norm_bwd)
