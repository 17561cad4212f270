"""Pallas TPU kernel: direct 3x3 stride-1 SAME conv for the encoder stacks.

Why: tools/exp_conv_probe.py (round 5) measured XLA's conv emitter paying
im2col-scale memory traffic at the encoder's high-HW / low-C shapes —
conv64 ([2,224,512,64]->64, 3x3) takes 0.670 ms, the SAME time as the
explicit [M,576]@[576,64] im2col matmul whose x alone is 264 MB, while the
conv's true footprint is 29 MB in + 29 MB out (~0.07 ms at HBM BW). The
emitter also showed mm64 == mm128 wall time (input-traffic-bound): channel
width is free, traffic is the lever.

This kernel streams the (XLA-pre-padded) input ONCE: per grid step it DMAs
one [tr+2, W+2, C] row slab HBM->VMEM, accumulates the nine dy/dx-shifted
[tr*W, C] x [C, Cout] MXU contractions in an f32 register/VMEM accumulator,
adds the bias, and writes the [tr, W, Cout] output tile. Nothing
im2col-sized ever exists — the shifted views live only as VMEM values.

Traffic: read H*W*C once (+ halo rows twice), write H*W*Cout once. At
conv64 shapes that is ~58 MB vs the emitter's effective ~600.

Scope: stride 1, 3x3, SAME, NHWC, C and Cout multiples of 8, H divisible by
a small row tile. The encoder's other convs (7x7/2 stem, 1x1 projections,
3x3/2 downsamples) stay on XLA — they are each a single layer, not a stack.

Backward: custom VJP that simply differentiates the equivalent
``lax.conv_general_dilated`` (XLA's conv backward), so training numerics
are exactly the XLA path's; the kernel is a forward-path substitution.
Reference geometry: raft/smurf_models/raft_extractor.py:266-343.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["conv3x3_fused"]


def _auto_interpret(interpret):
    if interpret is not None:
        return interpret
    return jax.default_backend() not in ("tpu", "axon")


def _pick_tr(h: int, w: int) -> int:
    """Rows per grid step: M = tr*w in [1024, 4096], tr divides h."""
    best = 1
    for tr in (16, 8, 4, 2, 1):
        if h % tr == 0:
            m = tr * w
            if m <= 4096:
                return tr if m >= 512 else max(best, tr)
            best = tr
    return best


def _conv_kernel(prev_ref, cur_ref, next_ref, k_ref, b_ref, o_ref, *, tr, w,
                 c, cout, relu):
    i = pl.program_id(1)
    n = pl.num_programs(1)
    _conv_body(prev_ref, cur_ref, next_ref, k_ref, b_ref, o_ref, None, None,
               i=i, n=n, tr=tr, w=w, c=c, cout=cout, relu=relu, m=0, eps=0.0)


def _conv_stats_kernel(prev_ref, cur_ref, next_ref, k_ref, b_ref, o_ref,
                       s_ref, acc_ref, *, tr, w, c, cout, relu, m, eps):
    """Conv + per-channel (sum, sumsq) epilogue: the instance-norm stats of
    the conv OUTPUT come for free while the tile is still in VMEM, so the
    norm drops its whole stats read pass (one fewer full-activation pass
    per conv+norm pair)."""
    i = pl.program_id(1)
    n = pl.num_programs(1)
    _conv_body(prev_ref, cur_ref, next_ref, k_ref, b_ref, o_ref, s_ref,
               acc_ref, i=i, n=n, tr=tr, w=w, c=c, cout=cout, relu=relu,
               m=m, eps=eps)


def _conv_body(prev_ref, cur_ref, next_ref, k_ref, b_ref, o_ref, s_ref,
               acc_ref, *, i, n, tr, w, c, cout, relu, m, eps):
    # vertical halo from the clamped prev/next row blocks (zero at edges)
    zero_row = jnp.zeros_like(cur_ref[0, 0:1])
    prev_row = jnp.where(i > 0, prev_ref[0, tr - 1:tr], zero_row)
    next_row = jnp.where(i < n - 1, next_ref[0, 0:1], zero_row)
    x = jnp.concatenate([prev_row, cur_ref[0], next_row], axis=0)
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0)))  # [tr+2, w+2, c]
    # one sublane shift per dx (the costly relayout), then dim-0 (free)
    # slices provide the dy taps
    xs = [jax.lax.slice(xp, (0, dx, 0), (tr + 2, dx + w, c))
          for dx in range(3)]
    acc = jnp.zeros((tr * w, cout), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            op = jax.lax.slice(
                xs[dx], (dy, 0, 0), (dy + tr, w, c)
            ).reshape(tr * w, c)
            acc = acc + jax.lax.dot_general(
                op, k_ref[dy, dx],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    acc = acc + b_ref[0].astype(jnp.float32)
    if relu:
        acc = jnp.maximum(acc, 0.0)
    o_ref[0] = acc.reshape(tr, w, cout).astype(o_ref.dtype)
    if s_ref is not None:
        @pl.when(i == 0)
        def _init():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        acc_ref[0:1, :] += jnp.sum(acc, axis=0, keepdims=True)
        acc_ref[1:2, :] += jnp.sum(acc * acc, axis=0, keepdims=True)

        @pl.when(i == n - 1)
        def _emit():
            denom = jnp.float32(m)
            mean = acc_ref[0:1, :] / denom
            var = jnp.maximum(acc_ref[1:2, :] / denom - mean * mean, 0.0)
            s_ref[0, 0:1, :] = mean
            s_ref[0, 1:2, :] = jax.lax.rsqrt(var + eps)


def _conv_reference(x, k, b):
    y = jax.lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    return y + b.astype(jnp.float32)


def _conv_impl(x, k, b, relu, interpret=None):
    interpret = _auto_interpret(interpret)
    bsz, h, w, c = x.shape
    cout = k.shape[-1]
    assert w % 8 == 0, "width must be sublane-aligned"
    tr = _pick_tr(h, w)
    nb = h // tr
    grid = (bsz, nb)
    # Vertical halo via three pipelined row-block views of the SAME array
    # (prev/cur/next, edge-clamped): no manual DMA (whose minor dim must be
    # 128-aligned — C here is 64/96), standard double-buffered pipeline,
    # ~3x nominal input reads that overlap compute and still sit ~6x under
    # the emitter's effective traffic.
    row_spec = lambda off: pl.BlockSpec(
        (1, tr, w, c),
        lambda b_, i: (b_, jnp.clip(i + off, 0, nb - 1), 0, 0),
        memory_space=pltpu.VMEM,
    )
    y = pl.pallas_call(
        functools.partial(_conv_kernel, tr=tr, w=w, c=c, cout=cout, relu=relu),
        grid=grid,
        in_specs=[
            row_spec(-1),
            row_spec(0),
            row_spec(+1),
            pl.BlockSpec((3, 3, c, cout), lambda b_, i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda b_, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tr, w, cout), lambda b_, i: (b_, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, h, w, cout), x.dtype),
        interpret=interpret,
    )(x, x, x, k, b.reshape(1, cout))
    return y


def conv3x3_stats(x, k, b, eps: float = 1e-5, interpret=None):
    """Conv (+bias, NO relu) plus the instance-norm stats of its output:
    returns (y, stats[B, 2, Cout] = (mean, rsqrt(var+eps))). Forward-only
    building block for the conv->instance-norm->relu chain (the norm's
    stats pass becomes free); pair with norm.instance_norm_apply."""
    interpret = _auto_interpret(interpret)
    bsz, h, w, c = x.shape
    cout = k.shape[-1]
    assert w % 8 == 0, "width must be sublane-aligned"
    tr = _pick_tr(h, w)
    nb = h // tr
    grid = (bsz, nb)
    row_spec = lambda off: pl.BlockSpec(
        (1, tr, w, c),
        lambda b_, i: (b_, jnp.clip(i + off, 0, nb - 1), 0, 0),
        memory_space=pltpu.VMEM,
    )
    y, stats = pl.pallas_call(
        functools.partial(_conv_stats_kernel, tr=tr, w=w, c=c, cout=cout,
                          relu=False, m=h * w, eps=eps),
        grid=grid,
        in_specs=[
            row_spec(-1),
            row_spec(0),
            row_spec(+1),
            pl.BlockSpec((3, 3, c, cout), lambda b_, i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda b_, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tr, w, cout), lambda b_, i: (b_, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, cout), lambda b_, i: (b_, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, h, w, cout), x.dtype),
            jax.ShapeDtypeStruct((bsz, 2, cout), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((2, cout), jnp.float32)],
        interpret=interpret,
    )(x, x, x, k, b.reshape(1, cout))
    return y, stats


def _norm_stats_ref(y):
    """fp32 instance-norm stats of y: [B, 2, C] = (mean, rsqrt(var+eps))."""
    y32 = y.astype(jnp.float32)
    mean = jnp.mean(y32, axis=(1, 2))
    var = jnp.maximum(jnp.mean(y32 * y32, axis=(1, 2)) - mean * mean, 0.0)
    return jnp.stack([mean, jax.lax.rsqrt(var + 1e-5)], axis=1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def conv3x3_instnorm_relu(x, k, b, relu: bool = True):
    """conv3x3(+bias) -> affine-free instance norm -> (relu): the encoder's
    hot pair as ONE pallas pass + one apply pass (the norm's stats come from
    the conv kernel's free epilogue — measured 0.788 vs 1.217 ms per pair at
    stage-1 shapes, tools/exp_fuse_convnorm.py). Param-compatible with the
    nn.Conv + Norm composition; backward uses the closed-form instance-norm
    VJP from the saved stats plus XLA's conv transpose (the re-traced conv
    primal is dead-code-eliminated: a linear op's vjp never reads it)."""
    out, _res = _cin_fwd_impl(x, k, b, relu)
    return out


def _cin_fwd_impl(x, k, b, relu):
    if _auto_interpret(None):
        # non-TPU: pure-XLA composition, same numerics
        y = _conv_reference(x, k, b).astype(x.dtype)
        stats = _norm_stats_ref(y)
        mean = stats[:, 0][:, None, None, :]
        r = stats[:, 1][:, None, None, :]
        yhat = (y.astype(jnp.float32) - mean) * r
        out = (jnp.maximum(yhat, 0.0) if relu else yhat).astype(x.dtype)
    elif x.shape[2] % 8 != 0:
        # the pallas CONV pair needs a sublane-aligned width (recipe shapes
        # like 400x720 give stage-2/3 widths 180/90): fall back to exactly
        # the pre-fusion path — XLA conv + the two-pass pallas norm. (An
        # XLA-reduce norm here cost the semi train step 40 ms/step: the
        # layout-sandwich problem the norm kernel exists to avoid.)
        from flow_supervisor_tpu.kernels.norm import _norm_impl

        y = _conv_reference(x, k, b).astype(x.dtype)
        out, stats_n = _norm_impl(y, 1e-5, relu)
        stats = stats_n  # [B, 2, C] (mean, rsqrt) — same layout
    else:
        from flow_supervisor_tpu.kernels.norm import instance_norm_apply

        y, stats = conv3x3_stats(x, k, b)
        out = instance_norm_apply(y, stats, relu=relu)
    return out, (x, k, b, y, stats)


def _cin_fwd(x, k, b, relu):
    return _cin_fwd_impl(x, k, b, relu)


def _cin_bwd(relu, res, g):
    x, k, b, y, stats = res
    bsz, _, _, c = y.shape
    mean = stats[:, 0][:, None, None, :]
    r = stats[:, 1][:, None, None, :]
    yhat = (y.astype(jnp.float32) - mean) * r
    g32 = g.astype(jnp.float32)
    if relu:
        g32 = jnp.where(yhat > 0, g32, 0.0)
    gm = jnp.mean(g32, axis=(1, 2), keepdims=True)
    gym = jnp.mean(g32 * yhat, axis=(1, 2), keepdims=True)
    dy = (r * (g32 - gm - yhat * gym)).astype(y.dtype)

    # dtype-uniform conv for the transpose (a preferred_element_type=f32
    # conv's vjp hands an f32 cotangent to a bf16 transposed conv — XLA
    # rejects the mix); accumulation still happens in the MXU's f32.
    def conv_only(x_, k_, b_):
        return jax.lax.conv_general_dilated(
            x_, k_, window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + b_

    _, vjp = jax.vjp(conv_only, x, k, b)
    return vjp(dy)


conv3x3_instnorm_relu.defvjp(_cin_fwd, _cin_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def conv3x3_fused(x, k, b, relu: bool = False):
    """3x3 stride-1 SAME conv (+bias, optional relu), NHWC bf16/f32.

    Forward runs the pallas streaming kernel; backward differentiates the
    equivalent XLA conv (identical numerics to the non-kernel path).
    """
    return _conv_impl(x, k, b, relu)


def _conv_fwd(x, k, b, relu):
    return _conv_impl(x, k, b, relu), (x, k, b)


def _conv_bwd(relu, res, g):
    x, k, b = res

    def ref(x_, k_, b_):
        y = jax.lax.conv_general_dilated(
            x_, k_, window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + b_  # dtype-uniform: see _cin_bwd
        if relu:
            y = jnp.maximum(y, 0.0)
        return y.astype(g.dtype)

    _, vjp = jax.vjp(ref, x, k, b)
    return vjp(g)


conv3x3_fused.defvjp(_conv_fwd, _conv_bwd)
