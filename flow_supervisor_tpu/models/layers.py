"""Shared conv / norm building blocks.

Initialization matches the reference exactly:

- extractor convs (reference ``raft/smurf_models/raft_extractor.py:30-43``):
  kernel ~ VarianceScaling(2.0, fan_out, truncated normal) — He normal fan-out;
  bias ~ U(-1/sqrt(fan_in), 1/sqrt(fan_in)) where fan_in = c_in * kh * kw
  (the reference's VarianceScaling(c_out/(3*c_in*k^2), fan_in, uniform) applied to
  a [c_out] bias reduces to exactly this).
- update convs (reference ``raft/smurf_models/raft_update.py:28-40``):
  kernel ~ VarianceScaling(1/3, fan_in, uniform) = U(-1/sqrt(fan_in), 1/sqrt(fan_in));
  bias as above.

Convs use explicit (torch-style) padding + VALID, matching the reference's manual
``tf.pad`` + VALID geometry, so strided convs downsample exactly like PyTorch RAFT.

InstanceNorm has no affine parameters (center=False, scale=False, eps=1e-5), with
statistics computed in float32 (reference raft_extractor.py:94-116).
"""
from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def extractor_kernel_init():
    return nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal")


def update_kernel_init():
    return nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def conv_bias_init(c_in: int, k_size) -> Callable:
    if isinstance(k_size, (tuple, list)):
        fan_in = c_in * k_size[0] * k_size[1]
    else:
        fan_in = c_in * k_size * k_size
    limit = 1.0 / (fan_in**0.5)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -limit, limit)

    return init


def _pad_for(k_size) -> Sequence[tuple[int, int]]:
    if isinstance(k_size, (tuple, list)):
        kh, kw = k_size
    else:
        kh = kw = k_size
    return ((kh // 2, kh // 2), (kw // 2, kw // 2))


class _FusedConvNormParams(nn.Module):
    """Param holder (kernel/bias, nn.Conv-compatible names/shapes/inits) that
    computes conv3x3 -> instance norm -> relu through the fused pallas pair
    (kernels/conv3x3.py conv3x3_instnorm_relu). Instantiated with
    name="Conv_0" inside ExtractorConv so the parameter tree is IDENTICAL to
    the nn.Conv path (checkpoints/converters/parity tests unaffected)."""

    c_in: int
    c_out: int
    dtype: jnp.dtype
    relu: bool = True

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel", extractor_kernel_init(), (3, 3, self.c_in, self.c_out),
            jnp.float32,
        )
        bias = self.param(
            "bias", conv_bias_init(self.c_in, 3), (self.c_out,), jnp.float32
        )
        from flow_supervisor_tpu.kernels.conv3x3 import conv3x3_instnorm_relu

        return conv3x3_instnorm_relu(
            x.astype(self.dtype), kernel.astype(self.dtype),
            bias.astype(self.dtype), self.relu,
        )


class ExtractorConv(nn.Module):
    """Conv with He-normal fan-out kernel init and torch-style explicit padding.

    ``fuse_instance_norm_relu=True`` (3x3 stride-1 only) computes
    conv -> affine-free instance norm -> relu as one fused pallas pair —
    the caller must then SKIP its Norm(...) call. The norm has no
    parameters, so the parameter tree is unchanged either way."""

    c_in: int
    c_out: int
    k_size: int | tuple[int, int]
    stride: int = 1
    dtype: jnp.dtype = jnp.float32
    fuse_instance_norm_relu: bool = False

    @nn.compact
    def __call__(self, x):
        ks = self.k_size if isinstance(self.k_size, tuple) else (self.k_size, self.k_size)
        if self.fuse_instance_norm_relu:
            assert ks == (3, 3) and self.stride == 1
            return _FusedConvNormParams(
                self.c_in, self.c_out, self.dtype, relu=True, name="Conv_0"
            )(x)
        if ks == (7, 7) and self.stride == 2 and self.c_in <= 4:
            # encoder stem: XLA's own space-to-depth conv emitter at batch 1-2
            # picks interleaved layouts that poison the stem norm/relu and the
            # first residual stage (~8 ms/fwd by profile). Explicit s2d turns
            # it into one [M, 4*cin*16] x [., c_out] MXU matmul with row-major
            # in/out layouts.
            return _S2DStemConv(
                features=self.c_out,
                kernel_init=extractor_kernel_init(),
                bias_init=conv_bias_init(self.c_in, self.k_size),
                dtype=self.dtype,
                name="Conv_0",
            )(x)
        # NOTE: tap-accumulated and im2col matmul lowerings were both measured
        # SLOWER than XLA's conv emitter for the wide-channel residual-stage
        # convs (taps: 9 materialized 29 MB slices + f32 partial-sum chains,
        # ~12 ms/fwd; im2col: 132 MB cols). Only the stem (above) wins.
        return nn.Conv(
            self.c_out,
            kernel_size=ks,
            strides=(self.stride, self.stride),
            padding=_pad_for(self.k_size),
            kernel_init=extractor_kernel_init(),
            bias_init=conv_bias_init(self.c_in, self.k_size),
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)


class _MxuConv(nn.Module):
    """Drop-in for ``nn.Conv`` (same param names/shapes/inits) that lowers the
    stride-1 conv as explicit MXU matmuls instead of ``lax.conv``.

    Why: at batch 1 with h/8-scale spatial dims, XLA's TPU conv emitters pick
    vector-path/transposed-layout lowerings for the update-block convs — the
    profile shows ~1.1 ms for a (1,5) GRU conv whose matmul form costs ~25 us,
    and ~0.3 ms for the 2-channel flow head conv. Two lowering routes:

    - kh*kw*cin <= IM2COL_MAX: one im2col dot [B*H*W, kh*kw*cin] @ [., cout]
      (small-K taps, e.g. the 7x7 conv on 2-channel flow, need the single
      big-K dot).
    - else: tap accumulation sum_ij shift(x, ij) @ kernel[i, j] — k matmuls
      with K=cin, N=cout, M=B*H*W, all MXU-shaped.

    Tiny output-channel counts (the flow head's 2) are zero-padded to 16 so
    the dot keeps an MXU-worthy N; barriers stop the algebraic simplifier from
    pushing the output slice back into the weights. Accumulation is fp32.
    Parameter shapes are unchanged, so checkpoint converters and parity tests
    are unaffected."""

    features: int
    kernel_size: tuple[int, int]
    padding: Sequence[tuple[int, int]]
    kernel_init: Callable
    bias_init: Callable
    dtype: jnp.dtype
    strides: tuple[int, int] = (1, 1)
    # taps=True: accumulate k matmuls over kernel taps instead of one im2col
    # dot — no [*, kh*kw*cin] materialization, for big-spatial encoder convs
    taps: bool = False

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        cin = x.shape[-1]
        kshape = (kh, kw, cin, self.features)
        kernel = self.param("kernel", self.kernel_init, kshape, jnp.float32)
        bias = self.param("bias", self.bias_init, (self.features,), jnp.float32)

        n_pad = 16 if self.features < 8 else self.features
        k = kernel.astype(self.dtype)
        if n_pad != self.features:
            k = jax.lax.optimization_barrier(
                jnp.pad(k, ((0, 0), (0, 0), (0, 0), (0, n_pad - self.features)))
            )

        (ph0, ph1), (pw0, pw1) = self.padding
        sh, sw = self.strides
        xp = jnp.pad(x.astype(self.dtype), ((0, 0), (ph0, ph1), (pw0, pw1), (0, 0)))
        b, hp, wp, _ = xp.shape
        h, w = (hp - kh) // sh + 1, (wp - kw) // sw + 1
        m = b * h * w

        def tap(i, j):
            return jax.lax.slice(
                xp,
                (0, i, j, 0),
                (b, i + (h - 1) * sh + 1, j + (w - 1) * sw + 1, cin),
                (1, sh, sw, 1),
            )

        if self.taps:
            y = jnp.zeros((m, n_pad), jnp.float32)
            for i in range(kh):
                for j in range(kw):
                    y = y + jax.lax.dot_general(
                        tap(i, j).reshape(m, cin),
                        k[i, j],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
        else:
            cols = jnp.concatenate(
                [tap(i, j) for i in range(kh) for j in range(kw)], axis=-1
            ).reshape(m, kh * kw * cin)
            y = jax.lax.dot_general(
                cols,
                k.reshape(kh * kw * cin, n_pad),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        if n_pad != self.features:
            y = jax.lax.optimization_barrier(y)[:, : self.features]
        y = y.astype(self.dtype) + bias.astype(self.dtype)
        return y.reshape(b, h, w, self.features)


class _S2DStemConv(nn.Module):
    """7x7 stride-2 'SAME' conv (pad 3) lowered via explicit space-to-depth.

    Parameters are identical to ``nn.Conv`` ([7,7,cin,cout] kernel + bias);
    the kernel is zero-padded to 8x8 at apply time and regrouped into a 4x4
    conv over the 2x2-phase s2d input, which lowers as a single im2col matmul
    [B*ho*wo, 16*4*cin] @ [16*4*cin, cout] — MXU-shaped, with row-major
    layouts on both sides (exact: the pad taps multiply zeros)."""

    features: int
    kernel_init: Callable
    bias_init: Callable
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        b, h, w, cin = x.shape
        kernel = self.param(
            "kernel", self.kernel_init, (7, 7, cin, self.features), jnp.float32
        )
        bias = self.param("bias", self.bias_init, (self.features,), jnp.float32)

        ho, wo = (h + 6 - 7) // 2 + 1, (w + 6 - 7) // 2 + 1
        # s2d rows ri = i + da (da<4) reach ho+2; cover 2*(ho+3) source rows
        need_h, need_w = 2 * (ho + 4), 2 * (wo + 4)
        xp = jnp.pad(
            x.astype(self.dtype),
            ((0, 0), (3, need_h - h - 3), (3, need_w - w - 3), (0, 0)),
        )
        xs = (
            xp.reshape(b, need_h // 2, 2, need_w // 2, 2, cin)
            .transpose(0, 1, 3, 2, 4, 5)
            .reshape(b, need_h // 2, need_w // 2, 4 * cin)
        )
        # y[i,j] = sum_{da,db,pa,pb} xs[i+da, j+db, (pa,pb)] k[2da+pa, 2db+pb]
        cols = jnp.concatenate(
            [
                xs[:, da : da + ho, db : db + wo, :]
                for da in range(4)
                for db in range(4)
            ],
            axis=-1,
        ).reshape(b * ho * wo, 16 * 4 * cin)
        k2 = (
            jnp.pad(kernel, ((0, 1), (0, 1), (0, 0), (0, 0)))
            .reshape(4, 2, 4, 2, cin, self.features)
            .transpose(0, 2, 1, 3, 4, 5)  # [da, db, pa, pb, cin, cout]
            .reshape(16 * 4 * cin, self.features)
        )
        y = jax.lax.dot_general(
            cols,
            k2.astype(self.dtype),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        y = y.astype(self.dtype) + bias.astype(self.dtype)
        return y.reshape(b, ho, wo, self.features)


class _Perm1x1(nn.Module):
    """1x1 conv (``nn.Conv``-compatible params) whose INPUT channels are
    permuted at apply time. Lets a producer emit channels in its fast native
    order (e.g. the corr lookup's dy-major windows) while the stored weights
    keep the reference's canonical order — the permutation is folded into the
    weight matrix, so checkpoints and converters are untouched."""

    features: int
    kernel_init: Callable
    bias_init: Callable
    dtype: jnp.dtype
    perm: tuple

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        assert len(self.perm) == cin, (len(self.perm), cin)
        kernel = self.param(
            "kernel", self.kernel_init, (1, 1, cin, self.features), jnp.float32
        )
        bias = self.param("bias", self.bias_init, (self.features,), jnp.float32)
        w = kernel[0, 0][jnp.asarray(self.perm), :]
        b, h, wd, _ = x.shape
        y = jax.lax.dot_general(
            x.reshape(-1, cin).astype(self.dtype),
            w.astype(self.dtype),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        y = y.astype(self.dtype) + bias.astype(self.dtype)
        return y.reshape(b, h, wd, self.features)


class UpdateConv(nn.Module):
    """Conv with uniform +-1/sqrt(fan_in) init (reference update-block convs)."""

    c_in: int
    c_out: int
    k_size: int | tuple[int, int]
    dtype: jnp.dtype = jnp.float32
    in_perm: tuple | None = None  # 1x1 only: apply-time input permutation

    @nn.compact
    def __call__(self, x):
        ks = self.k_size if isinstance(self.k_size, tuple) else (self.k_size, self.k_size)
        if self.in_perm is not None:
            assert ks == (1, 1), ks
            return _Perm1x1(
                features=self.c_out,
                kernel_init=update_kernel_init(),
                bias_init=conv_bias_init(self.c_in, self.k_size),
                dtype=self.dtype,
                perm=self.in_perm,
                name="Conv_0",
            )(x)
        if (ks != (1, 1) and self.c_in >= 64) or self.c_out < 8:
            # wide-channel non-1x1 update-block convs: explicit MXU matmul
            # lowering (XLA's conv emitters are vector-path at these shapes;
            # see _MxuConv). 1x1 convs already lower to clean matmuls, and
            # tiny-cin convs (the 7x7 on 2-channel flow) are cheap on the
            # vector path but terrible as 2-lane-stripe im2col concats.
            return _MxuConv(
                features=self.c_out,
                kernel_size=ks,
                padding=tuple(_pad_for(self.k_size)),
                kernel_init=update_kernel_init(),
                bias_init=conv_bias_init(self.c_in, self.k_size),
                dtype=self.dtype,
                name="Conv_0",
            )(x)
        return nn.Conv(
            self.c_out,
            kernel_size=ks,
            strides=(1, 1),
            padding=_pad_for(self.k_size),
            kernel_init=update_kernel_init(),
            bias_init=conv_bias_init(self.c_in, self.k_size),
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)


def instance_norm(x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """Per-sample, per-channel spatial normalization without affine params.

    Stats accumulate in float32 via reduction dtypes and the E[x^2]-E[x]^2
    identity rather than materializing a float32 copy of x: the naive
    (x32 - mean)^2 form made XLA materialize x32 AND its square as full
    [B,H,W,C] float32 tensors in a transposed layout (~0.73 ms per norm at
    448x1024 by profile, vs ~0.08 ms bandwidth-bound). Accuracy holds: with
    fp32 accumulation the cancellation error is ~(mean/sigma)^2 * 2^-24,
    negligible at activation scales, and the torch golden-parity tests
    (<2e-3 px) pin it.
    """
    b, h, w, c = x.shape
    x32 = x.astype(jnp.float32)
    # ONE variadic reduce for (sum, sum_sq): separate jnp.mean calls made XLA
    # materialize full-size f32 x and x^2 (multi-consumer fusion outputs,
    # ~119 MB at stem shapes) before reducing
    s1, s2 = jax.lax.reduce(
        (x32, x32 * x32),
        (jnp.float32(0), jnp.float32(0)),
        lambda a, b_: (a[0] + b_[0], a[1] + b_[1]),
        dimensions=(1, 2),
    )
    denom = jnp.float32(h * w)
    mean = (s1 / denom)[:, None, None, :]
    var = jnp.maximum(s2[:, None, None, :] / denom - jnp.square(mean), 0.0)
    return ((x32 - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


class Norm(nn.Module):
    """Dispatch over the reference's norm_fn choices: instance / batch / group
    / none.

    ``relu=True`` applies the trailing activation INSIDE the norm: on TPU
    backends the instance-norm + relu pair lowers to a two-pass pallas kernel
    (kernels/norm.py) — the XLA lowering's reduce/normalize layout pivots cost
    ~18.7 ms/fwd at 448x1024 (measured by interleaved A/B,
    tools/bench_norm_ab.py) vs ~1 ms bandwidth-bound. ``fused=False`` keeps
    the pure-XLA path (required under SPMD sharding, where the spatial mean
    must become a cross-device collective — parallel/spatial.py)."""

    kind: str
    dtype: jnp.dtype = jnp.float32
    num_groups: int = 8
    fused: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False, relu: bool = False):
        if self.kind == "instance" and self.fused and (
            jax.default_backend() in ("tpu", "axon")
        ):
            from flow_supervisor_tpu.kernels.norm import instance_norm_fused

            return instance_norm_fused(x, relu=relu)
        y = self._norm(x, train)
        return nn.relu(y) if relu else y

    def _norm(self, x, train):
        if self.kind == "none":
            return x
        if self.kind == "instance":
            return instance_norm(x)
        if self.kind == "batch":
            return nn.BatchNorm(
                use_running_average=not train,
                momentum=0.99,
                epsilon=1e-5,
                dtype=self.dtype,
                param_dtype=jnp.float32,
            )(x)
        if self.kind == "group":
            return nn.GroupNorm(
                num_groups=self.num_groups,
                epsilon=1e-5,
                dtype=self.dtype,
                param_dtype=jnp.float32,
            )(x)
        raise ValueError(f"norm_fn {self.kind} not implemented")
