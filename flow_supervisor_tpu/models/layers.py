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


class ExtractorConv(nn.Module):
    """Conv with He-normal fan-out kernel init and torch-style explicit padding."""

    c_in: int
    c_out: int
    k_size: int | tuple[int, int]
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(
            self.c_out,
            kernel_size=self.k_size if isinstance(self.k_size, tuple) else (self.k_size, self.k_size),
            strides=(self.stride, self.stride),
            padding=_pad_for(self.k_size),
            kernel_init=extractor_kernel_init(),
            bias_init=conv_bias_init(self.c_in, self.k_size),
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)


class UpdateConv(nn.Module):
    """Conv with uniform +-1/sqrt(fan_in) init (reference update-block convs)."""

    c_in: int
    c_out: int
    k_size: int | tuple[int, int]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(
            self.c_out,
            kernel_size=self.k_size if isinstance(self.k_size, tuple) else (self.k_size, self.k_size),
            strides=(1, 1),
            padding=_pad_for(self.k_size),
            kernel_init=update_kernel_init(),
            bias_init=conv_bias_init(self.c_in, self.k_size),
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)


def instance_norm(x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """Per-sample, per-channel spatial normalization without affine params."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=(1, 2), keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=(1, 2), keepdims=True)
    return ((x32 - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


class Norm(nn.Module):
    """Dispatch over the reference's norm_fn choices: instance / batch / group / none."""

    kind: str
    dtype: jnp.dtype = jnp.float32
    num_groups: int = 8

    @nn.compact
    def __call__(self, x, train: bool = False):
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
