"""RAFT feature / context encoders.

Architecture parity with the reference (``raft/smurf_models/raft_extractor.py``):

- ``BasicEncoder``: 7x7 s2 conv (pad 3) -> norm -> relu -> 3 residual stages
  (64 s1, 96 s2, 128 s2; two ResidualBlocks each) -> 1x1 conv to output_dim ->
  dropout. fnet uses instance norm / output 256; cnet uses batch norm /
  output 256 (= hidden 128 + context 128).
- ``SmallEncoder``: 7x7 s2 -> bottleneck stages 32/64/96 -> 1x1 to output_dim.
- residual blocks downsample the skip with a strided 1x1 conv + norm when
  stride != 1 (raft_extractor.py:125-141).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from flow_supervisor_tpu.models.layers import ExtractorConv, Norm


class ResidualBlock(nn.Module):
    in_planes: int
    planes: int
    norm: str = "batch"
    stride: int = 1
    dtype: jnp.dtype = jnp.float32
    fused_norm: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        ng, fused = self.planes // 8, self.fused_norm
        # conv3x3+instance-norm+relu pairs lower to the fused pallas pair
        # (stats from the conv epilogue; 0.79 vs 1.22 ms/pair measured) —
        # only on TPU backends, and only where the fused norm is allowed
        # (fused_norm=False under SPMD, models/raft.py fused_norm note)
        fuse_pair = (
            self.norm == "instance" and fused
            and jax.default_backend() in ("tpu", "axon")
        )
        y = ExtractorConv(
            self.in_planes, self.planes, 3, self.stride, self.dtype,
            fuse_instance_norm_relu=fuse_pair and self.stride == 1,
        )(x)
        if not (fuse_pair and self.stride == 1):
            y = Norm(self.norm, self.dtype, ng, fused)(y, train, relu=True)
        y = ExtractorConv(self.planes, self.planes, 3, 1, self.dtype,
                          fuse_instance_norm_relu=fuse_pair)(y)
        if not fuse_pair:
            y = Norm(self.norm, self.dtype, ng, fused)(y, train, relu=True)

        if self.stride != 1:
            x = ExtractorConv(self.in_planes, self.planes, 1, self.stride, self.dtype)(x)
            x = Norm(self.norm, self.dtype, ng, fused)(x, train)
        return nn.relu(x + y)


class BottleneckBlock(nn.Module):
    in_planes: int
    planes: int
    norm: str = "group"
    stride: int = 1
    dtype: jnp.dtype = jnp.float32
    fused_norm: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = self.planes // 4
        ng, fused = self.planes // 8, self.fused_norm
        y = ExtractorConv(self.in_planes, hidden, 1, 1, self.dtype)(x)
        y = Norm(self.norm, self.dtype, ng, fused)(y, train, relu=True)
        y = ExtractorConv(hidden, hidden, 3, self.stride, self.dtype)(y)
        y = Norm(self.norm, self.dtype, ng, fused)(y, train, relu=True)
        y = ExtractorConv(hidden, self.planes, 1, 1, self.dtype)(y)
        y = Norm(self.norm, self.dtype, ng, fused)(y, train, relu=True)

        if self.stride != 1:
            x = ExtractorConv(self.in_planes, self.planes, 1, self.stride, self.dtype)(x)
            x = Norm(self.norm, self.dtype, ng, fused)(x, train)
        return nn.relu(x + y)


class BasicEncoder(nn.Module):
    output_dim: int = 128
    norm: str = "none"
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    fused_norm: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        fused = self.fused_norm
        x = ExtractorConv(3, 64, 7, 2, self.dtype)(x)
        x = Norm(self.norm, self.dtype, 8, fused)(x, train, relu=True)

        in_planes = 64
        for dim, stride in ((64, 1), (96, 2), (128, 2)):
            x = ResidualBlock(in_planes, dim, self.norm, stride, self.dtype,
                              fused)(x, train)
            x = ResidualBlock(dim, dim, self.norm, 1, self.dtype, fused)(x, train)
            in_planes = dim

        x = ExtractorConv(128, self.output_dim, 1, 1, self.dtype)(x)
        if self.dropout > 0:
            x = nn.Dropout(rate=self.dropout, deterministic=not train)(x)
        return x


class SmallEncoder(nn.Module):
    output_dim: int = 128
    norm: str = "batch"
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    fused_norm: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        fused = self.fused_norm
        x = ExtractorConv(3, 32, 7, 2, self.dtype)(x)
        x = Norm(self.norm, self.dtype, 8, fused)(x, train, relu=True)

        in_planes = 32
        for dim, stride in ((32, 1), (64, 2), (96, 2)):
            x = BottleneckBlock(in_planes, dim, self.norm, stride, self.dtype,
                                fused)(x, train)
            x = BottleneckBlock(dim, dim, self.norm, 1, self.dtype,
                                fused)(x, train)
            in_planes = dim

        return ExtractorConv(96, self.output_dim, 1, 1, self.dtype)(x)
