"""RAFT recurrent update blocks.

Architecture parity with the reference (``raft/smurf_models/raft_update.py``):

- ``BasicMotionEncoder``: corr -> 1x1 conv 256 -> 3x3 conv 192; flow -> 7x7 conv
  128 -> 3x3 conv 64; concat -> 3x3 conv 126; concat raw flow => 128 channels.
- ``SepConvGRU``: gated GRU with a horizontal (1x5) then vertical (5x1) pass.
- ``FlowHead``: 3x3 conv -> 256 -> relu -> 3x3 conv -> 2.
- ``BasicUpdateBlock``: motion encoder + GRU(input = context 128 + motion 128) +
  flow head + convex-upsampling mask head (3x3 conv 256 -> relu -> 1x1 conv 576)
  scaled by 0.25 to balance gradients (raft_update.py:204-208).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from flow_supervisor_tpu.models.layers import UpdateConv


class ConvGRU(nn.Module):
    hidden_dim: int = 128
    input_dim: int = 192 + 128
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, h, x):
        cin = self.hidden_dim + self.input_dim
        hx = jnp.concatenate([h, x], axis=-1)
        z = nn.sigmoid(UpdateConv(cin, self.hidden_dim, 3, self.dtype)(hx))
        r = nn.sigmoid(UpdateConv(cin, self.hidden_dim, 3, self.dtype)(hx))
        q = nn.tanh(
            UpdateConv(cin, self.hidden_dim, 3, self.dtype)(
                jnp.concatenate([r * h, x], axis=-1)
            )
        )
        return (1.0 - z) * h + z * q


class SepConvGRU(nn.Module):
    hidden_dim: int = 128
    input_dim: int = 192 + 128
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, h, x):
        cin = self.hidden_dim + self.input_dim
        # horizontal pass (1x5)
        hx = jnp.concatenate([h, x], axis=-1)
        z = nn.sigmoid(UpdateConv(cin, self.hidden_dim, (1, 5), self.dtype)(hx))
        r = nn.sigmoid(UpdateConv(cin, self.hidden_dim, (1, 5), self.dtype)(hx))
        q = nn.tanh(
            UpdateConv(cin, self.hidden_dim, (1, 5), self.dtype)(
                jnp.concatenate([r * h, x], axis=-1)
            )
        )
        h = (1.0 - z) * h + z * q
        # vertical pass (5x1)
        hx = jnp.concatenate([h, x], axis=-1)
        z = nn.sigmoid(UpdateConv(cin, self.hidden_dim, (5, 1), self.dtype)(hx))
        r = nn.sigmoid(UpdateConv(cin, self.hidden_dim, (5, 1), self.dtype)(hx))
        q = nn.tanh(
            UpdateConv(cin, self.hidden_dim, (5, 1), self.dtype)(
                jnp.concatenate([r * h, x], axis=-1)
            )
        )
        return (1.0 - z) * h + z * q


class FlowHead(nn.Module):
    hidden_dim: int = 256
    input_dim: int = 128
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.relu(UpdateConv(self.input_dim, self.hidden_dim, 3, self.dtype)(x))
        return UpdateConv(self.hidden_dim, 2, 3, self.dtype)(y)


def corr_perm(levels: int, radius: int) -> tuple:
    """Permutation mapping dy-major window channels onto the reference's
    dx-major weight rows: feeding dy-major corr through weights W[perm] equals
    feeding dx-major corr through W (kernels/corr_lookup_v2.py dy_major)."""
    k = 2 * radius + 1
    return tuple(
        l * k * k + dx * k + dy
        for l in range(levels)
        for dy in range(k)
        for dx in range(k)
    )


class BasicMotionEncoder(nn.Module):
    corr_levels: int = 4
    corr_radius: int = 4
    dtype: jnp.dtype = jnp.float32
    dy_major_corr: bool = False

    @nn.compact
    def __call__(self, flow, corr):
        cor_planes = self.corr_levels * (2 * self.corr_radius + 1) ** 2
        perm = (
            corr_perm(self.corr_levels, self.corr_radius)
            if self.dy_major_corr
            else None
        )
        cor = nn.relu(UpdateConv(cor_planes, 256, 1, self.dtype, in_perm=perm)(corr))
        cor = nn.relu(UpdateConv(256, 192, 3, self.dtype)(cor))
        flo = nn.relu(UpdateConv(2, 128, 7, self.dtype)(flow))
        flo = nn.relu(UpdateConv(128, 64, 3, self.dtype)(flo))
        out = nn.relu(
            UpdateConv(64 + 192, 128 - 2, 3, self.dtype)(
                jnp.concatenate([cor, flo], axis=-1)
            )
        )
        return jnp.concatenate([out, flow], axis=-1)


class SmallMotionEncoder(nn.Module):
    corr_levels: int = 4
    corr_radius: int = 3
    dtype: jnp.dtype = jnp.float32
    dy_major_corr: bool = False

    @nn.compact
    def __call__(self, flow, corr):
        cor_planes = self.corr_levels * (2 * self.corr_radius + 1) ** 2
        perm = (
            corr_perm(self.corr_levels, self.corr_radius)
            if self.dy_major_corr
            else None
        )
        cor = nn.relu(UpdateConv(cor_planes, 96, 1, self.dtype, in_perm=perm)(corr))
        flo = nn.relu(UpdateConv(96, 64, 7, self.dtype)(flow))
        flo = nn.relu(UpdateConv(64, 32, 3, self.dtype)(flo))
        out = nn.relu(
            UpdateConv(32, 80, 3, self.dtype)(jnp.concatenate([cor, flo], axis=-1))
        )
        return jnp.concatenate([out, flow], axis=-1)


class BasicUpdateBlock(nn.Module):
    hidden_dim: int = 128
    corr_levels: int = 4
    corr_radius: int = 4
    convex_upsampling: bool = True
    upsample_scale: int = 8
    dtype: jnp.dtype = jnp.float32
    dy_major_corr: bool = False

    @nn.compact
    def __call__(self, net, inp, corr, flow):
        motion = BasicMotionEncoder(
            self.corr_levels, self.corr_radius, self.dtype, self.dy_major_corr
        )(flow, corr)
        inp = jnp.concatenate([inp, motion], axis=-1)
        net = SepConvGRU(self.hidden_dim, 128 + self.hidden_dim, self.dtype)(net, inp)
        delta_flow = FlowHead(256, self.hidden_dim, self.dtype)(net)

        mask = None
        if self.convex_upsampling:
            m = nn.relu(UpdateConv(128, 256, 3, self.dtype)(net))
            m = UpdateConv(256, self.upsample_scale**2 * 9, 1, self.dtype)(m)
            mask = 0.25 * m
        return net, mask, delta_flow


class SmallUpdateBlock(nn.Module):
    hidden_dim: int = 96
    corr_levels: int = 4
    corr_radius: int = 3
    dtype: jnp.dtype = jnp.float32
    dy_major_corr: bool = False

    @nn.compact
    def __call__(self, net, inp, corr, flow):
        motion = SmallMotionEncoder(
            self.corr_levels, self.corr_radius, self.dtype, self.dy_major_corr
        )(flow, corr)
        inp = jnp.concatenate([inp, motion], axis=-1)
        net = ConvGRU(self.hidden_dim, 82 + 64, self.dtype)(net, inp)
        delta_flow = FlowHead(128, self.hidden_dim, self.dtype)(net)
        return net, None, delta_flow
