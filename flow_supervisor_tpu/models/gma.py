"""GMA (Global Motion Aggregation) variant.

Parity with the reference torch tree (``pytorch/core/gma.py``,
``pytorch/core/gma_update.py:112-139``, ``pytorch/core/gma_network.py:26-129``):

- ``Attention``: 1x1 conv (no bias) -> q, k with ``heads`` heads of dim 128;
  q scaled by dim^-0.5; similarity = content qk (default), optionally replaced by
  or added to a relative-position term (position_only / position_and_content);
  softmax over source pixels.
- ``Aggregate``: 1x1 conv (no bias) -> v; attention-weighted sum; optional
  projection when inner dim != dim; residual with a zero-initialized scalar gamma.
- ``GMAUpdateBlock``: GRU input = context ⊕ motion features ⊕ globally
  aggregated motion features (SepConvGRU input_dim = 128 + hdim + hdim).

The attention map is computed ONCE per forward from the relu'd context features
and reused across refinement iterations (gma_network.py forward).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from flow_supervisor_tpu.models.layers import UpdateConv
from flow_supervisor_tpu.models.update import BasicMotionEncoder, FlowHead, SepConvGRU


class RelPosEmb(nn.Module):
    max_pos_size: int = 160
    dim_head: int = 128

    @nn.compact
    def __call__(self, q):
        # q: [B, heads, h, w, d]
        b, heads, h, w, d = q.shape
        n = 2 * self.max_pos_size - 1
        rel_height = self.param(
            "rel_height", nn.initializers.normal(1.0), (n, self.dim_head)
        )
        rel_width = self.param(
            "rel_width", nn.initializers.normal(1.0), (n, self.dim_head)
        )
        # deltas[i, j] = i - j + max_pos_size - 1
        idx = (
            jax.lax.broadcasted_iota(jnp.int32, (h, h), 0)
            - jax.lax.broadcasted_iota(jnp.int32, (h, h), 1)
            + self.max_pos_size
            - 1
        )
        height_emb = rel_height[idx.reshape(-1)].reshape(h, h, self.dim_head)
        idx_w = (
            jax.lax.broadcasted_iota(jnp.int32, (w, w), 0)
            - jax.lax.broadcasted_iota(jnp.int32, (w, w), 1)
            + self.max_pos_size
            - 1
        )
        width_emb = rel_width[idx_w.reshape(-1)].reshape(w, w, self.dim_head)

        height_score = jnp.einsum("bhxyd,xud->bhxyu", q, height_emb)
        width_score = jnp.einsum("bhxyd,yvd->bhxyv", q, width_emb)
        # [B, heads, x, y, u, v]
        return height_score[..., :, None] + width_score[..., None, :]


class Attention(nn.Module):
    dim: int = 128
    heads: int = 1
    dim_head: int = 128
    max_pos_size: int = 160
    position_only: bool = False
    position_and_content: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, fmap):
        b, h, w, _ = fmap.shape
        inner = self.heads * self.dim_head
        qk = nn.Conv(
            inner * 2, (1, 1), use_bias=False,
            kernel_init=nn.initializers.variance_scaling(1 / 3, "fan_in", "uniform"),
            dtype=self.dtype, param_dtype=jnp.float32,
        )(fmap)
        q, k = jnp.split(qk, 2, axis=-1)
        q = q.reshape(b, h, w, self.heads, self.dim_head).transpose(0, 3, 1, 2, 4)
        k = k.reshape(b, h, w, self.heads, self.dim_head).transpose(0, 3, 1, 2, 4)
        q = q * (self.dim_head**-0.5)

        if self.position_only:
            sim = RelPosEmb(self.max_pos_size, self.dim_head)(q)
        elif self.position_and_content:
            sim = jnp.einsum("bhxyd,bhuvd->bhxyuv", q, k)
            sim = sim + RelPosEmb(self.max_pos_size, self.dim_head)(q)
        else:
            sim = jnp.einsum("bhxyd,bhuvd->bhxyuv", q, k)
        sim = sim.reshape(b, self.heads, h * w, h * w)
        return jax.nn.softmax(sim.astype(jnp.float32), axis=-1).astype(sim.dtype)


class Aggregate(nn.Module):
    dim: int = 128
    heads: int = 1
    dim_head: int = 128
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, attn, fmap):
        b, h, w, _ = fmap.shape
        inner = self.heads * self.dim_head
        v = nn.Conv(
            inner, (1, 1), use_bias=False,
            kernel_init=nn.initializers.variance_scaling(1 / 3, "fan_in", "uniform"),
            dtype=self.dtype, param_dtype=jnp.float32,
        )(fmap)
        v = v.reshape(b, h * w, self.heads, self.dim_head).transpose(0, 2, 1, 3)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, h, w, inner)
        if inner != self.dim:
            out = nn.Conv(
                self.dim, (1, 1), use_bias=False,
                kernel_init=nn.initializers.variance_scaling(1 / 3, "fan_in", "uniform"),
                dtype=self.dtype, param_dtype=jnp.float32,
            )(out)
        gamma = self.param("gamma", nn.initializers.zeros, (1,))
        return fmap + gamma * out


class GMAUpdateBlock(nn.Module):
    hidden_dim: int = 128
    corr_levels: int = 4
    corr_radius: int = 4
    heads: int = 1
    convex_upsampling: bool = True
    upsample_scale: int = 8
    dtype: jnp.dtype = jnp.float32
    dy_major_corr: bool = False

    @nn.compact
    def __call__(self, net, inp, corr, flow, attention):
        motion = BasicMotionEncoder(
            self.corr_levels, self.corr_radius, self.dtype, self.dy_major_corr
        )(flow, corr)
        motion_global = Aggregate(128, self.heads, 128, self.dtype)(attention, motion)
        inp_cat = jnp.concatenate([inp, motion, motion_global], axis=-1)
        net = SepConvGRU(
            self.hidden_dim, 128 + self.hidden_dim + self.hidden_dim, self.dtype
        )(net, inp_cat)
        delta_flow = FlowHead(256, self.hidden_dim, self.dtype)(net)

        mask = None
        if self.convex_upsampling:
            m = nn.relu(UpdateConv(128, 256, 3, self.dtype)(net))
            m = UpdateConv(256, self.upsample_scale**2 * 9, 1, self.dtype)(m)
            mask = 0.25 * m
        return net, mask, delta_flow
