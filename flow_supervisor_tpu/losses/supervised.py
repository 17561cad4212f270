"""Supervised sequence losses.

Parity with the reference (``raft/loss.py:4-93``) — note the penalties are
ELEMENTWISE per flow channel, then averaged over the channel axis:

- L1:     mean_c |d_c|
- L2:     mean_c d_c^2
- robust: mean_c sqrt(d_c^2 + 0.001^2)   (per-channel Charbonnier, NOT the norm)

each multiplied by mask AND the large-displacement cutoff ||gt||_2 < 400
(loss.py:24-26), and finally reduced by a plain global mean (Keras Loss default
reduction over the returned per-pixel map) — a mask-multiplied mean, not a
mask-weighted mean.

Sequence loss = sum_i gamma^(N-1-i) * loss_i over the prediction sequence
(exponential decay, reference baseline.py:17-31). Predictions are stacked
[iters, B, H, W, 2].
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

MAX_FLOW = 400.0


def _mask(flow_gt: jax.Array, valid: jax.Array | None) -> jax.Array:
    mag = jnp.sqrt(jnp.sum(jnp.square(flow_gt), axis=-1, keepdims=True))
    m = (mag < MAX_FLOW).astype(jnp.float32)
    if valid is not None:
        m = m * valid.astype(jnp.float32)
    return m


def flow_loss_l1(pred, flow_gt, valid=None):
    a = jnp.abs(pred - flow_gt) * _mask(flow_gt, valid)
    return jnp.mean(a)


def flow_loss_l2(pred, flow_gt, valid=None):
    a = jnp.square(pred - flow_gt) * _mask(flow_gt, valid)
    return jnp.mean(a)


def flow_loss_robust(pred, flow_gt, valid=None):
    a = jnp.sqrt(jnp.square(pred - flow_gt) + 0.001**2) * _mask(flow_gt, valid)
    return jnp.mean(a)


LOSSES: dict[str, Callable] = {
    "l1": flow_loss_l1,
    "l2": flow_loss_l2,
    "robust": flow_loss_robust,
}


def sequence_loss(
    preds: jax.Array,
    flow_gt: jax.Array,
    valid: jax.Array | None = None,
    gamma: float = 0.8,
    loss: str | Callable = "robust",
) -> jax.Array:
    """gamma-decayed sum of per-iteration losses; preds: [iters, B, H, W, 2]."""
    fn = LOSSES[loss] if isinstance(loss, str) else loss
    n = preds.shape[0]
    weights = jnp.asarray([gamma ** (n - 1 - i) for i in range(n)], jnp.float32)
    per_iter = jax.vmap(lambda p: fn(p, flow_gt, valid))(preds)
    return jnp.sum(weights * per_iter)
