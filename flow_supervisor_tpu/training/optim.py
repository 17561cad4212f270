"""Optimizer: AdamW with scheduled decoupled weight decay and global-norm clipping.

Parity with ``tfa.optimizers.AdamW(weight_decay=wd_schedule, learning_rate=lr_schedule,
epsilon=1e-8, clipnorm=1.0)`` (reference train.py:170-175). tfa's decay step is
``var -= wd(t) * var`` INDEPENDENT of the learning rate (decay magnitude is not
multiplied by lr — the reference bakes lr into the wd schedule instead), and decay
applies to every trainable variable including norm scales and biases. Per-variable
clipnorm? No: Keras `clipnorm` clips each gradient tensor to its own norm
(per-variable), NOT the global norm — reproduced here with `clip_by_norm` per leaf.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax


def _clip_per_variable(max_norm: float) -> optax.GradientTransformation:
    """Keras-style clipnorm: clip each gradient tensor to max_norm by its own l2."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params

        def clip(g):
            norm = jnp.sqrt(jnp.sum(jnp.square(g.astype(jnp.float32))))
            scale = jnp.minimum(1.0, max_norm / jnp.maximum(norm, 1e-12))
            return (g * scale).astype(g.dtype)

        return jax.tree_util.tree_map(clip, updates), state

    return optax.GradientTransformation(init_fn, update_fn)


def _scheduled_decoupled_decay(wd_fn: Callable) -> optax.GradientTransformation:
    """Append -wd(t) * param to the (already lr-scaled) updates."""

    def init_fn(params):
        del params
        return optax.ScaleByScheduleState(count=jnp.zeros([], jnp.int32))

    def update_fn(updates, state, params):
        wd = wd_fn(state.count)
        updates = jax.tree_util.tree_map(
            lambda u, p: u - wd * p.astype(u.dtype), updates, params
        )
        return updates, optax.ScaleByScheduleState(count=state.count + 1)

    return optax.GradientTransformation(init_fn, update_fn)


def adamw(
    lr_fn: Callable,
    wd_fn: Callable,
    clip_norm: float = 1.0,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
) -> optax.GradientTransformation:
    return optax.chain(
        _clip_per_variable(clip_norm),
        optax.scale_by_adam(b1=b1, b2=b2, eps=eps),
        optax.scale_by_schedule(lambda count: -lr_fn(count)),
        _scheduled_decoupled_decay(wd_fn),
    )


def make_optimizer(train_cfg) -> optax.GradientTransformation:
    from flow_supervisor_tpu.training.schedules import build_schedules

    lr_fn, wd_fn = build_schedules(train_cfg)
    return adamw(lr_fn, wd_fn, clip_norm=train_cfg.clip_norm)
