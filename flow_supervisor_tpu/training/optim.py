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


def _scale_by_adam_tfa(
    b1: float, b2: float, eps: float
) -> optax.GradientTransformation:
    """Adam with the TF-Keras/tfa epsilon placement (reference parity).

    TF 2.5 Keras Adam — which tfa.AdamW extends — folds the bias corrections
    into the step size and applies epsilon to the UNCORRECTED second moment:

        update = m_t * sqrt(1 - b2^t) / (1 - b1^t) / (sqrt(v_t) + eps)

    optax.scale_by_adam instead computes m̂/(sqrt(v̂) + eps) with corrected
    moments — algebraically an effective epsilon of eps*sqrt(1-b2^t), which
    differs by up to ~30x at early steps. The difference only moves elements
    whose |g| is near eps scale (where Adam's scale-invariant update turns fp
    noise into O(lr) steps), but those are exactly the bias-before-norm
    elements the lockstep parity test (tests/test_lockstep_train.py) pins,
    so the trained-with semantics are reproduced exactly.
    """

    def init_fn(params):
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree_util.tree_map(jnp.zeros_like, params),
            nu=jax.tree_util.tree_map(jnp.zeros_like, params),
        )

    def update_fn(updates, state, params=None):
        del params
        count = state.count + 1
        mu = jax.tree_util.tree_map(
            lambda m, g: b1 * m + (1.0 - b1) * g, state.mu, updates
        )
        nu = jax.tree_util.tree_map(
            lambda v, g: b2 * v + (1.0 - b2) * jnp.square(g), state.nu, updates
        )
        t = count.astype(jnp.float32)
        alpha = jnp.sqrt(1.0 - b2**t) / (1.0 - b1**t)
        updates = jax.tree_util.tree_map(
            lambda m, v: alpha * m / (jnp.sqrt(v) + eps), mu, nu
        )
        return updates, optax.ScaleByAdamState(count=count, mu=mu, nu=nu)

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


def _zero_frozen_bn() -> optax.GradientTransformation:
    """Zero the final update for every BatchNorm scale/bias leaf.

    The reference's ``freeze_bn`` (util/train.py:4-12, applied for every
    stage but chairs, train.py:180-181) sets BN layers ``trainable=False``,
    which removes gamma/beta from ``trainable_weights`` ENTIRELY: no
    gradient step and no tfa weight decay — they stay at their
    pretrained values through things/semi/kitti training. Frozen BN still
    has live gradients in this framework (the output is
    gamma*(x-mu_run)/sigma_run + beta), so without this mask those leaves
    would keep training; zeroing the post-decay update reproduces the
    reference exactly while keeping the leaves in the tree/checkpoints.
    """

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params

        def zero(path, u):
            if any("BatchNorm" in str(k) for k in path):
                return jnp.zeros_like(u)
            return u

        return jax.tree_util.tree_map_with_path(zero, updates), state

    return optax.GradientTransformation(init_fn, update_fn)


def adamw(
    lr_fn: Callable,
    wd_fn: Callable,
    clip_norm: float = 1.0,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    freeze_bn: bool = False,
) -> optax.GradientTransformation:
    chain = [
        _clip_per_variable(clip_norm),
        _scale_by_adam_tfa(b1=b1, b2=b2, eps=eps),
        optax.scale_by_schedule(lambda count: -lr_fn(count)),
        _scheduled_decoupled_decay(wd_fn),
    ]
    if freeze_bn:
        chain.append(_zero_frozen_bn())
    return optax.chain(*chain)


def make_optimizer(train_cfg, freeze_bn: bool = False) -> optax.GradientTransformation:
    from flow_supervisor_tpu.training.schedules import build_schedules

    lr_fn, wd_fn = build_schedules(train_cfg)
    return adamw(lr_fn, wd_fn, clip_norm=train_cfg.clip_norm,
                 freeze_bn=freeze_bn)
