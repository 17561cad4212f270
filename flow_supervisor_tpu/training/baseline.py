"""Supervised (Baseline) training step.

Parity with the reference (``raft/baseline.py:8-55``): one forward over the pair,
gamma-decayed sequence loss vs ground truth (mask from the valid channel), AdamW
with scheduled decoupled weight decay and per-variable clipnorm. The whole step is
one jitted function; under a data-parallel mesh XLA all-reduces gradients over ICI.

Batch contract (matching the reference data layer's dense/sparse examples):
  {'image1': [B,H,W,3] in [0,1], 'image2': ..., 'flow': [B,H,W,2], 'valid': [B,H,W,1]}
"""
from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp

from flow_supervisor_tpu.losses import sequence_loss
from flow_supervisor_tpu.metrics import epe_per_image
from flow_supervisor_tpu.models import RAFT
from flow_supervisor_tpu.training.state import TrainState


def make_train_step(
    model: RAFT,
    loss_type: str = "robust",
    gamma: float = 0.8,
    donate: bool = True,
):
    def train_step(state: TrainState, batch: dict[str, Any]):
        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            mutable = [] if model.cfg.freeze_bn else ["batch_stats"]
            out, updated = model.apply(
                variables,
                batch["image1"],
                batch["image2"],
                train=True,
                mutable=mutable,
            )
            loss = sequence_loss(
                out["flow_up"], batch["flow"], batch.get("valid"), gamma, loss_type
            )
            new_stats = updated.get("batch_stats", state.batch_stats)
            return loss, (new_stats, out)

        (loss, (new_stats, out)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        new_state = state.apply_gradients(grads).replace(batch_stats=new_stats)
        metrics = {
            "loss": loss,
            "epe": jnp.mean(
                epe_per_image(out["flow_up"][-1], batch["flow"], batch.get("valid"))
            ),
        }
        return new_state, metrics

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())
