"""Unsupervised (SMURF-style) training step.

Parity with the reference (``raft/unsup.py:181-223``): the teacher is the SAME
network run on the original (uncropped) images with no gradient; the student runs
on the augmented crop; the unsupervised sequence loss (census + smoothness +
selfsup, per-update decay) supervises the student, with the full-size warping
branch fed by the originals and crop offsets.

Batch contract: {'image1','image2','orig_image1','orig_image2','crop_yx'} and
optionally {'flow','valid'} (for the EPE metric only — never for the loss).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from flow_supervisor_tpu.losses.unsupervised import (
    UnsupLossConfig,
    unsupervised_sequence_loss,
)
from flow_supervisor_tpu.metrics import epe_per_image
from flow_supervisor_tpu.models import RAFT
from flow_supervisor_tpu.ops.pad import crop_bboxes
from flow_supervisor_tpu.training.state import TrainState


def make_unsup_train_step(model: RAFT, model_cfg, donate: bool = True):
    mc = model_cfg
    cfg = UnsupLossConfig(
        census=mc.census_weight,
        smooth1=mc.smooth1_weight,
        smooth2=mc.smooth2_weight,
        selfsup=mc.selfsup_weight,
        occlusion=mc.occlusion,
        gamma=mc.unsup_loss_decay_rate,
    )

    def fwd(params, batch_stats, image1, image2, train):
        """Returns (out, new_batch_stats); stats pass through unchanged when BN
        is frozen (every non-chairs stage, reference train.py:180-181)."""
        variables = {"params": params, "batch_stats": batch_stats}
        if model.cfg.freeze_bn or not train:
            out = model.apply(
                variables, image1, image2, train=train, use_bw=True,
                method="unsup_forward",
            )
            return out, batch_stats
        out, updated = model.apply(
            variables, image1, image2, train=True, use_bw=True,
            method="unsup_forward", mutable=["batch_stats"],
        )
        return out, updated["batch_stats"]

    def train_step(state: TrainState, batch: dict[str, Any]):
        # Teacher: same net on the full originals, outside the gradient
        # (reference unsup.py:190 runs it before the tape).
        teacher, stats_after_teacher = fwd(
            state.params, state.batch_stats,
            batch["orig_image1"], batch["orig_image2"], True,
        )
        teacher_fw = jax.lax.stop_gradient(teacher["flow_up"][-1])
        teacher_bw = jax.lax.stop_gradient(teacher["flow_up_bw"][-1])

        h, w = batch["image1"].shape[1:3]
        img1_u = crop_bboxes(batch["orig_image1"], batch["crop_yx"], (h, w))
        img2_u = crop_bboxes(batch["orig_image2"], batch["crop_yx"], (h, w))
        images = jnp.stack([img1_u, img2_u], axis=1)
        full = jnp.stack([batch["orig_image1"], batch["orig_image2"]], axis=1)

        def loss_fn(params):
            out, new_stats = fwd(
                params, stats_after_teacher, batch["image1"], batch["image2"], True
            )
            total, terms = unsupervised_sequence_loss(
                images,
                out["flow_up"],
                out["flow_up_bw"],
                cfg,
                teacher_flow_fw=teacher_fw,
                teacher_flow_bw=teacher_bw,
                full_size_images=full,
                crop_yx=batch["crop_yx"],
            )
            return total, (terms, out, new_stats)

        (loss, (terms, out, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        new_state = state.apply_gradients(grads).replace(batch_stats=new_stats)
        log = {"loss": loss, **{k: v for k, v in terms.items()}}
        if "flow" in batch:
            log["epe"] = jnp.mean(
                epe_per_image(out["flow_up"][-1], batch["flow"], batch.get("valid"))
            )
        return new_state, log

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())
