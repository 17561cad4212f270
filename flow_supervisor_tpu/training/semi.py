"""Flow-supervisor (semi-supervised) training step.

Parity with the reference (``raft/semi.py:346-511``), as ONE jitted function:

- SUP branch: student sequence loss vs labels (gamma=loss_decay_rate, scaled by
  sup_label_loss_weight) + L_fl: teacher-from-label sequence loss
  (gamma=lfl_loss_decay_rate, scaled by lfl_weight).
- UNSUP branch: L_fr: student (fw+bw) sequence loss vs the stop-gradient FINAL
  teacher prediction (mask of ones, lfr_loss_type, gamma=loss_decay_rate, scaled
  by lfr_weight) + optional teacher SMURF loss (census/smoothness/occlusion over
  the teacher prediction sequence with full-size warping).
- Per-variable gradient merge: g = sup_weight * g_sup + unsup_weight * g_unsup
  (semi.py:479-497). JAX's zero-for-unconnected gradients make the reference's
  UnconnectedGradients ZERO/NONE distinction equivalent here: variables that the
  unsup loss doesn't touch get exact zeros.

Batch contract:
  sup:   {'image1','image2','orig_image1','orig_image2','crop_yx','flow','valid'}
  unsup: {'image1','image2','orig_image1','orig_image2','crop_yx'}
with images in [0,1], crop_yx int [B,2] (y,x) multiples of 8.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from flow_supervisor_tpu.losses import sequence_loss
from flow_supervisor_tpu.losses.unsupervised import (
    UnsupLossConfig,
    unsupervised_sequence_loss,
)
from flow_supervisor_tpu.metrics import epe_per_image
from flow_supervisor_tpu.models import RAFT
from flow_supervisor_tpu.ops.pad import crop_bboxes
from flow_supervisor_tpu.training.state import TrainState


def make_semi_train_step(
    model: RAFT,
    model_cfg,  # ModelCfg: weights / decay rates / loss types
    gamma: float = 0.8,  # loss_decay_rate (TrainCfg)
    sup_loss_type: str = "robust",
    donate: bool = True,
    debug_grads: bool = False,  # include the merged gradient tree in the log
):
    mc = model_cfg
    # Semi stages always run with frozen batch norm (reference train.py:180-181
    # freezes BN for every stage but chairs; semi stages are never chairs).
    assert model.cfg.freeze_bn, (
        "semi training requires freeze_bn=True in RAFTConfig (reference parity)"
    )
    # selfsup is hardcoded 0.0 for the TEACHER smurf loss by the reference
    # (semi.py:36-41 constructs UnsupervisedLoss(selfsup=0.0) regardless of
    # --selfsup_weight; the flag only drives the unsupervised model's loss,
    # unsup.py:18-25 — see training/unsup.py here). The per-update decay is
    # exposed as mc.unsup_loss_decay_rate (reference hardcodes 0.8,
    # unsup_loss.py:13; our default matches).
    unsup_cfg = UnsupLossConfig(
        census=mc.census_weight,
        smooth1=mc.smooth1_weight,
        smooth2=mc.smooth2_weight,
        selfsup=0.0,
        occlusion=mc.occlusion,
        gamma=mc.unsup_loss_decay_rate,
    )

    def apply_semi(
        params, batch_stats, batch, train=True, use_bw=True,
        teacher_final_only=False,
    ):
        variables = {"params": params, "batch_stats": batch_stats}
        return model.apply(
            variables,
            batch["image1"],
            batch["image2"],
            batch["orig_image1"],
            batch["orig_image2"],
            batch["crop_yx"],
            train=train,
            use_bw=use_bw and mc.use_bw,
            teacher_final_only=teacher_final_only,
            method="semi_forward",
        )

    def sup_loss_fn(params, batch_stats, batch):
        # The sup branch consumes only the forward-direction student and
        # teacher predictions (reference semi.py:369-408; its call computes
        # the bw stream too but TF graph pruning drops it — skip explicitly
        # here, scan-mode XLA cannot always prove the bw scans dead).
        out = apply_semi(params, batch_stats, batch, use_bw=False)
        log = {}
        sup_label = (
            sequence_loss(
                out["student_fw"], batch["flow"], batch["valid"],
                gamma=gamma, loss=sup_loss_type,
            )
            * mc.sup_label_loss_weight
        )
        log["sup_label_loss"] = sup_label
        total = sup_label
        if mc.lfl_weight > 0.0:
            lfl = (
                sequence_loss(
                    out["teacher_fw"], batch["flow"], batch["valid"],
                    gamma=mc.lfl_loss_decay_rate, loss=sup_loss_type,
                )
                * mc.lfl_weight
            )
            log["lfl_loss"] = lfl
            total = total + lfl
        log["sup_loss"] = total
        log["_sup_final_pred"] = out["student_fw"][-1]
        return total, log

    def unsup_loss_fn(params, batch_stats, batch):
        # Without the teacher SMURF loss, the unsup branch reads only the
        # teacher's FINAL prediction (the stop-gradient L_fr target,
        # reference semi.py:447-471): skip the other t_iters-1 convex
        # upsamples (scan mode cannot DCE them).
        out = apply_semi(
            params, batch_stats, batch,
            teacher_final_only=mc.teacher_smurf_weight <= 0.0,
        )
        log = {}
        total = jnp.zeros([], jnp.float32)
        if mc.teacher_smurf_weight > 0.0:
            # Census targets are UNAUGMENTED crops from the original images
            # (reference unsup_loss.py:56-60), warped against the full images.
            h, w = batch["image1"].shape[1:3]
            img1_u = crop_bboxes(batch["orig_image1"], batch["crop_yx"], (h, w))
            img2_u = crop_bboxes(batch["orig_image2"], batch["crop_yx"], (h, w))
            images = jnp.stack([img1_u, img2_u], axis=1)
            full = jnp.stack([batch["orig_image1"], batch["orig_image2"]], axis=1)
            smurf_total, _ = unsupervised_sequence_loss(
                images,
                out["teacher_fw"],
                out["teacher_bw"],
                unsup_cfg,
                full_size_images=full,
                crop_yx=batch["crop_yx"],
            )
            log["teacher_smurf_loss"] = smurf_total
            total = total + smurf_total * mc.teacher_smurf_weight
        if mc.lfr_weight > 0.0:
            target_fw = jax.lax.stop_gradient(out["teacher_fw"][-1])
            target_bw = jax.lax.stop_gradient(out["teacher_bw"][-1])
            lfr = sequence_loss(
                out["student_fw"], target_fw, None, gamma=gamma, loss=mc.lfr_loss_type
            ) + sequence_loss(
                out["student_bw"], target_bw, None, gamma=gamma, loss=mc.lfr_loss_type
            )
            lfr = lfr * mc.lfr_weight
            log["lfr_loss"] = lfr
            total = total + lfr
            if getattr(mc, "lfr_sum_reduction", True):
                # Reference-exact gradient scale: the reference's lfr_loss_fn
                # has Reduction.NONE (semi.py:29-34), making unsup_loss a
                # [B,H,W] tensor; tape.gradient then sums it, so EVERY term
                # accumulated into unsup_loss (the scalar smurf term
                # broadcasts too) is effectively multiplied by B*H*W of the
                # student crop. Only applies when the lfr branch is active —
                # with lfr_weight=0 the reference's unsup_loss stays scalar.
                b, h, w = batch["image1"].shape[0:3]
                total = total * float(b * h * w)
        log["unsup_loss"] = total
        return total, log

    def train_step(state: TrainState, sup_batch: dict[str, Any], unsup_batch: dict[str, Any]):
        log = {}
        grads = None
        if mc.sup_weight > 0.0:
            (sup_loss, sup_log), g_sup = jax.value_and_grad(
                sup_loss_fn, has_aux=True
            )(state.params, state.batch_stats, sup_batch)
            final_pred = sup_log.pop("_sup_final_pred")
            log.update(sup_log)
            log["epe"] = jnp.mean(
                epe_per_image(final_pred, sup_batch["flow"], sup_batch["valid"])
            )
            grads = jax.tree_util.tree_map(lambda g: mc.sup_weight * g, g_sup)
        if mc.unsup_weight > 0.0:
            (unsup_loss, unsup_log), g_unsup = jax.value_and_grad(
                unsup_loss_fn, has_aux=True
            )(state.params, state.batch_stats, unsup_batch)
            log.update(unsup_log)
            if grads is None:
                grads = jax.tree_util.tree_map(lambda g: mc.unsup_weight * g, g_unsup)
            else:
                grads = jax.tree_util.tree_map(
                    lambda a, b: a + mc.unsup_weight * b, grads, g_unsup
                )
        if debug_grads:
            log["_merged_grads"] = grads
        new_state = state.apply_gradients(grads)
        return new_state, log

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())
