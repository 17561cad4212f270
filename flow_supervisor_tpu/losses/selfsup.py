"""Self-supervision loss (teacher-crop vs student).

Parity with the reference (``smurf_utils.py:735-829``): gaussian (or ddflow)
forward-backward consistency masks with sigma_teacher=0.003 / sigma_student=0.03,
student mask INVERTED (supervise where the student is inconsistent, the teacher
consistent), teacher flow/mask cropped from full-image coordinates to the
student's crop window (the ``_selfsup_transform`` in raft/unsup_loss.py:62-69),
robust_l1 error with stop-gradient on teacher flow and the combined mask.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from flow_supervisor_tpu.losses.photometric import robust_l1
from flow_supervisor_tpu.ops.pad import crop_bboxes
from flow_supervisor_tpu.ops.resampler import resampler
from flow_supervisor_tpu.ops.warp import flow_to_warp
from flow_supervisor_tpu.losses.occlusion import mask_invalid


def _fb_consistency(flow, backward_flow, sigma, h, w, mode: str):
    warp = flow_to_warp(flow)
    bwd = resampler(backward_flow, warp)
    fb_sq_diff = jnp.sum(jnp.square(flow + bwd), axis=-1, keepdims=True)
    valid = mask_invalid(warp)
    if mode == "gaussian":
        consistency = jnp.exp(-fb_sq_diff / (sigma**2 * (h**2 + w**2)))
    elif mode == "ddflow":
        fb_sum_sq = jnp.sum(jnp.square(flow) + jnp.square(bwd), axis=-1, keepdims=True)
        consistency = (fb_sq_diff < 0.01 * fb_sum_sq + 0.5).astype(jnp.float32)
    elif mode == "none":
        return None, valid
    else:
        raise ValueError(f"unknown selfsup_mask: {mode}")
    return consistency, valid


def self_supervision_loss(
    teacher_flow: jax.Array,
    student_flow: jax.Array,
    teacher_backward_flow: jax.Array,
    student_backward_flow: jax.Array,
    crop_yx: jax.Array,  # [B, 2] int (crop_y, crop_x) of the student window
    selfsup_mask: str = "gaussian",
    fb_sigma_student: float = 0.03,
    fb_sigma_teacher: float = 0.003,
) -> jax.Array:
    h = float(teacher_flow.shape[-3])
    w = float(teacher_flow.shape[-2])
    sh, sw = student_flow.shape[-3], student_flow.shape[-2]

    s_cons, s_valid = _fb_consistency(
        student_flow, student_backward_flow, fb_sigma_student, h, w, selfsup_mask
    )
    t_cons, t_valid = _fb_consistency(
        teacher_flow, teacher_backward_flow, fb_sigma_teacher, h, w, selfsup_mask
    )
    if selfsup_mask == "none":
        student_mask = jnp.ones_like(s_valid)
        teacher_mask = jnp.ones_like(t_valid)
    else:
        student_mask = 1.0 - s_cons * s_valid
        teacher_mask = t_cons * t_valid

    # Crop teacher quantities from full-image coords to the student window.
    teacher_mask = crop_bboxes(teacher_mask, crop_yx, (sh, sw))
    teacher_flow = crop_bboxes(teacher_flow, crop_yx, (sh, sw))

    error = robust_l1(jax.lax.stop_gradient(teacher_flow) - student_flow)
    mask = jax.lax.stop_gradient(teacher_mask * student_mask)
    return jnp.mean(mask * error)
