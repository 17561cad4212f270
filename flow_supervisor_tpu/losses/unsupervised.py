"""Unsupervised (SMURF-style) loss orchestration.

Parity with the reference (``smurf_utils.unsupervised_loss`` :528-732 and
``unsupervised_sequence_loss`` :1176-1253, as wired by ``raft/unsup_loss.py``):

- per flow direction (0->1 and 1->0 of the 'augmented-student' stream):
  census loss on the image warped by the flow, edge-aware smoothness, and
  optional self-supervision vs the 'original-teacher' stream;
- the FULL-SIZE warping branch: the crop's flow is zero-padded into full-image
  coordinates at the per-sample crop offsets, the (stop-gradient) full-size
  second image is warped there, and the result plus the valid-warp mask are
  cropped back — so flow vectors leaving the crop still supervise
  (smurf_utils.py:614-651);
- sequence mode 'unsup_per_update' accumulates per-iteration loss dicts with
  decay gamma: total = sum_i gamma^(N-1-i) * loss_i.

Flow channels are (x, y) everywhere (no SMURF channel flip).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from flow_supervisor_tpu.losses.photometric import census_loss
from flow_supervisor_tpu.losses.selfsup import self_supervision_loss
from flow_supervisor_tpu.losses.smoothness import (
    edge_weighting_fn,
    first_order_smoothness_loss,
    second_order_smoothness_loss,
)
from flow_supervisor_tpu.losses.occlusion import compute_occlusions, mask_invalid
from flow_supervisor_tpu.ops.pad import crop_bboxes, pad_bboxes
from flow_supervisor_tpu.ops.resampler import resampler
from flow_supervisor_tpu.ops.warp import flow_to_warp


@dataclasses.dataclass(frozen=True)
class UnsupLossConfig:
    """Weights / knobs (reference raft/unsup_loss.py:10-28 + train.sh recipes)."""

    census: float = 1.0
    smooth1: float = 0.0
    smooth2: float = 2.0
    selfsup: float = 0.0
    occlusion: str = "wang"  # wang | brox | none
    smoothness_edge_weighting: str = "exponential"
    smoothness_edge_constant: float = 150.0
    selfsup_mask: str = "gaussian"
    fb_sigma_teacher: float = 0.003
    fb_sigma_student: float = 0.03
    stop_gradient_mask: bool = True
    only_forward: bool = False
    gamma: float = 0.8  # per-update sequence decay

    def active_weights(self) -> dict[str, float]:
        w = {}
        for k in ("census", "smooth1", "smooth2", "selfsup"):
            v = getattr(self, k)
            if v > 0.0:
                w[k] = v
        return w


def _warped_image_and_mask(
    flow, images_j, full_size_image_j, crop_yx, pad_yx
):
    """Census warp target; uses the full-size branch when full images are given."""
    if full_size_image_j is None:
        warp = flow_to_warp(flow)
        return resampler(jax.lax.stop_gradient(images_j), warp), mask_invalid(warp)

    h, w = flow.shape[1], flow.shape[2]
    fh, fw = full_size_image_j.shape[1], full_size_image_j.shape[2]
    off = crop_yx + pad_yx
    flow_full = pad_bboxes(flow, off, (fh, fw))
    warp = flow_to_warp(flow_full)
    valid = mask_invalid(warp, pad_x=pad_yx[:, 1], pad_y=pad_yx[:, 0])
    warped = resampler(jax.lax.stop_gradient(full_size_image_j), warp)
    warped = crop_bboxes(warped, off, (h, w))
    valid = crop_bboxes(valid, off, (h, w))
    return warped, valid


def unsupervised_loss(
    images: jax.Array,  # [B, 2, H, W, 3] unaugmented crop-frame images
    flows: dict,  # {(i, j, tag): [flow, ...]} with tags like the reference
    cfg: UnsupLossConfig,
    full_size_images: Optional[jax.Array] = None,  # [B, 2, FH, FW, 3]
    crop_yx: Optional[jax.Array] = None,  # [B, 2] int (y, x)
    pad_yx: Optional[jax.Array] = None,  # [B, 2] int (y, x)
) -> dict[str, jax.Array]:
    weights = cfg.active_weights()
    losses = {k: jnp.zeros([], jnp.float32) for k in weights}

    loss_tags = ["augmented-student"]
    num_pairs = float(sum(1 for (i, j, c) in flows if c in loss_tags))

    smoothness_at_level = min(2, len(flows[(0, 1, "augmented-student")]) - 1)
    edge_fn = edge_weighting_fn(
        cfg.smoothness_edge_weighting, cfg.smoothness_edge_constant
    )
    if pad_yx is None and crop_yx is not None:
        pad_yx = jnp.zeros_like(crop_yx)

    for key in flows:
        ti, tj, tag = key
        key_rev = (tj, ti, tag)
        if tag not in loss_tags or (cfg.only_forward and ti > tj):
            continue

        flow = flows[key][0]
        full_j = full_size_images[:, tj] if full_size_images is not None else None
        warped_image, valid_warp_mask = _warped_image_and_mask(
            flow, images[:, tj], full_j, crop_yx, pad_yx
        )

        occlusion_mask = compute_occlusions(
            forward_flow=flow,
            backward_flow=flows[key_rev][0],
            occlusion_estimation=cfg.occlusion,
        )
        mask_level0 = occlusion_mask * valid_warp_mask
        if cfg.stop_gradient_mask:
            mask_level0 = jax.lax.stop_gradient(mask_level0)

        if "census" in weights:
            cen = census_loss(images[:, ti], warped_image, mask_level0)
            losses["census"] += weights["census"] * cen / num_pairs

        if "smooth1" in weights or "smooth2" in weights:
            from flow_supervisor_tpu.ops.coords import resize_image

            img_s = images[:, ti]
            for _ in range(smoothness_at_level):
                nh, nw = img_s.shape[1] // 2, img_s.shape[2] // 2
                img_s = resize_image(img_s, (nh, nw))
            flow_s = flows[key][smoothness_at_level]
            if "smooth1" in weights:
                l1s = first_order_smoothness_loss(img_s, flow_s, edge_fn)
                losses["smooth1"] += weights["smooth1"] * l1s / num_pairs
            if "smooth2" in weights:
                l2s = second_order_smoothness_loss(img_s, flow_s, edge_fn)
                losses["smooth2"] += weights["smooth2"] * l2s / num_pairs

        if "selfsup" in weights:
            t_key, s_key = (ti, tj, "original-teacher"), (ti, tj, "transformed-student")
            t_rev, s_rev = (tj, ti, "original-teacher"), (tj, ti, "transformed-student")
            ss = self_supervision_loss(
                teacher_flow=flows[t_key][0],
                student_flow=flows[s_key][0],
                teacher_backward_flow=flows[t_rev][0],
                student_backward_flow=flows[s_rev][0],
                crop_yx=crop_yx,
                selfsup_mask=cfg.selfsup_mask,
                fb_sigma_student=cfg.fb_sigma_student,
                fb_sigma_teacher=cfg.fb_sigma_teacher,
            )
            losses["selfsup"] += weights["selfsup"] * ss / num_pairs

    return losses


def unsupervised_sequence_loss(
    images: jax.Array,
    flows_fw: jax.Array,  # [iters, B, H, W, 2] student forward predictions
    flows_bw: jax.Array,  # [iters, B, H, W, 2] student backward predictions
    cfg: UnsupLossConfig,
    teacher_flow_fw: Optional[jax.Array] = None,  # final teacher fw (full coords)
    teacher_flow_bw: Optional[jax.Array] = None,
    full_size_images: Optional[jax.Array] = None,
    crop_yx: Optional[jax.Array] = None,
    pad_yx: Optional[jax.Array] = None,
) -> tuple[jax.Array, dict[str, jax.Array]]:
    """'unsup_per_update' mode: same loss at each update iteration, decayed.

    Returns (total, per-term dict). Mirrors raft/unsup_loss.py:96-117: each
    iteration's flow dict reuses the student flow for 'transformed-student' and
    the FINAL teacher flow for 'original-teacher'.
    """
    n = flows_fw.shape[0]
    totals: dict[str, jax.Array] = {}
    for i in range(n):
        flows = {
            (0, 1, "augmented-student"): [flows_fw[i]],
            (1, 0, "augmented-student"): [flows_bw[i]],
            (0, 1, "transformed-student"): [flows_fw[i]],
            (1, 0, "transformed-student"): [flows_bw[i]],
        }
        if teacher_flow_fw is not None:
            flows[(0, 1, "original-teacher")] = [teacher_flow_fw]
            flows[(1, 0, "original-teacher")] = [teacher_flow_bw]
        d = unsupervised_loss(
            images, flows, cfg, full_size_images, crop_yx, pad_yx
        )
        for k, v in d.items():
            totals[k] = v if k not in totals else v + totals[k] * cfg.gamma
    total = sum(totals.values(), jnp.zeros([], jnp.float32))
    return total, totals
