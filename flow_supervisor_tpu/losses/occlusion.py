"""Occlusion estimation: forward-backward (brox) and range-map (wang).

Parity with the reference (``raft/smurf_models/smurf_utils.py:129-252, 432-525``),
with flow channels in (x, y) order throughout (the reference flips to SMURF's
(y, x); we don't):

- ``compute_range_map``: bilinear-splat counting of how often each target pixel
  is sampled — out-of-bounds corners are dropped. Implemented as one static-shape
  scatter-add (``.at[].add(mode='drop')``) instead of the reference's dynamic
  gather + unsorted_segment_sum (TPU wants static shapes).
- brox: occluded where ||f + b(w(f))||^2 > 0.01 (||f||^2 + ||b||^2) + 0.5.
- wang: non-occluded weight = clip(range_map(backward_flow), 0, 1).
- ``compute_occlusions`` returns the NON-occlusion mask (1 = visible) like the
  reference's occlusions_are_zeros=True default.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from flow_supervisor_tpu.ops.warp import flow_to_warp
from flow_supervisor_tpu.ops.resampler import resampler


def mask_invalid(coords: jax.Array, pad_x=0, pad_y=0) -> jax.Array:
    """1 where (x, y) coords land inside [pad, size-1] (reference mask_invalid,
    smurf_utils.py:70-96, transposed to (x, y))."""
    h, w = coords.shape[-3], coords.shape[-2]
    px = jnp.reshape(jnp.asarray(pad_x, jnp.float32), (-1, 1, 1))
    py = jnp.reshape(jnp.asarray(pad_y, jnp.float32), (-1, 1, 1))
    mask = (
        (coords[..., 0] >= px)
        & (coords[..., 0] <= w - 1)
        & (coords[..., 1] >= py)
        & (coords[..., 1] <= h - 1)
    )
    return mask.astype(jnp.float32)[..., None]


def compute_range_map(flow: jax.Array) -> jax.Array:
    """[B, H, W, 2] flow -> [B, H, W, 1] sample-count map (downsampling_factor=1)."""
    b, h, w, _ = flow.shape
    warp = flow_to_warp(flow.astype(jnp.float32))
    x, y = warp[..., 0], warp[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    dx = x - x0
    dy = y - y0

    counts = jnp.zeros((b, h * w), jnp.float32)
    for cy in (0, 1):
        for cx in (0, 1):
            xi = x0 + cx
            yi = y0 + cy
            wgt = (dx if cx else (1.0 - dx)) * (dy if cy else (1.0 - dy))
            valid = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
            idx = (
                jnp.clip(yi, 0, h - 1).astype(jnp.int32) * w
                + jnp.clip(xi, 0, w - 1).astype(jnp.int32)
            ).reshape(b, -1)
            vals = jnp.where(valid, wgt, 0.0).reshape(b, -1)
            counts = jax.vmap(lambda c, i, v: c.at[i].add(v))(counts, idx, vals)
    return counts.reshape(b, h, w, 1)


def compute_occlusions_brox(forward_flow: jax.Array, backward_flow: jax.Array):
    warp = flow_to_warp(forward_flow)
    bwd_resampled = resampler(backward_flow, warp)
    fb_sq_diff = jnp.sum(
        jnp.square(forward_flow + bwd_resampled), axis=-1, keepdims=True
    )
    fb_sum_sq = jnp.sum(
        jnp.square(forward_flow) + jnp.square(bwd_resampled), axis=-1, keepdims=True
    )
    return (fb_sq_diff > 0.01 * fb_sum_sq + 0.5).astype(jnp.float32)


def compute_occlusions_wang(backward_flow: jax.Array, threshold: bool = False):
    range_map = compute_range_map(backward_flow)
    if threshold:
        return 1.0 - (range_map < 0.75).astype(jnp.float32)
    return 1.0 - jnp.clip(range_map, 0.0, 1.0)


def compute_occlusions(
    forward_flow: jax.Array,
    backward_flow: jax.Array,
    occlusion_estimation: str = "wang",
    occlusions_are_zeros: bool = True,
    boundaries_occluded: bool = True,
) -> jax.Array:
    if occlusion_estimation == "none":
        occ = jnp.zeros_like(forward_flow[..., :1])
    elif occlusion_estimation == "brox":
        occ = compute_occlusions_brox(forward_flow, backward_flow)
    elif occlusion_estimation == "wang":
        occ = compute_occlusions_wang(backward_flow, threshold=False)
    else:
        raise ValueError(f"unknown occlusion_estimation: {occlusion_estimation}")

    if not boundaries_occluded:
        occ = jnp.minimum(occ, mask_invalid(flow_to_warp(forward_flow)))
    return 1.0 - occ if occlusions_are_zeros else occ
