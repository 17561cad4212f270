"""Flow-based warping.

``flow_to_warp`` converts a flow field to absolute sample coordinates
(grid + flow). ``warp_image`` backward-warps an image by a forward flow —
warped(p) = image(p + flow(p)) — with the reference's occlusion handling
(reference ``util/image.py:77-92``: sample then multiply by the outgoing mask;
'zero' zeroes out-of-image pixels, 'input'/'background' substitute a fallback).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from flow_supervisor_tpu.ops.coords import coords_grid
from flow_supervisor_tpu.ops.pad import create_outgoing_mask
from flow_supervisor_tpu.ops.resampler import resampler


def flow_to_warp(flow: jax.Array) -> jax.Array:
    """Absolute (x, y) sample coordinates for a [B, H, W, 2] flow field."""
    b, h, w, _ = flow.shape
    return coords_grid(b, h, w, flow.dtype) + flow


def warp_image(
    image: jax.Array,
    flow: jax.Array,
    occlusion: str = "zero",
    background_image: jax.Array | None = None,
) -> jax.Array:
    """Backward-warp ``image`` [B, H, W, C] by ``flow`` [B, H, W, 2] (x, y)."""
    warped = resampler(image, flow_to_warp(flow))
    mask = create_outgoing_mask(flow)
    occ = occlusion.lower()
    if occ == "zero":
        return warped * mask
    if occ == "input":
        return warped * mask + image * (1.0 - mask)
    if occ == "background":
        assert background_image is not None
        return warped * mask + background_image * (1.0 - mask)
    raise ValueError(f"unknown occlusion mode: {occlusion}")
