"""Padding / cropping helpers.

- ``pad_spec_for`` / ``pad_to_multiple`` / ``unpad``: evaluation-time padding to a
  multiple of 8 with replicate-edge values. 'sintel' mode centers the pad both
  ways; 'kitti' mode pads the bottom and centers the width pad (reference
  ``util/validate.py:301-325``, replicate-edge via ``util/pad.py:5-11``).
- ``crop_bboxes`` / ``pad_bboxes``: per-sample dynamic crop from, and zero-pad
  into, a full-image coordinate frame given per-sample (y, x) offsets — the
  machinery that moves teacher/student state between crop and full-image frames
  (reference ``util/image.py:6-49``). Implemented as ``lax.dynamic_slice`` under
  ``vmap`` (static target sizes, TPU-friendly).
- ``create_outgoing_mask``: 1 where flow keeps the pixel inside the image
  (reference ``util/image.py:94-114``).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from flow_supervisor_tpu.ops.coords import coords_grid


def pad_spec_for(ht: int, wd: int, mode: str = "sintel", multiple: int = 8):
    """((top, bottom), (left, right)) pad amounts to reach a multiple of 8."""
    m = multiple
    pad_ht = (((ht // m) + 1) * m - ht) % m
    pad_wd = (((wd // m) + 1) * m - wd) % m
    if mode == "sintel":
        return (pad_ht // 2, pad_ht - pad_ht // 2), (pad_wd // 2, pad_wd - pad_wd // 2)
    # kitti / default: all height pad at the bottom, width centered
    return (0, pad_ht), (pad_wd // 2, pad_wd - pad_wd // 2)


def pad_to_multiple(x: jax.Array, mode: str = "sintel", multiple: int = 8):
    """Replicate-edge pad NHWC to a multiple of ``multiple``; returns (padded, spec)."""
    (t, b), (l, r) = pad_spec_for(x.shape[1], x.shape[2], mode, multiple)
    out = jnp.pad(x, ((0, 0), (t, b), (l, r), (0, 0)), mode="edge")
    return out, ((t, b), (l, r))


def unpad(x: jax.Array, spec) -> jax.Array:
    (t, b), (l, r) = spec
    return x[:, t : x.shape[1] - b, l : x.shape[2] - r]


def crop_bboxes(images: jax.Array, offsets: jax.Array, target_size: tuple[int, int]):
    """Crop a (h, w) window from each sample at its own (y, x) offset.

    images: [B, H, W, C]; offsets: [B, 2] int (y, x); returns [B, h, w, C].
    """
    h, w = target_size

    def one(img, off):
        return jax.lax.dynamic_slice(
            img, (off[0], off[1], 0), (h, w, img.shape[-1])
        )

    return jax.vmap(one)(images, offsets.astype(jnp.int32))


def pad_bboxes(images: jax.Array, offsets: jax.Array, target_size: tuple[int, int]):
    """Zero-pad each sample into a (h, w) canvas at its own (y, x) offset.

    images: [B, ih, iw, C]; offsets: [B, 2] int (y, x); returns [B, h, w, C].
    """
    h, w = target_size

    def one(img, off):
        canvas = jnp.zeros((h, w, img.shape[-1]), img.dtype)
        return jax.lax.dynamic_update_slice(canvas, img, (off[0], off[1], 0))

    return jax.vmap(one)(images, offsets.astype(jnp.int32))


def central_pad(images: jax.Array, target_size: tuple[int, int]) -> jax.Array:
    h, w = target_size
    ih, iw = images.shape[1], images.shape[2]
    y, x = (h - ih) // 2, (w - iw) // 2
    return jnp.pad(images, ((0, 0), (y, h - y - ih), (x, w - x - iw), (0, 0)))


def central_crop(images: jax.Array, target_size: tuple[int, int]) -> jax.Array:
    h, w = target_size
    ih, iw = images.shape[1], images.shape[2]
    y, x = (ih - h) // 2, (iw - w) // 2
    return images[:, y : y + h, x : x + w]


def create_outgoing_mask(flow: jax.Array) -> jax.Array:
    """[..., H, W, 1] mask, 1 where grid + flow stays inside the image."""
    h, w = flow.shape[-3], flow.shape[-2]
    grid = coords_grid(1, h, w, flow.dtype)[0]
    grid = jnp.broadcast_to(grid, flow.shape)
    pos = grid + flow
    inside = (
        (pos[..., 0] >= 0.0)
        & (pos[..., 0] <= w - 1.0)
        & (pos[..., 1] >= 0.0)
        & (pos[..., 1] <= h - 1.0)
    )
    return inside.astype(flow.dtype)[..., None]
