"""Convex upsampling of low-resolution flow with a learned 9-neighbor mask.

Behavioral contract (reference ``raft/upsample.py:4-41``):

- mask has 9*64 channels laid out neighbor-major: channel = n*64 + g with
  n = (row_shift+1)*3 + (col_shift+1) in [0, 9) and g = sub_row*8 + sub_col in [0, 64)
  (the reference reshapes to [B, H, W, 9, 64, 1] and softmaxes over the 9 axis);
- neighbor values come from zero-padded 3x3 shifts of the low-res field;
- softmax + weighted sum run in float32 regardless of compute dtype
  (reference dtype islands, upsample.py:8-9);
- output is cropped to the reference size (handles inputs that are not exact
  multiples of 8 after ceil-division downsampling).

The caller multiplies the result by ``scale`` to convert low-res flow vectors into
high-res units (raft/__init__.py:170).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def upsample_convex(
    x: jax.Array,
    mask: jax.Array,
    out_size: tuple[int, int] | None = None,
    scale: int = 8,
    pre_padded: bool = False,
) -> jax.Array:
    """x: [B, H, W, C] low-res field; mask: [B, H, W, 9*scale^2] logits.

    Returns [B, out_h, out_w, C] where out defaults to (H*scale, W*scale).

    ``pre_padded``: x is [B, H+2, W+2, C] and already carries its 1-px
    3x3-neighbor halo (used when upsampling a crop window of a larger field:
    the halo holds the true out-of-window neighbors instead of the zero pad,
    which makes crop-then-upsample bit-identical to upsample-then-crop).
    """
    if pre_padded:
        b, hp, wp, c = x.shape
        h, w = hp - 2, wp - 2
        xp = x.astype(jnp.float32)
    else:
        b, h, w, c = x.shape
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0))).astype(jnp.float32)
    s2 = scale * scale
    mask = mask.reshape(b, h, w, 9, s2).astype(jnp.float32)
    mask = jax.nn.softmax(mask, axis=3)

    shifted = [
        xp[:, i : i + h, j : j + w] for i in range(3) for j in range(3)
    ]
    p = jnp.stack(shifted, axis=3)  # [B, H, W, 9, C]

    # [B, H, W, 9, s2, 1] * [B, H, W, 9, 1, C] summed over the 9 neighbors
    up = jnp.einsum("bhwns,bhwnc->bhwsc", mask, p)  # [B, H, W, s2, C]
    up = up.reshape(b, h, w, scale, scale, c)
    up = jnp.transpose(up, (0, 1, 3, 2, 4, 5)).reshape(b, h * scale, w * scale, c)

    if out_size is not None:
        up = up[:, : out_size[0], : out_size[1]]
    return up.astype(x.dtype)
