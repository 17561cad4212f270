"""Coordinate grids and flow resizing.

Semantics match the reference (``raft/__init__.py:191-222``): coordinate grids are
stored channel-last as (x, y) — channel 0 is the column coordinate, channel 1 the
row coordinate. Flow fields are (u, v) displacements in the same order.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def coords_grid(batch: int, ht: int, wd: int, dtype=jnp.float32) -> jax.Array:
    """[batch, ht, wd, 2] grid with g[..., 0] = x (col) and g[..., 1] = y (row)."""
    x = jax.lax.broadcasted_iota(jnp.int32, (ht, wd), 1)
    y = jax.lax.broadcasted_iota(jnp.int32, (ht, wd), 0)
    g = jnp.stack([x, y], axis=-1).astype(dtype)
    return jnp.broadcast_to(g[None], (batch, ht, wd, 2))


def downsample_shape(size: int, factor: int = 8) -> int:
    """Spatial size at 1/factor resolution via repeated ceil-div by 2
    (reference ``initialize_flow``, raft/__init__.py:90-100)."""
    s = size
    f = factor
    while f > 1:
        s = -(-s // 2)
        f //= 2
    return s


def initialize_coords(batch: int, ht: int, wd: int, dtype=jnp.float32):
    """(coords0, coords1) at 1/8 resolution; flow = coords1 - coords0."""
    h8, w8 = downsample_shape(ht), downsample_shape(wd)
    c = coords_grid(batch, h8, w8, dtype)
    return c, c


def _resample_axis(im: jax.Array, axis: int, out_size: int) -> jax.Array:
    """TF-style half-pixel bilinear sampling along one axis with edge clamping
    and NO antialiasing (tf.image.resize(method='bilinear', antialias=False);
    jax.image.resize antialiases on downscale, which the reference does not)."""
    in_size = im.shape[axis]
    scale = in_size / out_size
    pos = (jnp.arange(out_size, dtype=jnp.float32) + 0.5) * scale - 0.5
    lo = jnp.clip(jnp.floor(pos), 0, in_size - 1).astype(jnp.int32)
    hi = jnp.clip(lo + 1, 0, in_size - 1)
    w = jnp.clip(pos - lo.astype(jnp.float32), 0.0, 1.0)
    a = jnp.take(im, lo, axis=axis)
    b = jnp.take(im, hi, axis=axis)
    shape = [1] * im.ndim
    shape[axis] = out_size
    w = w.reshape(shape)
    return a.astype(jnp.float32) * (1.0 - w) + b.astype(jnp.float32) * w


def resize_image(im: jax.Array, size: tuple[int, int], method: str = "bilinear") -> jax.Array:
    """Resize NHWC to (H, W) with TF-exact half-pixel bilinear (no antialias)."""
    if im.shape[1] == size[0] and im.shape[2] == size[1]:
        return im
    out = _resample_axis(im, 1, size[0])
    out = _resample_axis(out, 2, size[1])
    return out.astype(im.dtype)


def resize_flow(flow: jax.Array, size: tuple[int, int], scaling: bool = True) -> jax.Array:
    """Bilinearly resize a flow field, optionally scaling vectors by the resize
    ratio (reference ``resize_flow``, raft/__init__.py:213-222)."""
    h, w = flow.shape[1], flow.shape[2]
    out = resize_image(flow, size)
    if scaling:
        scale = jnp.asarray(
            [size[1] / float(w), size[0] / float(h)], dtype=flow.dtype
        ).reshape(1, 1, 1, 2)
        out = out * scale
    return out
