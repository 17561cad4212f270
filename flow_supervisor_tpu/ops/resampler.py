"""Safe bilinear resampler.

Matches the edge semantics shared by ``tfa.image.resampler`` and the reference's
pure-TF fallback (``uflow/uflow_resampler.py:21-178``): each of the four corner
taps contributes 0 when it lies outside the image, so queries fade linearly to
zero across the border instead of clamping.

Warp coordinates are channel-last (x, y) — x indexes width, y indexes height.
Gathers are expressed as ``take_along_axis`` over a flattened spatial axis, which
XLA lowers to a single batched gather (TPU-friendly: no scatter, static shapes).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def resampler(data: jax.Array, warp: jax.Array, compute_dtype=jnp.float32) -> jax.Array:
    """Bilinear sample ``data`` [B, H, W, C] at ``warp`` [B, ..., 2] (x, y).

    Returns [B, ..., C]; out-of-bounds corner taps contribute zero.
    """
    b, h, w, c = data.shape
    out_shape = warp.shape[:-1] + (c,)
    q = warp.reshape(b, -1, 2).astype(compute_dtype)
    n = q.shape[1]

    x, y = q[..., 0], q[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    dx = x - x0
    dy = y - y0

    flat = data.reshape(b, h * w, c)

    def tap(xi, yi, wgt):
        valid = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
        xi_c = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        idx = yi_c * w + xi_c
        vals = jnp.take_along_axis(flat, idx[..., None], axis=1)
        wgt = jnp.where(valid, wgt, 0.0).astype(compute_dtype)
        return vals.astype(compute_dtype) * wgt[..., None]

    out = (
        tap(x0, y0, (1.0 - dx) * (1.0 - dy))
        + tap(x0 + 1.0, y0, dx * (1.0 - dy))
        + tap(x0, y0 + 1.0, (1.0 - dx) * dy)
        + tap(x0 + 1.0, y0 + 1.0, dx * dy)
    )
    return out.astype(data.dtype).reshape(out_shape)


def resample_flow_lookup(source: jax.Array, coords: jax.Array) -> jax.Array:
    """Warp ``source`` [B, H, W, C] by absolute target coords [B, H, W, 2] (x, y)."""
    return resampler(source, coords)
