"""Census (soft-hamming) photometric loss.

Parity with the reference (``raft/smurf_models/smurf_utils.py:1080-1138``):

- census transform: grayscale (ITU-R 601: 0.299 R + 0.587 G + 0.114 B) * 255,
  7x7 neighborhood differences via SAME conv, normalized d / sqrt(0.81 + d^2);
- soft hamming: sum_k d^2 / (0.1 + d^2);
- distance: DDFlow robust loss (|x| + 0.01)^0.4;
- mask zeroed on a patch_size//2 border, and the normalizer is
  sum(mask + 1e-6) — i.e. sum(mask) + 1e-6 * num_elements (exact reference
  reduction, smurf_utils.py:1135-1137).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def robust_l1(x: jax.Array) -> jax.Array:
    return jnp.sqrt(x**2 + 0.001**2)


def abs_robust_loss(diff: jax.Array, eps: float = 0.01, q: float = 0.4) -> jax.Array:
    """DDFlow robust distance."""
    return jnp.power(jnp.abs(diff) + eps, q)


def rgb_to_grayscale(image: jax.Array) -> jax.Array:
    w = jnp.asarray([0.299, 0.587, 0.114], image.dtype)
    return jnp.sum(image * w, axis=-1, keepdims=True)


def census_transform(image: jax.Array, patch_size: int = 7) -> jax.Array:
    """[B, H, W, 3] -> [B, H, W, patch_size^2] normalized neighbor differences."""
    intensities = rgb_to_grayscale(image) * 255.0
    # neighbors: zero-padded patch_size x patch_size window around each pixel.
    pad = patch_size // 2
    padded = jnp.pad(intensities, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    h, w = image.shape[1], image.shape[2]
    shifted = [
        padded[:, i : i + h, j : j + w, 0]
        for i in range(patch_size)
        for j in range(patch_size)
    ]
    neighbors = jnp.stack(shifted, axis=-1)
    diff = neighbors - intensities
    return diff / jnp.sqrt(0.81 + jnp.square(diff))


def soft_hamming(a: jax.Array, b: jax.Array, thresh: float = 0.1) -> jax.Array:
    sq = jnp.square(a - b)
    return jnp.sum(sq / (thresh + sq), axis=3, keepdims=True)


def zero_mask_border(mask: jax.Array, patch_size: int) -> jax.Array:
    p = patch_size // 2
    inner = mask[:, p:-p, p:-p, :]
    return jnp.pad(inner, ((0, 0), (p, p), (p, p), (0, 0)))


def census_loss(
    image_a: jax.Array,
    image_b: jax.Array,
    mask: jax.Array,
    patch_size: int = 7,
) -> jax.Array:
    ca = census_transform(image_a, patch_size)
    cb = census_transform(image_b, patch_size)
    hamming = soft_hamming(ca, cb)
    padded_mask = zero_mask_border(mask, patch_size)
    diff = abs_robust_loss(hamming) * padded_mask
    denom = jnp.sum(jax.lax.stop_gradient(padded_mask) + 1e-6)
    return jnp.sum(diff) / denom
