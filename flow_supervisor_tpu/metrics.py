"""Flow evaluation metrics.

Parity with the reference:

- ``epe_per_image``: masked per-image mean endpoint error (reference ``raft/metric.py:3-44``
  — mean of per-image means; images with an empty mask report -1).
- ``dense_metrics``: unmasked per-image EPE + 1/3/5-px accuracies
  (reference ``util/validate.py:272-287``).
- ``sparse_metrics``: masked EPE, n-px accuracies, and KITTI Fl-all =
  mean over valid pixels of (epe > 3 AND epe/mag > 0.05)
  (reference ``util/validate.py:190-216``).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _epe_map(pred: jax.Array, gt: jax.Array) -> jax.Array:
    return jnp.sqrt(jnp.sum(jnp.square(pred - gt), axis=-1, keepdims=True))


def epe_per_image(pred: jax.Array, gt: jax.Array, valid: jax.Array | None = None):
    """[B] masked mean EPE per image (-1 where the mask is empty)."""
    epes = _epe_map(pred, gt)
    if valid is None:
        return jnp.mean(epes, axis=(1, 2, 3))
    m = valid.astype(jnp.float32)
    total = jnp.sum(epes * m, axis=(1, 2, 3))
    count = jnp.sum(m, axis=(1, 2, 3))
    return jnp.where(count > 0, total / jnp.maximum(count, 1.0), -1.0)


def dense_metrics(pred: jax.Array, gt: jax.Array) -> dict[str, jax.Array]:
    """Per-image dense metrics, each [B]."""
    epes = _epe_map(pred, gt)
    return {
        "epe": jnp.mean(epes, axis=(1, 2, 3)),
        "epe_1px": jnp.mean((epes < 1.0).astype(jnp.float32), axis=(1, 2, 3)),
        "epe_3px": jnp.mean((epes < 3.0).astype(jnp.float32), axis=(1, 2, 3)),
        "epe_5px": jnp.mean((epes < 5.0).astype(jnp.float32), axis=(1, 2, 3)),
    }


def sparse_metrics(
    pred: jax.Array, gt: jax.Array, valid: jax.Array
) -> dict[str, jax.Array]:
    """Masked metrics over valid pixels, each [B] (mask threshold > 0.5).

    Note: the reference pools valid pixels over the whole eval batch (batch 1 in
    practice); we compute per-image and let the caller average, matching batch-1
    evaluation exactly.
    """
    epes = _epe_map(pred, gt)
    mag = jnp.sqrt(jnp.sum(jnp.square(gt), axis=-1, keepdims=True))
    m = (valid > 0.5).astype(jnp.float32)
    count = jnp.maximum(jnp.sum(m, axis=(1, 2, 3)), 1.0)

    def masked_mean(x):
        return jnp.sum(x * m, axis=(1, 2, 3)) / count

    fl = ((epes > 3.0) & (epes / jnp.maximum(mag, 1e-12) > 0.05)).astype(jnp.float32)
    return {
        "epe": masked_mean(epes),
        "epe_1px": masked_mean((epes < 1.0).astype(jnp.float32)),
        "epe_3px": masked_mean((epes < 3.0).astype(jnp.float32)),
        "epe_5px": masked_mean((epes < 5.0).astype(jnp.float32)),
        "fl": masked_mean(fl),
    }


def angular_error(pred: jax.Array, gt: jax.Array) -> jax.Array:
    """Mean angular error in radians (reference ``util/flow.py:24-34``)."""
    p = jnp.concatenate([pred, jnp.ones_like(pred[..., :1])], axis=-1)
    g = jnp.concatenate([gt, jnp.ones_like(gt[..., :1])], axis=-1)
    cos = jnp.sum(p * g, axis=-1) / (
        jnp.linalg.norm(p, axis=-1) * jnp.linalg.norm(g, axis=-1)
    )
    return jnp.arccos(jnp.clip(cos, -1.0, 1.0))
