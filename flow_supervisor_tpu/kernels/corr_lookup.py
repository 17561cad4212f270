"""Pallas TPU kernel: fused correlation-pyramid window lookup.

The TPU-native counterpart of the reference's ``alt_cuda_corr`` CUDA kernel
(pytorch/alt_cuda_corr/correlation_kernel.cu). Each query's (K+1)^2 bilinear
support patch is extracted from its (zero-padded) correlation plane IN VMEM via
two one-hot matmuls — this Mosaic toolchain rejects data-dependent vector
slicing, but iota-vs-scalar comparisons and small dots lower fine — and the
4-tap bilinear combine runs on the VPU.

Zero-padding by K+1 on every side makes ALL windows in-bounds: clamped bases of
fully out-of-bounds queries land entirely inside the pad, reproducing the
reference's OOB->0 semantics with no masking.

Layout per level:
  vol_padded: [BQ, Hp, Wp]   (BQ = B*h1*w1 query planes)
  base_yx:    [BQ, 2] int32  clamped floor(coords) - r + pad
  frac_yx:    [BQ, 2] f32    fractional parts
  out:        [BQ, K, K]     window samples [dy, dx]; transposed to the
                             framework's dx-major channels outside the kernel.

Correctness oracle: ``ops.corr.corr_pyramid_lookup`` (tested in interpret mode
on CPU and compiled on TPU, where it is bit-exact vs the oracle).

Status: validated alternative backend. The production path remains the XLA
batched one-hot matmul in ops/corr.py — its large fused einsums outperform this
kernel's per-query small matmuls (measured ~4x on v5e); revisit if a future
Mosaic toolchain supports data-dependent vector slicing, which would remove the
one-hot dots entirely.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _lookup_kernel(
    base_ref, frac_ref, vol_ref, out_ref, *, k: int, tq: int, hp: int, wp: int
):
    # Everything is vectorized: this Mosaic toolchain lowers neither
    # data-dependent slicing nor scalar extraction from VMEM, so the one-hot
    # support matrices and bilinear weights are built with whole-block vector
    # comparisons / arithmetic, and the per-query loop only uses static indices.
    row_u = jax.lax.broadcasted_iota(jnp.int32, (tq, k + 1, hp), 1)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (tq, k + 1, hp), 2)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (tq, wp, k + 1), 1)
    col_v = jax.lax.broadcasted_iota(jnp.int32, (tq, wp, k + 1), 2)

    by = base_ref[:, 0][:, None, None]  # [tq, 1, 1]
    bx = base_ref[:, 1][:, None, None]
    ry = (row_ids == by + row_u).astype(jnp.float32)  # [tq, K+1, Hp]
    rx = (col_ids == bx + col_v).astype(jnp.float32)  # [tq, Wp, K+1]

    fy = frac_ref[:, 0][:, None, None]  # [tq, 1, 1]
    fx = frac_ref[:, 1][:, None, None]
    w00 = (1.0 - fy) * (1.0 - fx)
    w01 = (1.0 - fy) * fx
    w10 = fy * (1.0 - fx)
    w11 = fy * fx

    for q in range(tq):
        band = jnp.dot(ry[q], vol_ref[q], preferred_element_type=jnp.float32)
        patch = jnp.dot(band, rx[q], preferred_element_type=jnp.float32)  # [K+1, K+1]
        out_ref[q, :, :] = (
            w00[q] * patch[:k, :k]
            + w01[q] * patch[:k, 1:]
            + w10[q] * patch[1:, :k]
            + w11[q] * patch[1:, 1:]
        )  # [K, K] indexed [dy, dx]


def _pad_and_index(vol: jax.Array, coords: jax.Array, radius: int):
    """Zero-pad the target plane and compute clamped window bases + fracs."""
    b, h1, w1, h2, w2 = vol.shape
    k = 2 * radius + 1
    pad = k + 1
    bq = b * h1 * w1
    vp = jnp.pad(
        vol.reshape(bq, h2, w2).astype(jnp.float32),
        ((0, 0), (pad, pad), (pad, pad)),
    )
    xy = coords.reshape(bq, 2)
    fl = jnp.floor(xy)
    frac = (xy - fl).astype(jnp.float32)
    base = fl.astype(jnp.int32) - radius + pad
    base_y = jnp.clip(base[:, 1], 0, h2 + 2 * pad - (k + 1))
    base_x = jnp.clip(base[:, 0], 0, w2 + 2 * pad - (k + 1))
    base_yx = jnp.stack([base_y, base_x], axis=-1)
    frac_yx = jnp.stack([frac[:, 1], frac[:, 0]], axis=-1)
    return vp, base_yx, frac_yx


def lookup_level_pallas(
    vol: jax.Array,
    coords: jax.Array,
    radius: int = 4,
    tq: int = 8,
    interpret: bool = False,
) -> jax.Array:
    """Window-sample one pyramid level: [B, h1, w1, (2r+1)^2]."""
    b, h1, w1, h2, w2 = vol.shape
    k = 2 * radius + 1
    bq = b * h1 * w1
    assert bq % tq == 0, (bq, tq)
    vp, base_yx, frac_yx = _pad_and_index(vol, coords, radius)
    hp, wp = vp.shape[1], vp.shape[2]

    out = pl.pallas_call(
        functools.partial(_lookup_kernel, k=k, tq=tq, hp=hp, wp=wp),
        grid=(bq // tq,),
        in_specs=[
            pl.BlockSpec((tq, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tq, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tq, hp, wp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tq, k, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bq, k, k), jnp.float32),
        interpret=interpret,
    )(base_yx, frac_yx, vp)
    # [dy, dx] -> dx-major channels
    return jnp.transpose(out, (0, 2, 1)).reshape(b, h1, w1, k * k)


def corr_pyramid_lookup_pallas(
    pyramid: list[jax.Array],
    coords: jax.Array,
    radius: int = 4,
    interpret: bool = False,
) -> jax.Array:
    """Drop-in replacement for ops.corr.corr_pyramid_lookup."""
    outs = []
    for i, vol in enumerate(pyramid):
        outs.append(
            lookup_level_pallas(vol, coords / (2.0**i), radius, interpret=interpret)
        )
    return jnp.concatenate(outs, axis=-1)
