"""All-pairs correlation volume, pooled pyramid, and (2r+1)^2 bilinear lookup.

Behavioral contract (matching reference ``raft/allfield.py``):

- ``all_pairs_correlation``: corr[b, i, j, k, l] = <fmap1[b,i,j], fmap2[b,k,l]> / sqrt(C)
  (``calc_all_field``, allfield.py:62-92). The matmul accumulates in fp32 on the MXU.
- ``build_corr_pyramid``: level i pools the ORIGINAL volume's last two (target) dims
  with an average pool of kernel=stride=2^i and TF 'SAME' padding, where edge
  windows average only the valid taps (allfield.py:80-92 pools with scale 2,4,8
  applied to the unpooled volume each time — NOT cascaded).
- ``corr_pyramid_lookup``: for each level i, bilinearly samples the volume at
  coords/2^i + delta for every offset delta in the (2r+1)^2 window; out-of-bounds
  taps contribute 0; offsets are enumerated dx-major / dy-minor, matching the TF
  reference's channel order (``smurf_corr_block``, allfield.py:109-135); levels are
  concatenated along channels.
- ``transpose_corr_volume``: swap source/target pixels so one matmul serves both
  flow directions (reference backward-flow trick, raft/unsup.py:122-127).

The production lookup (``corr_pyramid_lookup``) is GATHER-FREE: bilinear window
sampling is expressed as two batched one-hot matmuls on the MXU, with the
gather formulation kept as a correctness oracle. The pyramid itself is built
from POOLED FEATURE MAPS (``build_corr_pyramid_from_fmaps``) — average pooling
over target pixels commutes with the inner product — replacing both the 5-D
volume pooling and the backward-direction transpose.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def all_pairs_correlation(
    fmap1: jax.Array, fmap2: jax.Array, out_dtype=jnp.float32
) -> jax.Array:
    """corr volume [B, H1, W1, H2, W2] = fmap1 . fmap2^T / sqrt(C).

    fmap2 may have a different (pooled) spatial size than fmap1."""
    b, h1, w1, c = fmap1.shape
    _, h2, w2, c2 = fmap2.shape
    assert c == c2, (fmap1.shape, fmap2.shape)
    a = fmap1.reshape(b, h1 * w1, c)
    bb = fmap2.reshape(b, h2 * w2, c)
    # bf16 inputs already accumulate in fp32 on the MXU; HIGHEST only matters
    # (and only costs extra passes) for fp32 inputs.
    precision = (
        jax.lax.Precision.HIGHEST
        if fmap1.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    corr = jax.lax.dot_general(
        a,
        bb,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    corr = corr / jnp.sqrt(jnp.asarray(c, jnp.float32))
    return corr.astype(out_dtype).reshape(b, h1, w1, h2, w2)


def _avg_pool_same(vol: jax.Array, k: int) -> jax.Array:
    """TF-style 'SAME' average pool with kernel=stride=k over the last two dims,
    dividing each window by its number of in-bounds taps."""
    b, h1, w1, h2, w2 = vol.shape
    window = (1, 1, 1, k, k)
    summed = jax.lax.reduce_window(
        vol, 0.0, jax.lax.add, window, window, "SAME"
    )
    ones = jnp.ones((1, 1, 1, h2, w2), vol.dtype)
    counts = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add, window, window, "SAME"
    )
    return summed / counts


def build_corr_pyramid(vol: jax.Array, num_levels: int = 4) -> list[jax.Array]:
    """[vol, pool_2(vol), pool_4(vol), ...] — each level pools the original volume."""
    pyramid = [vol]
    scale = 2
    for _ in range(num_levels - 1):
        pyramid.append(_avg_pool_same(vol, scale))
        scale *= 2
    return pyramid


def transpose_corr_volume(vol: jax.Array) -> jax.Array:
    """Swap (source, target) pixel axes: [B, H, W, h, w] -> [B, h, w, H, W]."""
    return jnp.transpose(vol, (0, 3, 4, 1, 2))


def _avg_pool_fmap_same(fmap: jax.Array, k: int) -> jax.Array:
    """TF-'SAME' count-aware average pool over the spatial dims of an NHWC map."""
    b, h, w, c = fmap.shape
    window = (1, k, k, 1)
    summed = jax.lax.reduce_window(
        fmap.astype(jnp.float32), 0.0, jax.lax.add, window, window, "SAME"
    )
    counts = jax.lax.reduce_window(
        jnp.ones((1, h, w, 1), jnp.float32), 0.0, jax.lax.add, window, window, "SAME"
    )
    return (summed / counts).astype(fmap.dtype)


def build_corr_pyramid_from_fmaps(
    fmap1: jax.Array, fmap2: jax.Array, num_levels: int = 4,
    out_dtype=jnp.float32,
) -> list[jax.Array]:
    """Pyramid via pooled FEATURE maps instead of pooling the 5-D volume.

    Average pooling over target pixels commutes with the inner product:
    pool_k(corr)[q, p'] = <f1_q, pool_k(f2)[p']>, including TF-'SAME' partial
    edge windows (both sides divide by the same tap count). Identical result to
    ``build_corr_pyramid(all_pairs_correlation(f1, f2))`` up to fp reassociation,
    but pools a [H/8, W/8, C] map instead of a [Q, H/8, W/8] volume, and gives
    the backward direction for free (swap the arguments) — no giant transpose
    (the reference transposes the full volume, raft/unsup.py:122-127).
    """
    pyramid = [all_pairs_correlation(fmap1, fmap2, out_dtype)]
    scale = 2
    for _ in range(num_levels - 1):
        pooled = _avg_pool_fmap_same(fmap2, scale)
        pyramid.append(all_pairs_correlation(fmap1, pooled, out_dtype))
        scale *= 2
    return pyramid


def _lookup_window_offsets(radius: int, dtype=jnp.float32) -> jax.Array:
    """[(2r+1)^2, 2] (x, y) offsets, dx-major / dy-minor (TF reference order)."""
    r = radius
    k = 2 * r + 1
    dx = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0) - r
    dy = jax.lax.broadcasted_iota(jnp.int32, (k, k), 1) - r
    return jnp.stack([dx, dy], axis=-1).reshape(k * k, 2).astype(dtype)


def _lookup_level(vol: jax.Array, coords: jax.Array, radius: int) -> jax.Array:
    """Sample one pyramid level.

    vol:    [B, h1, w1, h2, w2] correlation at this level
    coords: [B, h1, w1, 2] query centers (x, y), already divided by 2^level
    out:    [B, h1, w1, (2r+1)^2]
    """
    b, h1, w1, h2, w2 = vol.shape
    k2 = (2 * radius + 1) ** 2
    flat = vol.reshape(b, h1 * w1, h2 * w2)

    delta = _lookup_window_offsets(radius, coords.dtype)  # [k2, 2]
    q = coords.reshape(b, h1 * w1, 1, 2) + delta[None, None]  # [B, Q, k2, 2]

    x, y = q[..., 0], q[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    dx = x - x0
    dy = y - y0

    def tap(xi, yi, wgt):
        valid = (xi >= 0) & (xi <= w2 - 1) & (yi >= 0) & (yi <= h2 - 1)
        xi_c = jnp.clip(xi, 0, w2 - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, h2 - 1).astype(jnp.int32)
        idx = yi_c * w2 + xi_c  # [B, Q, k2]
        vals = jnp.take_along_axis(flat, idx, axis=2)
        return vals * jnp.where(valid, wgt, 0.0).astype(vals.dtype)

    out = (
        tap(x0, y0, (1.0 - dx) * (1.0 - dy))
        + tap(x0 + 1.0, y0, dx * (1.0 - dy))
        + tap(x0, y0 + 1.0, (1.0 - dx) * dy)
        + tap(x0 + 1.0, y0 + 1.0, dx * dy)
    )
    return out.reshape(b, h1, w1, k2)


def corr_pyramid_lookup_gather(
    pyramid: list[jax.Array], coords: jax.Array, radius: int = 4
) -> jax.Array:
    """Gather-based reference implementation (correctness oracle)."""
    outs = []
    for i, vol in enumerate(pyramid):
        outs.append(_lookup_level(vol, coords / (2.0**i), radius))
    return jnp.concatenate(outs, axis=-1)


def _interp_matrix(pos: jax.Array, size: int, radius: int) -> jax.Array:
    """One-hot support matrix R[b, q, K+1, size]: R[..., u, c] = 1 iff
    c == floor(pos) + u - radius. Out-of-range supports match no column, which
    reproduces the OOB->0 tap semantics exactly."""
    b, q = pos.shape
    base = jnp.floor(pos).astype(jnp.int32)  # [b, q]
    u = jax.lax.broadcasted_iota(jnp.int32, (2 * radius + 2, 1), 0)  # [K+1, 1]
    c = jax.lax.broadcasted_iota(jnp.int32, (1, size), 1)  # [1, size]
    support = base[..., None, None] + (u - radius)[None, None]  # [b, q, K+1, 1]
    return (support == c[None, None]).astype(jnp.float32)


def _lookup_level_matmul(
    vol: jax.Array, coords: jax.Array, radius: int, dy_major: bool = False
) -> jax.Array:
    """Gather-free lookup: patch[q] = R_y[q] @ vol[q] @ R_x[q]^T, then a 4-tap
    bilinear combine. All heavy work is batched matmul (MXU), no gathers — the
    TPU-native replacement for both the XLA gather path and the reference's
    alt_cuda_corr CUDA kernel (pytorch/alt_cuda_corr/correlation_kernel.cu)."""
    b, h1, w1, h2, w2 = vol.shape
    k = 2 * radius + 1
    q = h1 * w1
    x = coords[..., 0].reshape(b, q)
    y = coords[..., 1].reshape(b, q)
    fx = (x - jnp.floor(x)).astype(jnp.float32)[..., None, None]  # [b, q, 1, 1]
    fy = (y - jnp.floor(y)).astype(jnp.float32)[..., None, None]

    # one-hot matrices are exact in any dtype; keep the volume in its storage
    # dtype (bf16 on the perf path) and accumulate in fp32 on the MXU.
    ry = _interp_matrix(y, h2, radius).astype(vol.dtype)  # [b, q, K+1, h2]
    rx = _interp_matrix(x, w2, radius).astype(vol.dtype)  # [b, q, K+1, w2]
    v = vol.reshape(b, q, h2, w2)

    precision = (
        jax.lax.Precision.HIGHEST
        if vol.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    tmp = jnp.einsum(
        "bquy,bqyx->bqux", ry, v,
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    patch = jnp.einsum(
        "bqux,bqvx->bquv", tmp, rx.astype(jnp.float32),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    # patch[u, v]: u = y-support index, v = x-support index
    p00 = patch[:, :, :k, :k]
    p01 = patch[:, :, :k, 1:]
    p10 = patch[:, :, 1:, :k]
    p11 = patch[:, :, 1:, 1:]
    out = (
        (1.0 - fy) * (1.0 - fx) * p00
        + (1.0 - fy) * fx * p01
        + fy * (1.0 - fx) * p10
        + fy * fx * p11
    )
    if dy_major:
        # natural [dy, dx] order: the consumer folds the dx-major permutation
        # into its first 1x1 conv weights (models/update.py corr_perm)
        return out.reshape(b, h1, w1, k * k)
    # channel order: dx-major (out[..., i_dx * k + j_dy]) — transpose (u, v)
    out = jnp.transpose(out, (0, 1, 3, 2)).reshape(b, h1, w1, k * k)
    return out


def corr_pyramid_lookup(
    pyramid: list[jax.Array],
    coords: jax.Array,
    radius: int = 4,
    dy_major: bool = False,
) -> jax.Array:
    """Concatenated window samples over all levels: [B, h1, w1, L*(2r+1)^2].

    Uses the matmul formulation (gather-free, MXU-friendly); bit-equivalent to
    ``corr_pyramid_lookup_gather`` up to fp32 accumulation order.
    """
    outs = []
    for i, vol in enumerate(pyramid):
        outs.append(_lookup_level_matmul(vol, coords / (2.0**i), radius, dy_major))
    return jnp.concatenate(outs, axis=-1)


# ---- combined-plane lookup: one einsum pair for ALL levels -----------------


def combine_pyramid(pyramid: list[jax.Array]) -> jax.Array:
    """Pack all pyramid levels side-by-side into one plane [B, h1, w1, Hmax, Wtot].

    The lookup's one-hot supports select columns by exact index with per-level
    validity masking, so no gap columns are needed between levels."""
    b, h1, w1, h0, _ = pyramid[0].shape
    padded = []
    for vol in pyramid:
        hl = vol.shape[3]
        padded.append(
            jnp.pad(vol, ((0, 0), (0, 0), (0, 0), (0, h0 - hl), (0, 0)))
        )
    return jnp.concatenate(padded, axis=-1)


def _masked_support(pos, u_size, size, offset, radius, axis_len):
    """One-hot [b, q, u_size, axis_len]: column offset+s matches iff the level
    support s = floor(pos)+u-radius lies in [0, size)."""
    b, q = pos.shape
    base = jnp.floor(pos).astype(jnp.int32)
    u = jax.lax.broadcasted_iota(jnp.int32, (u_size, 1), 0)
    s = base[..., None, None] + (u - radius)[None, None]  # [b, q, u, 1]
    valid = (s >= 0) & (s < size)
    target = jnp.where(valid, s + offset, -1)
    c = jax.lax.broadcasted_iota(jnp.int32, (1, axis_len), 1)
    return (target == c[None, None]).astype(jnp.float32)


def corr_pyramid_lookup_combined(
    combined: jax.Array,
    level_shapes: list[tuple[int, int]],
    coords: jax.Array,
    radius: int = 4,
) -> jax.Array:
    """Lookup over the combined plane: 2 batched einsums per call instead of
    2 per level — 4x fewer dispatches for 4x (tiny) extra FLOPs; the per-level
    diagonal blocks of the joint patch are extracted and bilinearly combined.

    Bit-equivalent to ``corr_pyramid_lookup`` on the same pyramid."""
    b, h1, w1, hmax, wtot = combined.shape
    k = 2 * radius + 1
    q = h1 * w1
    nl = len(level_shapes)
    u_size = k + 1

    rys, rxs, fracs = [], [], []
    x_off = 0
    for i, (hl, wl) in enumerate(level_shapes):
        cl = coords.reshape(b, q, 2) / (2.0**i)
        x, y = cl[..., 0], cl[..., 1]
        rys.append(_masked_support(y, u_size, hl, 0, radius, hmax))
        rxs.append(_masked_support(x, u_size, wl, x_off, radius, wtot))
        fx = (x - jnp.floor(x)).astype(jnp.float32)
        fy = (y - jnp.floor(y)).astype(jnp.float32)
        fracs.append((fx[..., None, None], fy[..., None, None]))
        x_off += wl

    ry = jnp.concatenate(rys, axis=2).astype(combined.dtype)  # [b, q, L*U, Hmax]
    rx = jnp.concatenate(rxs, axis=2).astype(combined.dtype)  # [b, q, L*U, Wtot]
    v = combined.reshape(b, q, hmax, wtot)

    precision = (
        jax.lax.Precision.HIGHEST
        if combined.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    tmp = jnp.einsum(
        "bquy,bqyx->bqux", ry, v,
        preferred_element_type=jnp.float32, precision=precision,
    )
    patch_all = jnp.einsum(
        "bqux,bqvx->bquv", tmp, rx.astype(jnp.float32),
        preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST,
    )  # [b, q, L*U (y), L*U (x)]

    outs = []
    for i in range(nl):
        blk = patch_all[
            :, :, i * u_size : (i + 1) * u_size, i * u_size : (i + 1) * u_size
        ]
        fx, fy = fracs[i]
        out = (
            (1.0 - fy) * (1.0 - fx) * blk[:, :, :k, :k]
            + (1.0 - fy) * fx * blk[:, :, :k, 1:]
            + fy * (1.0 - fx) * blk[:, :, 1:, :k]
            + fy * fx * blk[:, :, 1:, 1:]
        )
        outs.append(jnp.transpose(out, (0, 1, 3, 2)).reshape(b, h1, w1, k * k))
    return jnp.concatenate(outs, axis=-1)
