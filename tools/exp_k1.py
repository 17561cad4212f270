"""K1 kernel: per-query aligned slice + dynamic rolls. Correctness + timing
vs the production einsum lookup at 448x1024 L0 shapes."""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flow_supervisor_tpu.ops.corr import corr_pyramid_lookup, build_corr_pyramid_from_fmaps

R = 4
K = 2 * R + 1          # 9 taps per axis
SUP = K + 1            # 10-row bilinear support
PAD = SUP              # zero pad on all 4 sides


def _round_up(x, m):
    return (x + m - 1) // m * m


def k1_kernel(idx_ref, plane_ref, out_ref, scratch_ref, *, tq, wp, wp_pad):
    for q in range(tq):
        by8 = pl.multiple_of(idx_ref[q, 0], 8)
        offy = idx_ref[q, 1]
        bx = idx_ref[q, 2]
        band = plane_ref[q, pl.ds(by8, 24), :].astype(jnp.float32)  # [24, Wp]
        band = pltpu.roll(band, 24 - offy, axis=0)       # rows at [0..]
        scratch_ref[:, :wp] = band[:16, :]
        patch = pltpu.roll(scratch_ref[:, :], wp_pad - bx, axis=1)  # cols at [0..]
        out_ref[q, :, :] = patch[:SUP, :16]


def prep_level(vol, coords):
    """vol [B,h1,w1,h2,w2] + coords [B,h1,w1,2] -> padded plane + indices."""
    b, h1, w1, h2, w2 = vol.shape
    bq = b * h1 * w1
    hp_data = h2 + 2 * PAD
    wp = w2 + 2 * PAD
    max_base = h2 + 2 * PAD - SUP          # inclusive clamp bound
    hp = _round_up((max_base // 8) * 8 + 24, 8)
    hp = max(hp, hp_data)
    plane = jnp.pad(
        vol.reshape(bq, h2, w2),
        ((0, 0), (PAD, hp - hp_data + PAD), (PAD, PAD)),
    )
    xy = coords.reshape(bq, 2)
    fl = jnp.floor(xy)
    frac = (xy - fl).astype(jnp.float32)
    base = fl.astype(jnp.int32) - R + PAD
    by = jnp.clip(base[:, 1], 0, h2 + 2 * PAD - SUP)
    bx = jnp.clip(base[:, 0], 0, w2 + 2 * PAD - SUP)
    by8 = (by // 8) * 8
    idx = jnp.stack([by8, by - by8, bx], axis=-1)
    return plane, idx, frac


def lookup_level_k1(vol, coords, tq=32):
    b, h1, w1, h2, w2 = vol.shape
    bq = b * h1 * w1
    plane, idx, frac = prep_level(vol, coords)
    hp, wp = plane.shape[1], plane.shape[2]
    wp_pad = _round_up(wp, 128)
    sup = pl.pallas_call(
        functools.partial(k1_kernel, tq=tq, wp=wp, wp_pad=wp_pad),
        grid=(bq // tq,),
        in_specs=[
            pl.BlockSpec((tq, 3), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((tq, hp, wp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tq, SUP, 16), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bq, SUP, 16), jnp.float32),
        scratch_shapes=[pltpu.VMEM((16, wp_pad), jnp.float32)],
    )(idx, plane)
    # bilinear combine outside the kernel (XLA fuses)
    fx = frac[:, 0][:, None, None]
    fy = frac[:, 1][:, None, None]
    p = sup
    out = (
        (1 - fy) * (1 - fx) * p[:, :K, :K]
        + (1 - fy) * fx * p[:, :K, 1 : K + 1]
        + fy * (1 - fx) * p[:, 1 : K + 1, :K]
        + fy * fx * p[:, 1 : K + 1, 1 : K + 1]
    )
    # [dy, dx] -> dx-major channels
    return jnp.transpose(out, (0, 2, 1)).reshape(b, h1, w1, K * K)


def lookup_pyramid_k1(pyramid, coords):
    outs = []
    for i, vol in enumerate(pyramid):
        outs.append(lookup_level_k1(vol, coords / (2.0 ** i)))
    return jnp.concatenate(outs, axis=-1)


def main():
    b, h8, w8, c = 1, 56, 128, 256
    rng = np.random.RandomState(0)
    f1 = jnp.asarray(rng.randn(b, h8, w8, c), jnp.bfloat16)
    f2 = jnp.asarray(rng.randn(b, h8, w8, c), jnp.bfloat16)
    pyr = build_corr_pyramid_from_fmaps(f1, f2, 4, jnp.bfloat16)
    coords = jnp.asarray(
        np.stack(
            [rng.uniform(-20, w8 + 20, (b, h8, w8)), rng.uniform(-20, h8 + 20, (b, h8, w8))],
            -1,
        ),
        jnp.float32,
    )

    ref = jax.jit(lambda p, ct: corr_pyramid_lookup(p, ct, R))(pyr, coords)
    got = jax.jit(lambda p, ct: lookup_pyramid_k1(p, ct))(pyr, coords)
    err = float(jnp.max(jnp.abs(ref - got)))
    print("max abs err vs einsum oracle:", err)

    # timing: 12 sequential lookups with coord dependence (mimics iteration)
    def chain(fn):
        def run(p, ct):
            acc = 0.0
            for _ in range(12):
                out = fn(p, ct)
                ct = ct + 0.001 * out[..., :2]
                acc = acc + jnp.sum(out)
            return acc, ct
        return jax.jit(run)

    for name, fn in [("einsum", lambda p, ct: corr_pyramid_lookup(p, ct, R)),
                     ("k1", lookup_pyramid_k1)]:
        run = chain(fn)
        out = run(pyr, coords); jax.block_until_ready(out)
        n = 10
        t0 = time.perf_counter()
        for i in range(n):
            out = run(pyr, coords + i * 0.01)
            jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / n
        print(f"{name}: {dt*1000:.2f} ms / 12-iter lookup chain")


if __name__ == "__main__":
    main()
