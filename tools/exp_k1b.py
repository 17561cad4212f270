"""K1 v2: pad planes once per forward; scan tq; per-level breakdown."""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flow_supervisor_tpu.ops.corr import corr_pyramid_lookup, build_corr_pyramid_from_fmaps

R = 4
K = 2 * R + 1
SUP = K + 1
PAD = SUP


def _round_up(x, m):
    return (x + m - 1) // m * m


def k1_kernel(idx_ref, plane_ref, out_ref, scratch_ref, *, tq, wp, wp_pad):
    for q in range(tq):
        by8 = pl.multiple_of(idx_ref[q, 0], 8)
        offy = idx_ref[q, 1]
        bx = idx_ref[q, 2]
        band = plane_ref[q, pl.ds(by8, 24), :].astype(jnp.float32)
        band = pltpu.roll(band, 24 - offy, axis=0)
        scratch_ref[:, :wp] = band[:16, :]
        patch = pltpu.roll(scratch_ref[:, :], wp_pad - bx, axis=1)
        out_ref[q, :, :] = patch[:SUP, :16]


def pad_plane(vol):
    """[B,h1,w1,h2,w2] -> [BQ, Hp, Wp] zero-padded plane (once per forward)."""
    b, h1, w1, h2, w2 = vol.shape
    bq = b * h1 * w1
    hp_data = h2 + 2 * PAD
    max_base = h2 + 2 * PAD - SUP
    hp = max(_round_up((max_base // 8) * 8 + 24, 8), hp_data)
    return jnp.pad(
        vol.reshape(bq, h2, w2), ((0, 0), (PAD, hp - hp_data + PAD), (PAD, PAD))
    ), (h2, w2)


def lookup_level_plane(plane, hw, coords, tq):
    h2, w2 = hw
    bq, hp, wp = plane.shape
    b, h1, w1, _ = coords.shape
    xy = coords.reshape(bq, 2)
    fl = jnp.floor(xy)
    frac = (xy - fl).astype(jnp.float32)
    base = fl.astype(jnp.int32) - R + PAD
    by = jnp.clip(base[:, 1], 0, h2 + 2 * PAD - SUP)
    bx = jnp.clip(base[:, 0], 0, w2 + 2 * PAD - SUP)
    by8 = (by // 8) * 8
    idx = jnp.stack([by8, by - by8, bx], axis=-1)
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
    fx = frac[:, 0][:, None, None]
    fy = frac[:, 1][:, None, None]
    p = sup
    out = (
        (1 - fy) * (1 - fx) * p[:, :K, :K]
        + (1 - fy) * fx * p[:, :K, 1 : K + 1]
        + fy * (1 - fx) * p[:, 1 : K + 1, :K]
        + fy * fx * p[:, 1 : K + 1, 1 : K + 1]
    )
    return jnp.transpose(out, (0, 2, 1)).reshape(b, h1, w1, K * K)


def main():
    b, h8, w8, c = 1, 56, 128, 256
    rng = np.random.RandomState(0)
    f1 = jnp.asarray(rng.randn(b, h8, w8, c), jnp.bfloat16)
    f2 = jnp.asarray(rng.randn(b, h8, w8, c), jnp.bfloat16)
    pyr = build_corr_pyramid_from_fmaps(f1, f2, 4, jnp.bfloat16)
    planes = [pad_plane(v) for v in pyr]
    coords = jnp.asarray(
        np.stack(
            [rng.uniform(-20, w8 + 20, (b, h8, w8)), rng.uniform(-20, h8 + 20, (b, h8, w8))],
            -1,
        ),
        jnp.float32,
    )

    plane_list = [p for p, _ in planes]

    def bench(fn, n=10, reps=12):
        # planes passed as jit ARGUMENTS: captured arrays would be inlined as
        # HLO constants and blow past the remote-compile upload limit
        def chain(pl_args, ct):
            acc = 0.0
            for _ in range(reps):
                out = fn(pl_args, ct)
                ct = ct + 0.001 * out[..., :2]
                acc = acc + jnp.sum(out)
            return acc
        crun = jax.jit(chain)
        jax.block_until_ready(crun(plane_list, coords))
        t0 = time.perf_counter()
        for i in range(n):
            jax.block_until_ready(crun(plane_list, coords + i * 0.01))
        return (time.perf_counter() - t0) / n * 1000

    def k1_all(tq):
        def fn(pl_args, ct):
            return jnp.concatenate(
                [
                    lookup_level_plane(p, hw, ct / (2.0 ** i), tq)
                    for i, (p, (_, hw)) in enumerate(zip(pl_args, planes))
                ],
                axis=-1,
            )
        return fn

    # correctness
    ref = jax.jit(lambda v, ct: corr_pyramid_lookup(v, ct, R))(pyr, coords)
    got = jax.jit(k1_all(8))(plane_list, coords)
    print("max err:", float(jnp.max(jnp.abs(ref - got))))

    print("einsum all-levels:", f"{bench(lambda _, ct: corr_pyramid_lookup(pyr, ct, R)):.2f} ms")
    for tq in (8, 16, 32, 64):
        try:
            print(f"k1 all-levels tq={tq}:", f"{bench(k1_all(tq)):.2f} ms")
        except Exception as e:
            print(f"k1 all-levels tq={tq}: FAIL {str(e)[:80]}")


if __name__ == "__main__":
    main()
