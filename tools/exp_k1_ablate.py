"""Ablate the v2 kernel body to find the wall: DMA streaming vs per-query VPU.

Variants on L0 only, 12-rep chain, planes as jit args:
  full    : slice + cast + 2 rolls + write (production body)
  noroll  : slice + cast + write (no rotates)
  nothing : write a constant (block still streamed by the grid)
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flow_supervisor_tpu.kernels.corr_lookup_v2 import pad_plane, BAND
from flow_supervisor_tpu.ops.corr import build_corr_pyramid_from_fmaps

SUP = 10


def body_full(idx_ref, plane_ref, out_ref, scratch_ref, *, tq, wp, wp_pad):
    for q in range(tq):
        by8 = pl.multiple_of(idx_ref[q, 0], 8)
        offy = idx_ref[q, 1]
        bx = idx_ref[q, 2]
        band = plane_ref[q, pl.ds(by8, BAND), :].astype(jnp.float32)
        band = pltpu.roll(band, BAND - offy, axis=0)
        scratch_ref[:, :wp] = band[:16, :]
        patch = pltpu.roll(scratch_ref[:, :], wp_pad - bx, axis=1)
        out_ref[q, :, :] = patch[:SUP, :16]


def body_noroll(idx_ref, plane_ref, out_ref, scratch_ref, *, tq, wp, wp_pad):
    for q in range(tq):
        by8 = pl.multiple_of(idx_ref[q, 0], 8)
        band = plane_ref[q, pl.ds(by8, 16), :].astype(jnp.float32)
        out_ref[q, :, :] = band[:SUP, :16]


def body_nothing(idx_ref, plane_ref, out_ref, scratch_ref, *, tq, wp, wp_pad):
    out_ref[:, :, :] = jnp.zeros(out_ref.shape, jnp.float32)


def run_level(body, plane, idx, tq):
    bq, hp, wp = plane.shape
    wp_pad = (wp + 127) // 128 * 128
    return pl.pallas_call(
        functools.partial(body, tq=tq, wp=wp, wp_pad=wp_pad),
        grid=(bq // tq,),
        in_specs=[
            pl.BlockSpec((tq, 3), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((tq, hp, wp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tq, SUP, 16), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bq, SUP, 16), jnp.float32),
        scratch_shapes=[pltpu.VMEM((16, wp_pad), jnp.float32)],
    )(idx, plane)


def main():
    rng = np.random.RandomState(0)
    b, h8, w8, c = 1, 56, 128, 256
    f1 = jnp.asarray(rng.randn(b, h8, w8, c), jnp.bfloat16)
    f2 = jnp.asarray(rng.randn(b, h8, w8, c), jnp.bfloat16)
    vol = build_corr_pyramid_from_fmaps(f1, f2, 1, jnp.bfloat16)[0]
    plane = pad_plane(vol, 4)
    bq = plane.shape[0]
    idx_np = np.stack(
        [
            (rng.randint(0, 66, bq) // 8) * 8,
            rng.randint(0, 8, bq),
            rng.randint(0, 138, bq),
        ],
        -1,
    ).astype(np.int32)
    idx = jnp.asarray(idx_np)

    for tq in (16, 32):
        for name, body in (("full", body_full), ("noroll", body_noroll), ("nothing", body_nothing)):
            def chain(plane, idx):
                acc = 0.0
                for r in range(12):
                    out = run_level(body, plane, idx, tq)
                    acc = acc + jnp.sum(out) * (r + 1)
                return acc
            crun = jax.jit(chain)
            v = float(crun(plane, idx))
            t0 = time.perf_counter()
            n = 8
            for i in range(n):
                float(crun(plane + jnp.bfloat16(i * 1e-3), idx))
            dt = (time.perf_counter() - t0) / n
            print(f"tq={tq} {name}: {dt*1000:.2f} ms / 12 L0 lookups", flush=True)


if __name__ == "__main__":
    main()
