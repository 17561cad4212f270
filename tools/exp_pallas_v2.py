"""Feasibility probes for the fused corr-lookup kernel v2.

Tests whether this Mosaic toolchain lowers:
  A) sublane dynamic slice with SMEM scalar start:   vol_ref[q, pl.ds(by, K1), :]
  B) lane dynamic slice with SMEM scalar start:      band[:, pl.ds(bx, K1)]
  C) fallback: lane selection via per-query one-hot matmul

Run: python tools/exp_pallas_v2.py
"""
import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K1 = 10  # K+1 window support size (radius 4)


def kernel_a(base_ref, vol_ref, out_ref, *, tq):
    # sublane-dim dynamic slice per query, SMEM scalar start
    for q in range(tq):
        by = base_ref[q, 0]
        out_ref[q, :, :] = vol_ref[q, pl.ds(by, K1), :]


def kernel_b(base_ref, vol_ref, out_ref, *, tq):
    # sublane + lane dynamic slice per query
    for q in range(tq):
        by = base_ref[q, 0]
        bx = base_ref[q, 1]
        out_ref[q, :, :] = vol_ref[q, pl.ds(by, K1), pl.ds(bx, K1)]


def kernel_c(base_ref, vol_ref, out_ref, *, tq, wp):
    # sublane slice + one-hot lane matmul
    col = jax.lax.broadcasted_iota(jnp.int32, (wp, K1), 0)
    sel = jax.lax.broadcasted_iota(jnp.int32, (wp, K1), 1)
    for q in range(tq):
        by = base_ref[q, 0]
        bx = base_ref[q, 1]
        band = vol_ref[q, pl.ds(by, K1), :]
        oh = (col == bx + sel).astype(band.dtype)
        out_ref[q, :, :] = jnp.dot(band, oh, preferred_element_type=jnp.float32)


def run(name, kern, out_w, tq=8, hp=76, wp=148, bq=64):
    vol = jnp.arange(bq * hp * wp, dtype=jnp.float32).reshape(bq, hp, wp) % 997
    rng = np.random.RandomState(0)
    base = jnp.asarray(
        np.stack(
            [rng.randint(0, hp - K1, bq), rng.randint(0, wp - K1, bq)], -1
        ),
        jnp.int32,
    )
    try:
        out = pl.pallas_call(
            functools.partial(kern, tq=tq) if name != "C" else functools.partial(kern, tq=tq, wp=wp),
            grid=(bq // tq,),
            in_specs=[
                pl.BlockSpec((tq, 2), lambda i: (i, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((tq, hp, wp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (tq, K1, out_w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((bq, K1, out_w), jnp.float32),
        )(base, vol)
        out = np.asarray(out)
        # reference
        vol_np = np.asarray(vol)
        base_np = np.asarray(base)
        ok = True
        for q in range(bq):
            by, bx = base_np[q]
            if out_w == wp:
                ref = vol_np[q, by : by + K1, :]
            else:
                ref = vol_np[q, by : by + K1, bx : bx + K1]
            if not np.allclose(out[q], ref):
                ok = False
                break
        print(f"{name}: LOWERED ok={ok}")
        return ok
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:200]
        print(f"{name}: FAILED — {type(e).__name__}: {msg}")
        return False


if __name__ == "__main__":
    a = run("A", kernel_a, out_w=148)
    b = run("B", kernel_b, out_w=K1)
    c = run("C", kernel_c, out_w=K1)
    sys.exit(0)
