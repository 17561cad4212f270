"""Bisect the Mosaic failure: which feature breaks?"""
import functools
import traceback

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def attempt(name, kern, in_specs, out_specs, out_shape, args, full_err=False):
    try:
        out = pl.pallas_call(
            kern,
            grid=(4,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
        )(*args)
        np.asarray(out)
        print(f"{name}: OK")
        return True
    except Exception as e:  # noqa: BLE001
        if full_err:
            traceback.print_exc()
        print(f"{name}: FAIL {type(e).__name__}: {str(e).splitlines()[0][:160]}")
        return False


TQ, HP, WP = 8, 76, 148
vol = jnp.arange(4 * TQ * HP * WP, dtype=jnp.float32).reshape(4 * TQ, HP, WP) % 997
base = jnp.asarray(np.random.RandomState(0).randint(1, 40, (4 * TQ, 2)), jnp.int32)

# 1: SMEM input read as scalar, copied to out (scalar->SMEM out)
def k1(b_ref, o_ref):
    for q in range(TQ):
        o_ref[q, 0] = b_ref[q, 0]

attempt(
    "1 smem scalar passthrough",
    k1,
    [pl.BlockSpec((TQ, 2), lambda i: (i, 0), memory_space=pltpu.SMEM)],
    pl.BlockSpec((TQ, 2), lambda i: (i, 0), memory_space=pltpu.SMEM),
    jax.ShapeDtypeStruct((4 * TQ, 2), jnp.int32),
    (base,),
)

# 2: static slice of vol rows -> out
def k2(v_ref, o_ref):
    for q in range(TQ):
        o_ref[q, :, :] = v_ref[q, 3:13, :]

attempt(
    "2 static slice",
    k2,
    [pl.BlockSpec((TQ, HP, WP), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)],
    pl.BlockSpec((TQ, 10, WP), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
    jax.ShapeDtypeStruct((4 * TQ, 10, WP), jnp.float32),
    (vol,),
)

# 3: dynamic slice with SMEM scalar start, sublane dim
def k3(b_ref, v_ref, o_ref):
    for q in range(TQ):
        by = b_ref[q, 0]
        o_ref[q, :, :] = v_ref[q, pl.ds(by, 10), :]

attempt(
    "3 dyn sublane slice (smem start)",
    k3,
    [
        pl.BlockSpec((TQ, 2), lambda i: (i, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((TQ, HP, WP), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
    ],
    pl.BlockSpec((TQ, 10, WP), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
    jax.ShapeDtypeStruct((4 * TQ, 10, WP), jnp.float32),
    (base, vol),
    full_err=True,
)
