"""Probe: aligned dynamic slice + dynamic roll for exact window extraction."""
import traceback

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TQ, HP, WP = 8, 96, 148
K1 = 10
vol = (jnp.arange(4 * TQ * HP * WP, dtype=jnp.float32).reshape(4 * TQ, HP, WP) % 997)
rng = np.random.RandomState(0)
base_np = np.stack(
    [rng.randint(0, HP - 24, 4 * TQ), rng.randint(0, WP - K1, 4 * TQ)], -1
)
base = jnp.asarray(base_np, jnp.int32)


def kern(b_ref, v_ref, o_ref):
    for q in range(TQ):
        by = b_ref[q, 0]
        bx = b_ref[q, 1]
        by8 = pl.multiple_of((by // 8) * 8, 8)
        off_y = by - by8
        band24 = v_ref[q, pl.ds(by8, 24), :]            # aligned dyn slice
        band = pltpu.roll(band24, shift=-off_y, axis=0)  # dynamic sublane roll
        band = pltpu.roll(band, shift=-bx, axis=1)       # dynamic lane roll
        o_ref[q, :, :] = band[:K1, :K1]


def main():
    try:
        out = pl.pallas_call(
            kern,
            grid=(4,),
            in_specs=[
                pl.BlockSpec((TQ, 2), lambda i: (i, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((TQ, HP, WP), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (TQ, K1, K1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((4 * TQ, K1, K1), jnp.float32),
        )(base, vol)
        out = np.asarray(out)
        vol_np = np.asarray(vol)
        bad = 0
        for q in range(4 * TQ):
            by, bx = base_np[q]
            ref = vol_np[q, by : by + K1, bx : bx + K1]
            if not np.allclose(out[q], ref):
                bad += 1
        print(f"LOWERED, mismatches={bad}/{4*TQ}")
    except Exception:
        traceback.print_exc()


main()
