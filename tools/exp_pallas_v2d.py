"""Probe battery: vectorized gather support inside Mosaic kernels."""
import traceback

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def attempt(name, kern, in_specs, out_spec, out_shape, args, grid=(4,)):
    try:
        out = pl.pallas_call(
            kern, grid=grid, in_specs=in_specs, out_specs=out_spec,
            out_shape=out_shape,
        )(*args)
        return np.asarray(out)
    except Exception as e:  # noqa: BLE001
        lines = [l for l in str(e).splitlines() if l.strip()]
        key = next((l for l in lines if "Not implemented" in l or "error:" in l or "failed" in l), lines[0] if lines else repr(e)[:150])
        print(f"{name}: FAIL {key.strip()[:150]}")
        return None


rng = np.random.RandomState(0)

# P1: lane-dim take_along_axis on 2-D [128, 148] with per-row indices [128, 16]
v2 = jnp.asarray(rng.randn(4 * 128, 148), jnp.float32).reshape(4, 128, 148)
idx = jnp.asarray(rng.randint(0, 148 - 16, (4, 128, 1)) + np.arange(16)[None, None], jnp.int32)

def p1(v_ref, i_ref, o_ref):
    o_ref[:, :] = jnp.take_along_axis(v_ref[:, :], i_ref[:, :], axis=1)

out = attempt(
    "P1 lane take_along_axis 2D",
    p1,
    [
        pl.BlockSpec((1, 128, 148), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 128, 16), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
    ],
    pl.BlockSpec((1, 128, 16), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
    jax.ShapeDtypeStruct((4, 128, 16), jnp.float32),
    (v2.reshape(4 * 128, 148).reshape(4, 128, 148), idx),
)
# NOTE: block (1,128,148) passes 3-D refs [1,128,148]; adjust kernel to index [0]
if out is None:
    def p1b(v_ref, i_ref, o_ref):
        o_ref[0] = jnp.take_along_axis(v_ref[0], i_ref[0], axis=1)
    out = attempt(
        "P1b lane take_along_axis (3-D ref, [0])",
        p1b,
        [
            pl.BlockSpec((1, 128, 148), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128, 16), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        pl.BlockSpec((1, 128, 16), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        jax.ShapeDtypeStruct((4, 128, 16), jnp.float32),
        (v2, idx),
    )
if out is not None:
    ref = np.take_along_axis(np.asarray(v2), np.asarray(idx), axis=2)
    print("P1 lane gather:", "OK exact" if np.allclose(out, ref) else "LOWERED but WRONG")

# P2: sublane-dim take_along_axis: [128, 148] gather rows with per-?? indices
# want R[u, :] = v[idx[u], :]  (jnp.take along axis 0)
idx0 = jnp.asarray(rng.randint(0, 128, (4, 16, 1)) * np.ones((1, 1, 148), np.int64), jnp.int32)

def p2(v_ref, i_ref, o_ref):
    o_ref[0] = jnp.take_along_axis(v_ref[0], i_ref[0], axis=0)

out = attempt(
    "P2 sublane take_along_axis",
    p2,
    [
        pl.BlockSpec((1, 128, 148), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 16, 148), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
    ],
    pl.BlockSpec((1, 16, 148), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
    jax.ShapeDtypeStruct((4, 16, 148), jnp.float32),
    (v2, idx0),
)
if out is not None:
    ref = np.take_along_axis(np.asarray(v2), np.asarray(idx0), axis=1)
    print("P2 sublane gather:", "OK exact" if np.allclose(out, ref) else "LOWERED but WRONG")

# P3: 3-D lane gather with leading untiled dim: [8, 16, 148] gather axis=2
v3 = jnp.asarray(rng.randn(4, 8, 16, 148), jnp.float32)
i3 = jnp.asarray(rng.randint(0, 148 - 16, (4, 8, 16, 1)) + np.arange(16)[None, None, None], jnp.int32)

def p3(v_ref, i_ref, o_ref):
    o_ref[0] = jnp.take_along_axis(v_ref[0], i_ref[0], axis=2)

out = attempt(
    "P3 3-D lane gather",
    p3,
    [
        pl.BlockSpec((1, 8, 16, 148), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 8, 16, 16), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
    ],
    pl.BlockSpec((1, 8, 16, 16), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
    jax.ShapeDtypeStruct((4, 8, 16, 16), jnp.float32),
    (v3, i3),
)
if out is not None:
    ref = np.take_along_axis(np.asarray(v3), np.asarray(i3), axis=3)
    print("P3 3-D lane gather:", "OK exact" if np.allclose(out, ref) else "LOWERED but WRONG")
