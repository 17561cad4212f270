"""Primitive probe: does Mosaic lower jnp.take_along_axis (per-lane dynamic
gather along sublanes) inside a pallas TPU kernel on this toolchain? If yes,
the correlation window extraction can be TILE-parallel (queries in lanes)
instead of a 128-iteration per-query roll loop — the measured bottleneck of
both pallas lookup kernels."""
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def kernel(x_ref, idx_ref, o_ref):
    o_ref[:, :] = jnp.take_along_axis(x_ref[:, :], idx_ref[:, :], axis=0)


def main():
    import signal

    def _alarm(s, f):
        raise RuntimeError("watchdog")

    signal.signal(signal.SIGALRM, _alarm)
    signal.alarm(240)

    n, m, lanes = 512, 160, 128
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(n, lanes), jnp.float32)
    idx = jnp.asarray(rng.randint(0, n, (m, lanes)), jnp.int32)

    out = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec((n, lanes), lambda: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, lanes), lambda: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, lanes), lambda: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, lanes), jnp.float32),
    )(x, idx)
    got = np.asarray(out)
    want = np.take_along_axis(np.asarray(x), np.asarray(idx), axis=0)
    err = np.abs(got - want).max()
    print("take_along_axis in pallas:", "OK" if err == 0 else f"MISMATCH {err}")

    # int32 variant (indices arithmetic in-kernel) + larger source
    n2 = 8192
    x2 = jnp.asarray(rng.randn(n2, lanes), jnp.float32)
    idx2 = jnp.asarray(rng.randint(0, n2, (m, lanes)), jnp.int32)
    out2 = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec((n2, lanes), lambda: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, lanes), lambda: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, lanes), lambda: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, lanes), jnp.float32),
    )(x2, idx2)
    err2 = np.abs(
        np.asarray(out2)
        - np.take_along_axis(np.asarray(x2), np.asarray(idx2), axis=0)
    ).max()
    print("8192-deep source:", "OK" if err2 == 0 else f"MISMATCH {err2}")


if __name__ == "__main__":
    main()
