"""Compiled-mode (TPU) parity check of the plane lookup kernel vs the einsum
oracle — catches Mosaic lowering issues the CPU interpret-mode tests can't
(scalar SMEM f32 reads, scalar int clip/rem, dynamic rolls)."""
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from flow_supervisor_tpu.kernels import corr_plane as cp
from flow_supervisor_tpu.kernels.corr_lookup_v2 import build_padded_pyramid
from flow_supervisor_tpu.ops.corr import (
    build_corr_pyramid_from_fmaps,
    corr_pyramid_lookup,
)


def main():
    R = 4
    rng = np.random.RandomState(0)
    # realistic-ish level-0 size but small enough to compile fast
    b, h8, w8, c = 1, 16, 32, 64
    f1 = jnp.asarray(rng.randn(b, h8, w8, c), jnp.float32)
    f2 = jnp.asarray(rng.randn(b, h8, w8, c), jnp.float32)
    coords = jnp.asarray(
        np.stack(
            [rng.uniform(-15, w8 + 15, (b, h8, w8)),
             rng.uniform(-15, h8 + 15, (b, h8, w8))], -1,
        ),
        jnp.float32,
    )

    @jax.jit
    def oracle(f1_, f2_, cds):
        vols = build_corr_pyramid_from_fmaps(f1_, f2_, 4, jnp.float32)
        return corr_pyramid_lookup(vols, cds, R, dy_major=True)

    @jax.jit
    def ours(f1_, f2_, cds):
        pyr = build_padded_pyramid(f1_, f2_, 4, R)
        return cp.corr_pyramid_lookup_plane(pyr, cds, R, dy_major=True)

    ref = np.asarray(oracle(f1, f2, coords))
    got = np.asarray(ours(f1, f2, coords))
    d = np.abs(ref - got).max()
    print(f"max|d| = {d:.3e}  (shapes {ref.shape})")
    assert d < 1e-4, d
    print("PASS")


if __name__ == "__main__":
    main()
