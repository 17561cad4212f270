"""corr_lookup_v2 (slice+roll Pallas kernel) vs the einsum oracle.

On CPU the kernel runs in interpret mode; on TPU it is compiled and bit-exact
(tools/exp_k1*.py measured max err 0.0 at 448x1024 shapes).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from flow_supervisor_tpu.kernels import corr_lookup_v2 as v2
from flow_supervisor_tpu.ops.corr import (
    build_corr_pyramid_from_fmaps,
    corr_pyramid_lookup,
)

R = 4


@pytest.fixture(scope="module")
def setup():
    rng = np.random.RandomState(0)
    b, h8, w8, c = 1, 16, 24, 32
    f1 = jnp.asarray(rng.randn(b, h8, w8, c), jnp.float32)
    f2 = jnp.asarray(rng.randn(b, h8, w8, c), jnp.float32)
    vols = build_corr_pyramid_from_fmaps(f1, f2, 4, jnp.float32)
    pyr = v2.PaddedPyramid(
        planes=[v2.pad_plane(vv, R) for vv in vols],
        shapes=tuple(vv.shape[3:5] for vv in vols),
        radius=R,
    )
    # coords cover in-bounds, partially and fully out-of-bounds queries
    coords = jnp.asarray(
        np.stack(
            [rng.uniform(-30, w8 + 30, (b, h8, w8)),
             rng.uniform(-30, h8 + 30, (b, h8, w8))], -1,
        ),
        jnp.float32,
    )
    return vols, pyr, coords


def _interp_lookup(pyr, coords):
    # interpret mode auto-selected off-TPU
    return v2._lookup_impl(list(pyr.planes), pyr.shapes, pyr.radius, coords)


def test_matches_einsum_oracle(setup):
    vols, pyr, coords = setup
    ref = corr_pyramid_lookup(vols, coords, R)
    got = _interp_lookup(pyr, coords)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_padded_pyramid_is_pytree(setup):
    _, pyr, _ = setup
    leaves, treedef = jax.tree_util.tree_flatten(pyr)
    assert len(leaves) == 4
    back = jax.tree_util.tree_unflatten(treedef, leaves)
    assert back.shapes == pyr.shapes and back.radius == R


def test_vjp_matches_oracle(setup):
    vols, pyr, coords = setup
    g = jnp.asarray(
        np.random.RandomState(1).randn(1, 16, 24, 4 * 81), jnp.float32
    )

    def ours(planes):
        # interpret-mode forward with the custom bwd
        out = v2._lookup(list(planes), pyr.shapes, R, coords)
        return jnp.vdot(out, g)

    def oracle(planes):
        vols_ = [
            p[:, :h2, :w2].reshape(1, 16, 24, h2, w2)
            for p, (h2, w2) in zip(planes, pyr.shapes)
        ]
        out = corr_pyramid_lookup(vols_, coords, R)
        return jnp.vdot(out, g)

    d_oracle = jax.grad(oracle)(list(pyr.planes))
    # the custom vjp is closed-form (corr_fused.lookup_vjp_dvols) — check it
    # against the oracle's autodiff end-to-end
    d_ours = jax.grad(ours)(list(pyr.planes))
    for a, b in zip(d_ours, d_oracle):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_pick_tq():
    assert v2._pick_tq(7168) == 128
    assert v2._pick_tq(4500) == 4
    assert v2._pick_tq(7) == 1
