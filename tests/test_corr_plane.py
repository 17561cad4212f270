"""corr_plane (materialized-plane lookup with in-kernel combine) vs the
einsum oracle.

On CPU the kernel runs in interpret mode; on TPU it is compiled. Must agree
with the materialized-volume one-hot-einsum oracle (ops/corr.py) everywhere:
partially and fully out-of-bounds windows, both channel orders, bf16 planes,
query counts that are not 128-divisible (KITTI-class shapes), and gradients
w.r.t. the planes (the closed-form VJP shared with corr_lookup_v2).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from flow_supervisor_tpu.kernels import corr_plane as cp
from flow_supervisor_tpu.kernels.corr_lookup_v2 import build_padded_pyramid
from flow_supervisor_tpu.ops.corr import (
    build_corr_pyramid_from_fmaps,
    corr_pyramid_lookup,
)

R = 4


def _setup(c=16, b=1, h8=8, w8=16, seed=0):
    rng = np.random.RandomState(seed)
    f1 = jnp.asarray(rng.randn(b, h8, w8, c), jnp.float32)
    f2 = jnp.asarray(rng.randn(b, h8, w8, c), jnp.float32)
    coords = jnp.asarray(
        np.stack(
            [rng.uniform(-15, w8 + 15, (b, h8, w8)),
             rng.uniform(-15, h8 + 15, (b, h8, w8))], -1,
        ),
        jnp.float32,
    )
    return f1, f2, coords


@pytest.mark.parametrize("dy_major", [False, True])
def test_matches_einsum_oracle(dy_major):
    f1, f2, coords = _setup()
    vols = build_corr_pyramid_from_fmaps(f1, f2, 4, jnp.float32)
    ref = corr_pyramid_lookup(vols, coords, R, dy_major=dy_major)
    pyr = build_padded_pyramid(f1, f2, 4, R)
    got = cp.corr_pyramid_lookup_plane(pyr, coords, R, dy_major=dy_major)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_batched():
    f1a, f2a, ca = _setup(seed=1)
    f1b, f2b, cb = _setup(seed=2)
    f1 = jnp.concatenate([f1a, f1b])
    f2 = jnp.concatenate([f2a, f2b])
    coords = jnp.concatenate([ca, cb])
    vols = build_corr_pyramid_from_fmaps(f1, f2, 2, jnp.float32)
    ref = corr_pyramid_lookup(vols, coords, R)
    pyr = build_padded_pyramid(f1, f2, 2, R)
    got = cp.corr_pyramid_lookup_plane(pyr, coords, R)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_query_count_not_pow2_divisible():
    """KITTI-class query counts (no large power-of-two divisor): the pyramid
    pads BQ to a 128-multiple at build time and the lookup slices it back."""
    f1, f2, coords = _setup(h8=5, w8=9)  # q = 45
    vols = build_corr_pyramid_from_fmaps(f1, f2, 4, jnp.float32)
    ref = corr_pyramid_lookup(vols, coords, R, dy_major=True)
    pyr = build_padded_pyramid(f1, f2, 4, R)
    assert pyr.planes[0].shape[0] == 128  # padded query axis
    got = cp.corr_pyramid_lookup_plane(pyr, coords, R, dy_major=True)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_bf16_planes():
    f1, f2, coords = _setup(c=32)
    vols = build_corr_pyramid_from_fmaps(f1, f2, 1, jnp.float32)
    ref = corr_pyramid_lookup(vols, coords, R)[..., :81]
    pyr = build_padded_pyramid(f1, f2, 1, R, out_dtype=jnp.bfloat16)
    assert pyr.planes[0].dtype == jnp.bfloat16
    got = cp.corr_pyramid_lookup_plane(pyr, coords, R)
    assert got.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=0.15)


@pytest.mark.parametrize("dy_major", [False, True])
def test_vjp_matches_oracle_autodiff(dy_major):
    """d(planes) agrees with autodiff through the materialized-volume oracle;
    closed-form (nothing of the forward re-runs)."""
    f1, f2, coords = _setup(c=16)
    g = jnp.asarray(
        np.random.RandomState(3).randn(1, 8, 16, 2 * 81), jnp.float32
    )

    def oracle(f1_, f2_):
        vols = build_corr_pyramid_from_fmaps(f1_, f2_, 2, jnp.float32)
        return jnp.vdot(
            corr_pyramid_lookup(vols, coords, R, dy_major=dy_major), g
        )

    def ours(f1_, f2_):
        pyr = build_padded_pyramid(f1_, f2_, 2, R)
        return jnp.vdot(
            cp.corr_pyramid_lookup_plane(pyr, coords, R, dy_major=dy_major), g
        )

    do1, do2 = jax.grad(oracle, argnums=(0, 1))(f1, f2)
    dm1, dm2 = jax.grad(ours, argnums=(0, 1))(f1, f2)
    np.testing.assert_allclose(np.asarray(dm1), np.asarray(do1), atol=2e-4)
    np.testing.assert_allclose(np.asarray(dm2), np.asarray(do2), atol=2e-4)


def test_vjp_bf16_cotangent_close_to_fp32():
    """bf16 lookup output -> bf16 transient d_vol in the shared
    lookup_vjp_dvols (corr_fused.py): the plane backend's backward must stay
    close to its all-fp32 path."""
    f1, f2, coords = _setup(c=16)
    g = jnp.asarray(
        np.random.RandomState(3).randn(1, 8, 16, 2 * 81), jnp.float32
    )

    def loss(f1_, f2_, dt):
        pyr = build_padded_pyramid(f1_, f2_, 2, R)
        out = cp.corr_pyramid_lookup_plane(pyr, coords, R, out_dtype=dt)
        return jnp.vdot(out.astype(jnp.float32), g)

    d32 = jax.grad(lambda a_, b_: loss(a_, b_, jnp.float32), (0, 1))(f1, f2)
    d16 = jax.grad(lambda a_, b_: loss(a_, b_, jnp.bfloat16), (0, 1))(f1, f2)
    for a, b in zip(d16, d32):
        a, b = np.asarray(a), np.asarray(b)
        assert np.abs(a - b).max() / np.abs(b).max() < 2e-2


def test_plan_groups_packing():
    """448x1024-family shapes: levels 1-3 (64+32+16 lanes) share ONE 128-lane
    group; level 0 (128) gets its own. KITTI-family: the wide level 0 (156)
    stays alone unpadded, 78+39 pack, 19 starts a new group (first-fit)."""
    from flow_supervisor_tpu.kernels.corr_plane import _plan_groups

    meta, plans = _plan_groups(((56, 128), (28, 64), (14, 32), (7, 16)))
    assert [m[0] for m in meta] == [0, 1, 1, 1]  # group ids
    assert [m[1] for m in meta] == [0, 0, 64, 96]  # lane offsets
    assert plans == ((56, 128), (32, 128))  # (hp_g, wg): 88 rows vs 176 old

    meta, plans = _plan_groups(((47, 156), (24, 78), (12, 39), (6, 19)))
    assert [m[0] for m in meta] == [0, 1, 1, 2]
    assert [m[1] for m in meta] == [0, 0, 78, 0]
    assert plans[0] == (48, 156)  # wide level: natural width, scratch path


def test_wide_level_scratch_path():
    """w2 > 128 (KITTI-class level 0) takes the staged-scratch roll path —
    exercise it against the oracle with an asymmetric fmap pair (small query
    grid, wide target grid) so interpret mode stays tractable."""
    rng = np.random.RandomState(4)
    f1 = jnp.asarray(rng.randn(1, 2, 4, 8), jnp.float32)
    f2 = jnp.asarray(rng.randn(1, 12, 156, 8), jnp.float32)
    coords = jnp.asarray(
        np.stack(
            [rng.uniform(-12, 168, (1, 2, 4)), rng.uniform(-12, 24, (1, 2, 4))],
            -1,
        ),
        jnp.float32,
    )
    vols = build_corr_pyramid_from_fmaps(f1, f2, 2, jnp.float32)
    ref = corr_pyramid_lookup(vols, coords, R)
    pyr = build_padded_pyramid(f1, f2, 2, R)
    packed = cp.pack_padded(pyr)
    assert packed.groups[0].shape[2] == 156  # unpadded wide group
    assert packed.groups[1].shape[2] == 128  # level 1 (78) lane-padded group
    got = cp.corr_pyramid_lookup_plane(pyr, coords, R)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_model_forward_with_plane_backend():
    """RAFT forward with lookup_backend='plane' matches the einsum backend."""
    from flow_supervisor_tpu.models import RAFT, RAFTConfig

    rng = np.random.RandomState(0)
    img1 = jnp.asarray(rng.rand(1, 64, 96, 3), jnp.float32)
    img2 = jnp.asarray(rng.rand(1, 64, 96, 3), jnp.float32)
    outs = {}
    for backend in ("einsum", "plane"):
        cfg = RAFTConfig(iters=2, lookup_backend=backend).resolved()
        model = RAFT(cfg)
        v = model.init(jax.random.PRNGKey(0), img1, img2, train=False)
        outs[backend] = model.apply(v, img1, img2, train=False)["flow_up"][-1]
    np.testing.assert_allclose(
        np.asarray(outs["plane"]), np.asarray(outs["einsum"]),
        atol=5e-4, rtol=0,
    )
