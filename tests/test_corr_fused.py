"""corr_fused (volume-free fused Pallas lookup) vs the einsum oracle.

On CPU the kernel runs in interpret mode; on TPU it is compiled (verified
bit-exact vs the oracle on-chip, both channel orders). The oracle chain
materializes the pooled-fmap pyramid and looks it up with one-hot einsums
(ops/corr.py); the fused kernel recomputes correlation slabs in VMEM from the
feature-map factors — alt_cuda_corr's defining property
(pytorch/alt_cuda_corr/correlation_kernel.cu:19-119) — and must agree
everywhere, including partially and fully out-of-bounds windows, both channel
orders, and gradients w.r.t. BOTH feature maps (reference backward,
correlation_kernel.cu:121-199).

Shapes are kept tiny: the interpret-mode kernel unrolls its per-query loop.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from flow_supervisor_tpu.kernels import corr_fused as cf
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


@pytest.mark.parametrize(
    "c,dy_major",
    [(16, False), (32, True)],  # exact-reciprocal and divide scaling paths
)
def test_matches_einsum_oracle(c, dy_major):
    f1, f2, coords = _setup(c=c)
    vols = build_corr_pyramid_from_fmaps(f1, f2, 4, jnp.float32)
    ref = corr_pyramid_lookup(vols, coords, R, dy_major=dy_major)
    pyr = cf.build_fused_pyramid(f1, f2, 4, R)
    got = cf.corr_pyramid_lookup_fused(pyr, coords, R, dy_major=dy_major)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_batched():
    f1a, f2a, ca = _setup(seed=1)
    f1b, f2b, cb = _setup(seed=2)
    f1 = jnp.concatenate([f1a, f1b])
    f2 = jnp.concatenate([f2a, f2b])
    coords = jnp.concatenate([ca, cb])
    vols = build_corr_pyramid_from_fmaps(f1, f2, 2, jnp.float32)
    ref = corr_pyramid_lookup(vols, coords, R)
    pyr = cf.build_fused_pyramid(f1, f2, 2, R)
    got = cf.corr_pyramid_lookup_fused(pyr, coords, R)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_pyramid_is_pytree():
    f1, f2, _ = _setup()
    pyr = cf.build_fused_pyramid(f1, f2, 4, R)
    leaves, treedef = jax.tree_util.tree_flatten(pyr)
    assert len(leaves) == 5  # f1 + 4 level factors
    back = jax.tree_util.tree_unflatten(treedef, leaves)
    assert back.shapes == pyr.shapes and back.radius == R


@pytest.mark.parametrize("bwd_kernel", [False, True])
@pytest.mark.parametrize("dy_major", [False, True])
def test_vjp_matches_oracle_autodiff(dy_major, bwd_kernel, monkeypatch):
    """Gradients w.r.t. BOTH fmaps agree with autodiff through the
    materialized-volume oracle — and nothing of the forward is re-run: the
    bwd is closed-form transposed einsums over (f1, f2 factors, coords).
    Covers BOTH backward paths: the default einsum VJP (BWD_KERNEL=False,
    the measured winner — tools/exp_bwd_lookup.py) and the opt-in
    volume-free scatter kernel (BWD_KERNEL=True, the memory-bound path)."""
    monkeypatch.setattr(cf, "BWD_KERNEL", bwd_kernel)
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
        pyr = cf.build_fused_pyramid(f1_, f2_, 2, R)
        return jnp.vdot(
            cf.corr_pyramid_lookup_fused(pyr, coords, R, dy_major=dy_major), g
        )

    do1, do2 = jax.grad(oracle, argnums=(0, 1))(f1, f2)
    dm1, dm2 = jax.grad(ours, argnums=(0, 1))(f1, f2)
    np.testing.assert_allclose(np.asarray(dm1), np.asarray(do1), atol=2e-4)
    np.testing.assert_allclose(np.asarray(dm2), np.asarray(do2), atol=2e-4)


def test_vjp_bf16_cotangent_close_to_fp32():
    """The production backward (bf16 cotangents -> bf16 transient d_vol and
    bf16 MXU operands, corr_fused.lookup_vjp_dvols) tracks the all-fp32
    closed-form path to bf16 precision. The transient cotangent volume is the
    lookup backward's dominant HBM traffic; it must not silently re-promote
    to fp32."""
    f1, f2, coords = _setup(c=16)
    g = jnp.asarray(
        np.random.RandomState(3).randn(1, 8, 16, 2 * 81), jnp.float32
    )

    def loss(f1_, f2_, dt):
        pyr = cf.build_fused_pyramid(f1_, f2_, 2, R)
        out = cf.corr_pyramid_lookup_fused(pyr, coords, R, out_dtype=dt)
        return jnp.vdot(out.astype(jnp.float32), g)

    d32 = jax.grad(lambda a_, b_: loss(a_, b_, jnp.float32), (0, 1))(f1, f2)
    d16 = jax.grad(lambda a_, b_: loss(a_, b_, jnp.bfloat16), (0, 1))(f1, f2)
    for a, b in zip(d16, d32):
        a, b = np.asarray(a), np.asarray(b)
        denom = np.abs(b).max()
        assert denom > 0
        assert np.abs(a - b).max() / denom < 2e-2


def test_streaming_chunks_match_resident(monkeypatch):
    """Force the per-level row-group streaming path (used when fmap2 exceeds
    VMEM: the plane slab accumulates over grid dim 2) and check it agrees
    with the oracle. The merged batch-1 kernel is disabled so the fallback
    actually runs."""
    f1, f2, coords = _setup(c=16)
    vols = build_corr_pyramid_from_fmaps(f1, f2, 1, jnp.float32)
    ref = corr_pyramid_lookup(vols, coords, R)[..., : 81]
    monkeypatch.setattr(cf, "_merged_tq", lambda *a, **k: None)
    monkeypatch.setattr(cf, "_pick_gch", lambda *a, **k: 1)
    pyr = cf.build_fused_pyramid(f1, f2, 1, R)
    got = cf.corr_pyramid_lookup_fused(pyr, coords, R)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_per_level_fallback_matches(monkeypatch):
    """Batched inputs take the per-level fallback; also force it at b=1 to
    pin fallback-vs-merged agreement."""
    f1, f2, coords = _setup(c=16)
    vols = build_corr_pyramid_from_fmaps(f1, f2, 4, jnp.float32)
    ref = corr_pyramid_lookup(vols, coords, R, dy_major=True)
    monkeypatch.setattr(cf, "_merged_tq", lambda *a, **k: None)
    pyr = cf.build_fused_pyramid(f1, f2, 4, R)
    got = cf.corr_pyramid_lookup_fused(pyr, coords, R, dy_major=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_bf16_pyramid_runs():
    """bf16 fmaps -> bf16 VMEM slabs; agreement with the bf16 oracle chain to
    bf16-scale tolerance."""
    f1, f2, coords = _setup(c=32)
    f1b, f2b = f1.astype(jnp.bfloat16), f2.astype(jnp.bfloat16)
    vols = build_corr_pyramid_from_fmaps(f1b, f2b, 1, jnp.float32)
    ref = corr_pyramid_lookup(vols, coords, R)[..., : 81]
    pyr = cf.build_fused_pyramid(f1b, f2b, 1, R)
    got = cf.corr_pyramid_lookup_fused(pyr, coords, R)
    assert got.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=0.15)


def test_query_count_not_pow2_divisible():
    """Recipe crops give q with no large power-of-two divisor (400x720 ->
    q=4500): the kernel pads the query axis to a 128-multiple internally
    (Mosaic block-divisibility + tile utilization) and must slice it back."""
    f1, f2, coords = _setup(h8=5, w8=9)  # q = 45
    vols = build_corr_pyramid_from_fmaps(f1, f2, 4, jnp.float32)
    ref = corr_pyramid_lookup(vols, coords, R, dy_major=True)
    pyr = cf.build_fused_pyramid(f1, f2, 4, R)
    got = cf.corr_pyramid_lookup_fused(pyr, coords, R, dy_major=True)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
