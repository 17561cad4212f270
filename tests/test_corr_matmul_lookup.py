import numpy as np
import jax.numpy as jnp

from flow_supervisor_tpu.ops.corr import (
    all_pairs_correlation,
    build_corr_pyramid,
    corr_pyramid_lookup,
    corr_pyramid_lookup_gather,
)


def test_matmul_lookup_matches_gather_oracle():
    rng = np.random.default_rng(0)
    f1 = rng.normal(size=(2, 8, 10, 16)).astype(np.float32)
    f2 = rng.normal(size=(2, 8, 10, 16)).astype(np.float32)
    vol = all_pairs_correlation(jnp.asarray(f1), jnp.asarray(f2))
    pyr = build_corr_pyramid(vol, num_levels=4)
    # fractional coords incl. near-boundary and out-of-bounds queries
    coords = jnp.asarray(
        rng.uniform(-3.0, 13.0, (2, 8, 10, 2)).astype(np.float32)
    )
    a = np.asarray(corr_pyramid_lookup(pyr, coords, radius=4))
    b = np.asarray(corr_pyramid_lookup_gather(pyr, coords, radius=4))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_matmul_lookup_integer_coords_exact():
    rng = np.random.default_rng(1)
    vol = jnp.asarray(rng.normal(size=(1, 4, 5, 6, 7)).astype(np.float32))
    coords = jnp.asarray(
        rng.integers(0, 5, (1, 4, 5, 2)).astype(np.float32)
    )
    a = np.asarray(corr_pyramid_lookup([vol], coords, radius=1))
    b = np.asarray(corr_pyramid_lookup_gather([vol], coords, radius=1))
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)


def test_fmap_pooling_identity():
    # pooling the volume over target pixels == correlating with pooled fmap2
    from flow_supervisor_tpu.ops.corr import build_corr_pyramid_from_fmaps

    rng = np.random.default_rng(2)
    f1 = rng.normal(size=(1, 6, 10, 8)).astype(np.float32)
    f2 = rng.normal(size=(1, 6, 10, 8)).astype(np.float32)
    ref = build_corr_pyramid(
        all_pairs_correlation(jnp.asarray(f1), jnp.asarray(f2)), num_levels=4
    )
    new = build_corr_pyramid_from_fmaps(jnp.asarray(f1), jnp.asarray(f2), 4)
    for a, b in zip(ref, new):
        assert a.shape == b.shape
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5)


def test_combined_plane_lookup_matches():
    from flow_supervisor_tpu.ops.corr import (
        build_corr_pyramid_from_fmaps,
        combine_pyramid,
        corr_pyramid_lookup_combined,
    )

    rng = np.random.default_rng(3)
    f1 = rng.normal(size=(1, 8, 12, 16)).astype(np.float32)
    f2 = rng.normal(size=(1, 8, 12, 16)).astype(np.float32)
    pyr = build_corr_pyramid_from_fmaps(jnp.asarray(f1), jnp.asarray(f2), 4)
    coords = jnp.asarray(rng.uniform(-3.0, 15.0, (1, 8, 12, 2)).astype(np.float32))
    combined = combine_pyramid(pyr)
    shapes = [(p.shape[3], p.shape[4]) for p in pyr]
    a = np.asarray(corr_pyramid_lookup_combined(combined, shapes, coords, 4))
    b = np.asarray(corr_pyramid_lookup(pyr, coords, radius=4))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)
