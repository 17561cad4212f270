"""Pallas fused lookup kernel vs the XLA oracle (interpret mode on CPU)."""
import numpy as np
import jax.numpy as jnp

from flow_supervisor_tpu.kernels.corr_lookup import corr_pyramid_lookup_pallas
from flow_supervisor_tpu.ops.corr import (
    all_pairs_correlation,
    build_corr_pyramid_from_fmaps,
    corr_pyramid_lookup,
)


def test_pallas_lookup_matches_oracle():
    rng = np.random.default_rng(0)
    f1 = rng.normal(size=(1, 8, 8, 16)).astype(np.float32)
    f2 = rng.normal(size=(1, 8, 8, 16)).astype(np.float32)
    pyr = build_corr_pyramid_from_fmaps(jnp.asarray(f1), jnp.asarray(f2), 4)
    coords = jnp.asarray(rng.uniform(-4.0, 12.0, (1, 8, 8, 2)).astype(np.float32))
    ours = np.asarray(
        corr_pyramid_lookup_pallas(pyr, coords, radius=4, interpret=True)
    )
    oracle = np.asarray(corr_pyramid_lookup(pyr, coords, radius=4))
    np.testing.assert_allclose(ours, oracle, rtol=1e-5, atol=1e-5)


def test_pallas_lookup_extreme_oob():
    vol = jnp.asarray(
        np.random.default_rng(1).normal(size=(1, 2, 4, 6, 8)).astype(np.float32)
    )
    # queries far outside in every direction must produce exact zeros
    coords = jnp.asarray(
        np.array(
            [[[[-100.0, -100.0], [500.0, 500.0], [3.5, 2.5], [-100.0, 3.0]],
              [[0.0, 0.0], [7.0, 5.0], [7.9, 5.9], [200.0, -200.0]]]],
            np.float32,
        )
    )
    ours = np.asarray(
        corr_pyramid_lookup_pallas([vol], coords, radius=1, interpret=True)
    )
    oracle = np.asarray(corr_pyramid_lookup([vol], coords, radius=1))
    np.testing.assert_allclose(ours, oracle, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(ours[0, 0, 0], 0.0, atol=1e-7)
