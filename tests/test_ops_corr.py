import numpy as np
import jax.numpy as jnp
import pytest

from flow_supervisor_tpu.ops import (
    all_pairs_correlation,
    build_corr_pyramid,
    corr_pyramid_lookup,
    transpose_corr_volume,
)


def test_all_pairs_matches_naive():
    rng = np.random.default_rng(0)
    f1 = rng.normal(size=(2, 4, 6, 8)).astype(np.float32)
    f2 = rng.normal(size=(2, 4, 6, 8)).astype(np.float32)
    vol = np.asarray(all_pairs_correlation(jnp.asarray(f1), jnp.asarray(f2)))
    naive = np.einsum("bijc,bklc->bijkl", f1, f2) / np.sqrt(8.0)
    np.testing.assert_allclose(vol, naive, rtol=1e-5, atol=1e-5)


def test_pyramid_pools_original_volume_with_valid_count():
    # 1x1 source pixel, 5x6 target plane of ones except one corner value.
    vol = np.ones((1, 1, 1, 5, 6), np.float32)
    vol[0, 0, 0, 4, 5] = 13.0
    pyr = build_corr_pyramid(jnp.asarray(vol), num_levels=3)
    assert [p.shape[-2:] for p in pyr] == [(5, 6), (3, 3), (2, 2)]
    # level 1 (k=2): bottom-right window covers only row 4, col 4..5 -> mean(1, 13) = 7
    np.testing.assert_allclose(np.asarray(pyr[1])[0, 0, 0, 2, 2], 7.0, rtol=1e-6)
    # level 1 interior window of ones -> 1
    np.testing.assert_allclose(np.asarray(pyr[1])[0, 0, 0, 0, 0], 1.0, rtol=1e-6)
    # level 2 (k=4 on ORIGINAL volume, not cascaded): SAME centers the window, so
    # the last window covers rows {3,4} x cols {3,4,5} -> mean(5*1 + 13)/6 = 3
    # (verified identical to tf.nn.avg_pool2d(..., 'SAME'))
    np.testing.assert_allclose(np.asarray(pyr[2])[0, 0, 0, 1, 1], 3.0, rtol=1e-6)


def test_lookup_center_tap_and_channel_order():
    # volume with a distinctive value at target (y=2, x=3) for every query pixel
    h, w = 5, 7
    vol = np.zeros((1, 2, 2, h, w), np.float32)
    vol[..., 2, 3] = 1.0
    coords = np.full((1, 2, 2, 2), 0.0, np.float32)
    coords[..., 0] = 3.0  # x
    coords[..., 1] = 2.0  # y
    r = 1
    out = np.asarray(
        corr_pyramid_lookup([jnp.asarray(vol)], jnp.asarray(coords), radius=r)
    )
    k = 2 * r + 1
    assert out.shape == (1, 2, 2, k * k)
    # center channel index: dx=0 (i=r), dy=0 (j=r), dx-major ordering
    center = r * k + r
    np.testing.assert_allclose(out[0, 0, 0, center], 1.0, atol=1e-6)
    # offset channel dx=-1, dy=0 -> samples (x=2, y=2) which is 0
    np.testing.assert_allclose(out[0, 0, 0, 0 * k + r], 0.0, atol=1e-6)
    # sum over window = 1 (only one hot value inside the window)
    np.testing.assert_allclose(out[0, 0, 0].sum(), 1.0, atol=1e-6)


def test_lookup_bilinear_and_oob_zero():
    vol = np.arange(12, dtype=np.float32).reshape(1, 1, 1, 3, 4)
    # query at x=1.5, y=0.5 with radius 0: average of vol[0:2, 1:3] corners
    coords = np.array([[[[1.5, 0.5]]]], np.float32)
    out = np.asarray(
        corr_pyramid_lookup([jnp.asarray(vol)], jnp.asarray(coords), radius=0)
    )
    expect = (vol[0, 0, 0, 0, 1] + vol[0, 0, 0, 0, 2] + vol[0, 0, 0, 1, 1] + vol[0, 0, 0, 1, 2]) / 4
    np.testing.assert_allclose(out[0, 0, 0, 0], expect, rtol=1e-6)
    # query fully outside -> 0
    coords_oob = np.array([[[[10.0, 10.0]]]], np.float32)
    out = np.asarray(
        corr_pyramid_lookup([jnp.asarray(vol)], jnp.asarray(coords_oob), radius=0)
    )
    np.testing.assert_allclose(out[0, 0, 0, 0], 0.0, atol=1e-6)
    # query half outside (x=-0.5) -> half of the edge value (OOB corner taps are 0)
    coords_half = np.array([[[[-0.5, 0.0]]]], np.float32)
    out = np.asarray(
        corr_pyramid_lookup([jnp.asarray(vol)], jnp.asarray(coords_half), radius=0)
    )
    np.testing.assert_allclose(out[0, 0, 0, 0], 0.5 * vol[0, 0, 0, 0, 0], atol=1e-6)


def test_transpose_volume_swaps_direction():
    rng = np.random.default_rng(1)
    f1 = rng.normal(size=(1, 3, 4, 8)).astype(np.float32)
    f2 = rng.normal(size=(1, 3, 4, 8)).astype(np.float32)
    fwd = all_pairs_correlation(jnp.asarray(f1), jnp.asarray(f2))
    bwd = all_pairs_correlation(jnp.asarray(f2), jnp.asarray(f1))
    np.testing.assert_allclose(
        np.asarray(transpose_corr_volume(fwd)), np.asarray(bwd), rtol=1e-5, atol=1e-5
    )


def test_multi_level_lookup_shape():
    rng = np.random.default_rng(2)
    f1 = rng.normal(size=(2, 8, 8, 16)).astype(np.float32)
    f2 = rng.normal(size=(2, 8, 8, 16)).astype(np.float32)
    vol = all_pairs_correlation(jnp.asarray(f1), jnp.asarray(f2))
    pyr = build_corr_pyramid(vol, num_levels=4)
    coords = jnp.zeros((2, 8, 8, 2), jnp.float32) + 3.0
    out = corr_pyramid_lookup(pyr, coords, radius=4)
    assert out.shape == (2, 8, 8, 4 * 81)
