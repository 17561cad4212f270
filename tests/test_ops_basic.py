import numpy as np
import jax.numpy as jnp

from flow_supervisor_tpu.ops import (
    coords_grid,
    downsample_shape,
    resize_flow,
    resampler,
    upsample_convex,
    pad_to_multiple,
    pad_spec_for,
    unpad,
    crop_bboxes,
    pad_bboxes,
    create_outgoing_mask,
    flow_to_warp,
    warp_image,
)


def test_coords_grid_xy_order():
    g = np.asarray(coords_grid(1, 3, 4))
    assert g.shape == (1, 3, 4, 2)
    np.testing.assert_allclose(g[0, 1, 2], [2.0, 1.0])  # (x=col, y=row)


def test_downsample_shape_ceil_chain():
    assert downsample_shape(64) == 8
    assert downsample_shape(65) == 9  # ceil(ceil(ceil(65/2)/2)/2) = ceil(17/2) = 9
    assert downsample_shape(100) == 13


def test_resampler_identity_and_interp():
    rng = np.random.default_rng(0)
    img = rng.normal(size=(1, 4, 5, 3)).astype(np.float32)
    warp = np.asarray(coords_grid(1, 4, 5))
    out = np.asarray(resampler(jnp.asarray(img), jnp.asarray(warp)))
    np.testing.assert_allclose(out, img, rtol=1e-6)
    # half-pixel shift in x
    warp2 = warp.copy()
    warp2[..., 0] += 0.5
    out2 = np.asarray(resampler(jnp.asarray(img), jnp.asarray(warp2)))
    expect = 0.5 * (img[:, :, :-1] + img[:, :, 1:])
    np.testing.assert_allclose(out2[:, :, :-1], expect, rtol=1e-5)
    # last column: half out of bounds -> half the edge value
    np.testing.assert_allclose(out2[:, :, -1], 0.5 * img[:, :, -1], rtol=1e-5)


def test_upsample_convex_uniform_mask_is_neighbor_mean():
    # With uniform mask logits the output at every subpixel is the mean of the
    # 3x3 zero-padded neighborhood.
    x = np.zeros((1, 2, 2, 1), np.float32)
    x[0, 0, 0, 0] = 9.0
    mask = np.zeros((1, 2, 2, 9 * 64), np.float32)
    out = np.asarray(upsample_convex(jnp.asarray(x), jnp.asarray(mask)))
    assert out.shape == (1, 16, 16, 1)
    # top-left lowres cell: neighborhood sum = 9 (only itself), /9 = 1
    np.testing.assert_allclose(out[0, 0, 0, 0], 1.0, rtol=1e-6)
    np.testing.assert_allclose(out[0, 7, 7, 0], 1.0, rtol=1e-6)  # whole 8x8 block
    # bottom-right lowres cell: neighborhood includes the 9.0 at its (-1,-1)
    np.testing.assert_allclose(out[0, 8, 8, 0], 1.0, rtol=1e-6)


def test_upsample_convex_onehot_mask_selects_neighbor():
    x = np.arange(4, dtype=np.float32).reshape(1, 2, 2, 1)
    mask = np.full((1, 2, 2, 9 * 64), -1e9, np.float32)
    # neighbor index 4 = center (row_shift 0, col_shift 0); layout n*64 + g
    mask[..., 4 * 64 : 5 * 64] = 0.0
    out = np.asarray(upsample_convex(jnp.asarray(x), jnp.asarray(mask)))
    # every subpixel equals its own lowres cell value
    np.testing.assert_allclose(out[0, 0:8, 0:8, 0], 0.0, atol=1e-6)
    np.testing.assert_allclose(out[0, 0:8, 8:16, 0], 1.0, rtol=1e-6)
    np.testing.assert_allclose(out[0, 8:16, 0:8, 0], 2.0, rtol=1e-6)
    np.testing.assert_allclose(out[0, 8:16, 8:16, 0], 3.0, rtol=1e-6)


def test_upsample_convex_crop_to_ref():
    x = np.zeros((1, 2, 3, 2), np.float32)
    mask = np.zeros((1, 2, 3, 9 * 64), np.float32)
    out = upsample_convex(jnp.asarray(x), jnp.asarray(mask), out_size=(13, 21))
    assert out.shape == (1, 13, 21, 2)


def test_pad_modes_and_unpad():
    x = jnp.ones((1, 13, 21, 3))
    p, spec = pad_to_multiple(x, mode="sintel")
    assert p.shape == (1, 16, 24, 3)
    assert spec == ((1, 2), (1, 2))
    assert pad_spec_for(13, 21, mode="kitti") == ((0, 3), (1, 2))
    back = unpad(p, spec)
    assert back.shape == x.shape


def test_crop_and_pad_bboxes_roundtrip():
    rng = np.random.default_rng(3)
    imgs = rng.normal(size=(2, 8, 10, 3)).astype(np.float32)
    offsets = np.array([[1, 2], [3, 4]], np.int32)  # (y, x)
    crops = np.asarray(crop_bboxes(jnp.asarray(imgs), jnp.asarray(offsets), (4, 5)))
    np.testing.assert_allclose(crops[0], imgs[0, 1:5, 2:7])
    np.testing.assert_allclose(crops[1], imgs[1, 3:7, 4:9])
    padded = np.asarray(pad_bboxes(jnp.asarray(crops), jnp.asarray(offsets), (8, 10)))
    np.testing.assert_allclose(padded[0, 1:5, 2:7], crops[0])
    assert padded[0, 0].sum() == 0.0


def test_outgoing_mask_and_warp():
    flow = np.zeros((1, 4, 4, 2), np.float32)
    flow[0, :, 3, 0] = 2.0  # pushes last column out
    mask = np.asarray(create_outgoing_mask(jnp.asarray(flow)))
    assert mask[0, 0, 3, 0] == 0.0 and mask[0, 0, 0, 0] == 1.0
    img = np.tile(np.arange(4, dtype=np.float32).reshape(1, 1, 4, 1), (1, 4, 1, 1))
    shifted = np.zeros_like(flow)
    shifted[..., 0] = 1.0
    out = np.asarray(warp_image(jnp.asarray(img), jnp.asarray(shifted)))
    np.testing.assert_allclose(out[0, 0, 0, 0], 1.0)  # sampled img at x+1
    np.testing.assert_allclose(out[0, 0, 3, 0], 0.0)  # outgoing -> zeroed
    w = np.asarray(flow_to_warp(jnp.asarray(shifted)))
    np.testing.assert_allclose(w[0, 0, 0], [1.0, 0.0])


def test_crop_upsample_matches_upsample_then_crop():
    # Crop-window convex upsample (models/raft._crop_upsample) must be
    # bit-identical to full-frame upsample + crop_bboxes for 8-aligned crops,
    # including windows touching the frame border (zero-halo parity).
    from flow_supervisor_tpu.models.raft import _crop_upsample

    rng = np.random.default_rng(7)
    fh8, fw8 = 6, 8
    h8, w8 = 4, 5
    flow = jnp.asarray(rng.normal(size=(2, fh8, fw8, 2)), jnp.float32)
    mask = jnp.asarray(rng.normal(size=(2, fh8, fw8, 9 * 64)), jnp.float32)
    # one interior window, one flush with the (0, 0) border
    off8 = jnp.asarray([[1, 2], [0, 0]], jnp.int32)
    full = upsample_convex(flow, mask, (fh8 * 8, fw8 * 8))
    want = crop_bboxes(full, off8 * 8, (h8 * 8, w8 * 8))
    got = _crop_upsample(flow, mask, off8, (h8, w8), (h8 * 8, w8 * 8))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)
