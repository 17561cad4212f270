import numpy as np
import jax
import jax.numpy as jnp

from flow_supervisor_tpu.losses.occlusion import (
    compute_occlusions,
    compute_range_map,
    mask_invalid,
)
from flow_supervisor_tpu.losses.photometric import (
    census_loss,
    census_transform,
    soft_hamming,
)
from flow_supervisor_tpu.losses.smoothness import (
    edge_weighting_fn,
    first_order_smoothness_loss,
    second_order_smoothness_loss,
)
from flow_supervisor_tpu.losses.unsupervised import (
    UnsupLossConfig,
    unsupervised_loss,
    unsupervised_sequence_loss,
)


def test_range_map_zero_flow_is_ones():
    flow = jnp.zeros((2, 6, 8, 2))
    rm = np.asarray(compute_range_map(flow))
    np.testing.assert_allclose(rm, np.ones((2, 6, 8, 1)), atol=1e-6)


def test_range_map_shift_counts():
    # everything shifts +1 in x: col 0 unsampled (count 0), col 1..w-1 counted once,
    # except nothing doubles.
    flow = jnp.zeros((1, 4, 5, 2)).at[..., 0].set(1.0)
    rm = np.asarray(compute_range_map(flow))[0, :, :, 0]
    np.testing.assert_allclose(rm[:, 0], 0.0, atol=1e-6)
    np.testing.assert_allclose(rm[:, 1:], 1.0, atol=1e-6)


def test_occlusion_wang_marks_unsampled():
    bwd = jnp.zeros((1, 4, 5, 2)).at[..., 0].set(1.0)
    nonocc = np.asarray(compute_occlusions(jnp.zeros((1, 4, 5, 2)), bwd, "wang"))
    # wang: non-occlusion = clip(range_map(backward), 0, 1): col0 -> 0 (occluded)
    np.testing.assert_allclose(nonocc[0, :, 0, 0], 0.0, atol=1e-6)
    np.testing.assert_allclose(nonocc[0, :, 2, 0], 1.0, atol=1e-6)


def test_occlusion_brox_consistency():
    fwd = jnp.zeros((1, 8, 8, 2)).at[..., 0].set(1.0)
    bwd = jnp.zeros((1, 8, 8, 2)).at[..., 0].set(-1.0)
    nonocc = np.asarray(compute_occlusions(fwd, bwd, "brox"))
    # perfectly consistent flows -> nothing occluded (interior)
    np.testing.assert_allclose(nonocc[0, 2:-2, 2:-2, 0], 1.0, atol=1e-6)


def test_mask_invalid_bounds():
    coords = jnp.asarray([[[[0.0, 0.0], [7.0, 3.0], [-0.1, 0.0], [7.1, 3.0]]]])
    m = np.asarray(mask_invalid(coords))  # shape [1,1,4,1]; h=1? use bigger
    # build a real grid case instead
    c = jnp.zeros((1, 4, 8, 2))
    m = np.asarray(mask_invalid(c))
    assert m.min() == 1.0


def test_census_identical_images_zero():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 1, (1, 16, 16, 3)), jnp.float32)
    mask = jnp.ones((1, 16, 16, 1))
    loss_same = float(census_loss(img, img, mask))
    # soft hamming of identical = 0; robust distance of 0 = 0.01^0.4
    expect = (0.01) ** 0.4
    np.testing.assert_allclose(loss_same, expect, rtol=1e-3)
    img2 = jnp.asarray(rng.uniform(0, 1, (1, 16, 16, 3)), jnp.float32)
    assert float(census_loss(img, img2, mask)) > loss_same


def test_census_transform_shape():
    img = jnp.ones((1, 10, 12, 3))
    ct = census_transform(img, 7)
    assert ct.shape == (1, 10, 12, 49)
    # constant image -> zero diffs except at borders (zero pad)
    np.testing.assert_allclose(np.asarray(ct)[0, 5, 5], 0.0, atol=1e-6)


def test_smoothness_constant_flow_minimal():
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.uniform(0, 1, (1, 12, 12, 3)), jnp.float32)
    edge_fn = edge_weighting_fn("exponential", 150.0)
    flat_flow = jnp.ones((1, 12, 12, 2))
    bumpy_flow = jnp.asarray(rng.normal(0, 1, (1, 12, 12, 2)), jnp.float32)
    assert float(first_order_smoothness_loss(img, flat_flow, edge_fn)) < float(
        first_order_smoothness_loss(img, bumpy_flow, edge_fn)
    )
    assert float(second_order_smoothness_loss(img, flat_flow, edge_fn)) < float(
        second_order_smoothness_loss(img, bumpy_flow, edge_fn)
    )


def _flows_dict(fw, bw):
    return {
        (0, 1, "augmented-student"): [fw],
        (1, 0, "augmented-student"): [bw],
        (0, 1, "transformed-student"): [fw],
        (1, 0, "transformed-student"): [bw],
    }


def test_unsupervised_loss_prefers_true_shift():
    # img1[x] = base[x], img2[x] = base[x+2]: img1's content sits 2 px to the
    # LEFT in img2's frame, so the true forward flow is -2 in x.
    rng = np.random.default_rng(2)
    base = rng.uniform(0, 1, (1, 24, 34, 3)).astype(np.float32)
    img1 = base[:, :, : 34 - 2]
    img2 = base[:, :, 2:]
    images = jnp.stack([jnp.asarray(img1), jnp.asarray(img2)], axis=1)
    cfg = UnsupLossConfig(census=1.0, smooth2=0.0, occlusion="none")
    true_fw = jnp.zeros((1, 24, 32, 2)).at[..., 0].set(-2.0)
    true_bw = -true_fw
    zero = jnp.zeros_like(true_fw)
    l_true = unsupervised_loss(images, _flows_dict(true_fw, true_bw), cfg)
    l_zero = unsupervised_loss(images, _flows_dict(zero, zero), cfg)
    assert float(l_true["census"]) < float(l_zero["census"])


def test_unsupervised_full_size_branch_handles_outgoing():
    # Full-size images allow supervising flow that leaves the crop.
    rng = np.random.default_rng(3)
    full = rng.uniform(0, 1, (1, 24, 40, 3)).astype(np.float32)
    full_images = jnp.stack([jnp.asarray(full), jnp.asarray(full)], axis=1)
    crop_yx = jnp.asarray([[4, 8]], jnp.int32)
    crop = full[:, 4:20, 8:24]
    images = jnp.stack([jnp.asarray(crop), jnp.asarray(crop)], axis=1)
    cfg = UnsupLossConfig(census=1.0, smooth2=0.0, occlusion="none")
    # flow +12 px in x pushes out of the 16-wide crop but stays in the full image
    fw = jnp.zeros((1, 16, 16, 2)).at[..., 0].set(12.0)
    l_with_full = unsupervised_loss(
        images, _flows_dict(fw, -fw), cfg, full_size_images=full_images,
        crop_yx=crop_yx,
    )
    # identical static images: zero flow is the truth; +12 should be worse
    l_zero = unsupervised_loss(
        images, _flows_dict(jnp.zeros_like(fw), jnp.zeros_like(fw)), cfg,
        full_size_images=full_images, crop_yx=crop_yx,
    )
    assert float(l_zero["census"]) < float(l_with_full["census"])


def test_sequence_loss_decay_accumulation():
    rng = np.random.default_rng(4)
    img = rng.uniform(0, 1, (1, 16, 16, 3)).astype(np.float32)
    images = jnp.stack([jnp.asarray(img), jnp.asarray(img)], axis=1)
    cfg = UnsupLossConfig(census=1.0, smooth2=0.0, occlusion="none", gamma=0.5)
    flows = jnp.zeros((3, 1, 16, 16, 2))
    total, terms = unsupervised_sequence_loss(images, flows, flows, cfg)
    single = unsupervised_loss(images, _flows_dict(flows[0], flows[0]), cfg)
    expect = float(single["census"]) * (1 + 0.5 + 0.25)
    np.testing.assert_allclose(float(total), expect, rtol=1e-5)
