import numpy as np
import jax.numpy as jnp

from flow_supervisor_tpu.losses import (
    flow_loss_l1,
    flow_loss_l2,
    flow_loss_robust,
    sequence_loss,
)
from flow_supervisor_tpu.metrics import dense_metrics, epe_per_image, sparse_metrics


def test_losses_zero_at_perfect():
    gt = jnp.ones((1, 4, 4, 2))
    assert float(flow_loss_l1(gt, gt)) == 0.0
    assert float(flow_loss_l2(gt, gt)) == 0.0
    # robust has the epsilon floor: sqrt(0.001^2) = 0.001 per channel
    np.testing.assert_allclose(float(flow_loss_robust(gt, gt)), 0.001, rtol=1e-5)


def test_losses_elementwise_channel_mean():
    gt = jnp.zeros((1, 2, 2, 2))
    pred = jnp.stack(
        [jnp.full((1, 2, 2), 3.0), jnp.full((1, 2, 2), 4.0)], axis=-1
    )
    # l1 = mean(|3|,|4|) = 3.5 ; NOT the norm 5
    np.testing.assert_allclose(float(flow_loss_l1(pred, gt)), 3.5, rtol=1e-6)
    np.testing.assert_allclose(float(flow_loss_l2(pred, gt)), 12.5, rtol=1e-6)
    np.testing.assert_allclose(float(flow_loss_robust(pred, gt)), 3.5, rtol=1e-3)


def test_large_displacement_cutoff_and_mask_multiply():
    gt = jnp.zeros((1, 1, 2, 2)).at[0, 0, 1].set(500.0)  # second px exceeds 400
    pred = jnp.ones((1, 1, 2, 2))
    # only first pixel contributes |1|, mean over 4 elements = 0.5
    np.testing.assert_allclose(float(flow_loss_l1(pred, gt)), 0.5, rtol=1e-6)
    valid = jnp.zeros((1, 1, 2, 1))
    np.testing.assert_allclose(float(flow_loss_l1(pred, gt, valid)), 0.0, atol=1e-8)


def test_sequence_loss_gamma_weights():
    gt = jnp.zeros((1, 2, 2, 2))
    preds = jnp.ones((3, 1, 2, 2, 2))
    # per-iter l1 = 1; weights = 0.8^2, 0.8, 1
    expect = 0.64 + 0.8 + 1.0
    np.testing.assert_allclose(
        float(sequence_loss(preds, gt, gamma=0.8, loss="l1")), expect, rtol=1e-6
    )


def test_epe_and_dense_metrics():
    gt = jnp.zeros((2, 4, 4, 2))
    pred = jnp.zeros((2, 4, 4, 2)).at[..., 0].set(jnp.array([3.0, 0.0])[:, None, None])
    epe = np.asarray(epe_per_image(pred, gt))
    np.testing.assert_allclose(epe, [3.0, 0.0], rtol=1e-6)
    d = dense_metrics(pred, gt)
    np.testing.assert_allclose(np.asarray(d["epe_1px"]), [0.0, 1.0])
    np.testing.assert_allclose(np.asarray(d["epe_5px"]), [1.0, 1.0])


def test_sparse_metrics_fl_all():
    gt = jnp.zeros((1, 1, 4, 2)).at[..., 0].set(10.0)
    pred = gt.at[0, 0, 0, 0].add(5.0)  # epe 5 > 3 and 5/10 > 0.05 -> outlier
    pred = pred.at[0, 0, 1, 0].add(2.0)  # epe 2 -> inlier
    valid = jnp.ones((1, 1, 4, 1))
    m = sparse_metrics(pred, gt, valid)
    np.testing.assert_allclose(float(m["fl"][0]), 0.25, rtol=1e-6)
    np.testing.assert_allclose(float(m["epe"][0]), 7.0 / 4.0, rtol=1e-6)
    # masked out
    valid2 = valid.at[0, 0, 0, 0].set(0.0)
    m2 = sparse_metrics(pred, gt, valid2)
    np.testing.assert_allclose(float(m2["fl"][0]), 0.0, atol=1e-8)


def test_epe_empty_mask_reports_minus_one():
    gt = jnp.zeros((1, 2, 2, 2))
    out = epe_per_image(gt, gt, valid=jnp.zeros((1, 2, 2, 1)))
    np.testing.assert_allclose(np.asarray(out), [-1.0])
