"""Cross-library equivalence checks against TensorFlow (available in this
image), pinning the TF-specific semantics this framework reproduces:

- 'SAME' average pooling with partial edge windows (reference allfield.py:86);
- bilinear image resize (half-pixel, no antialias) used for smoothness-level
  images and flow resizing (reference uses tf.image.resize / tf.compat.v2).
"""
import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax.numpy as jnp


@pytest.mark.parametrize("hw,k", [((5, 6), 2), ((5, 6), 4), ((7, 9), 8), ((8, 8), 2)])
def test_avg_pool_same_matches_tf(hw, k):
    from flow_supervisor_tpu.ops.corr import _avg_pool_same

    rng = np.random.default_rng(0)
    h, w = hw
    vol = rng.normal(size=(1, 2, 3, h, w)).astype(np.float32)
    ref = tf.nn.avg_pool2d(vol.reshape(-1, h, w, 1), k, k, "SAME").numpy()
    got = np.asarray(_avg_pool_same(jnp.asarray(vol), k))
    ref = ref.reshape(got.shape)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("hw,k", [((6, 10), 2), ((7, 9), 4)])
def test_avg_pool_fmap_matches_tf(hw, k):
    from flow_supervisor_tpu.ops.corr import _avg_pool_fmap_same

    rng = np.random.default_rng(1)
    h, w = hw
    f = rng.normal(size=(2, h, w, 5)).astype(np.float32)
    ref = tf.nn.avg_pool2d(f, k, k, "SAME").numpy()
    got = np.asarray(_avg_pool_fmap_same(jnp.asarray(f), k))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_bilinear_resize_matches_tf():
    rng = np.random.default_rng(2)
    img = rng.uniform(0, 1, (1, 12, 17, 3)).astype(np.float32)
    for out_hw in [(6, 8), (24, 34), (5, 9)]:
        from flow_supervisor_tpu.ops.coords import resize_image

        ref = tf.image.resize(img, out_hw, method="bilinear").numpy()
        got = np.asarray(resize_image(jnp.asarray(img), out_hw))
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_resize_flow_scaling_matches_tf_semantics():
    from flow_supervisor_tpu.ops.coords import resize_flow

    rng = np.random.default_rng(3)
    flow = rng.normal(0, 3, (1, 8, 12, 2)).astype(np.float32)
    out = np.asarray(resize_flow(jnp.asarray(flow), (16, 24), scaling=True))
    ref = tf.image.resize(flow, (16, 24), method="bilinear").numpy()
    ref = ref * np.asarray([24 / 12, 16 / 8], np.float32)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)
