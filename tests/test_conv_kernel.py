"""Oracle parity for the pallas direct 3x3 conv (kernels/conv3x3.py).

Interpret-mode on CPU (conftest pins JAX to CPU): the kernel must match
``lax.conv_general_dilated`` + bias exactly up to fp accumulation order, in
both forward and backward (the VJP differentiates the XLA conv, so backward
parity is the custom_vjp wiring being checked, not new math).
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from flow_supervisor_tpu.kernels.conv3x3 import (
    _conv_impl,
    _conv_reference,
    conv3x3_fused,
)

SHAPES = [
    (2, 16, 24, 64, 64),   # stage-1-like (c=64)
    (1, 8, 16, 8, 16),     # tiny, c=8 edge
    (2, 24, 16, 96, 96),   # stage-2-like (c=96)
    (1, 16, 32, 128, 128), # stage-3-like
    (1, 8, 24, 64, 128),   # cin != cout
]


@pytest.mark.parametrize("shape", SHAPES, ids=[str(s) for s in SHAPES])
def test_forward_matches_xla_conv(shape):
    b, h, w, c, co = shape
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(0, 1, (b, h, w, c)), jnp.float32)
    k = jnp.asarray(rng.normal(0, 0.1, (3, 3, c, co)), jnp.float32)
    bias = jnp.asarray(rng.normal(0, 0.1, (co,)), jnp.float32)
    y = _conv_impl(x, k, bias, relu=False, interpret=True)
    yr = _conv_reference(x, k, bias).astype(y.dtype)
    np.testing.assert_allclose(np.asarray(y), np.asarray(yr), atol=2e-5)


def test_forward_relu_fused():
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(0, 1, (1, 8, 16, 16)), jnp.float32)
    k = jnp.asarray(rng.normal(0, 0.3, (3, 3, 16, 16)), jnp.float32)
    bias = jnp.asarray(rng.normal(0, 0.3, (16,)), jnp.float32)
    y = _conv_impl(x, k, bias, relu=True, interpret=True)
    yr = jnp.maximum(_conv_reference(x, k, bias), 0.0).astype(y.dtype)
    assert float(jnp.min(y)) == 0.0  # relu actually clamped something
    np.testing.assert_allclose(np.asarray(y), np.asarray(yr), atol=2e-5)


def test_vjp_matches_xla_conv_grads():
    rng = np.random.default_rng(5)
    b, h, w, c, co = 1, 8, 16, 32, 32
    x = jnp.asarray(rng.normal(0, 1, (b, h, w, c)), jnp.float32)
    k = jnp.asarray(rng.normal(0, 0.1, (3, 3, c, co)), jnp.float32)
    bias = jnp.asarray(rng.normal(0, 0.1, (co,)), jnp.float32)
    g = jnp.asarray(rng.normal(0, 1, (b, h, w, co)), jnp.float32)

    def f(x_, k_, b_):
        return jnp.vdot(conv3x3_fused(x_, k_, b_), g)

    def fr(x_, k_, b_):
        return jnp.vdot(_conv_reference(x_, k_, b_).astype(x_.dtype), g)

    gx, gk, gb = jax.grad(f, (0, 1, 2))(x, k, bias)
    rx, rk, rb = jax.grad(fr, (0, 1, 2))(x, k, bias)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(rk), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(rb), atol=1e-4)
