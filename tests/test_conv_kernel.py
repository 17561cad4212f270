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


def test_conv_stats_epilogue_matches_norm_stats():
    from flow_supervisor_tpu.kernels.conv3x3 import conv3x3_stats
    from flow_supervisor_tpu.kernels.norm import instance_norm_apply, instance_norm_fused

    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.normal(0, 1, (2, 16, 24, 64)), jnp.float32)
    k = jnp.asarray(rng.normal(0, 0.1, (3, 3, 64, 64)), jnp.float32)
    bias = jnp.asarray(rng.normal(0, 0.1, (64,)), jnp.float32)
    y, st = conv3x3_stats(x, k, bias, interpret=True)
    out = instance_norm_apply(y, st, relu=True, interpret=True)
    ref = instance_norm_fused(_conv_reference(x, k, bias).astype(jnp.float32),
                              relu=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_conv_instnorm_relu_fwd_and_grad_match_composition():
    """The integrated pair (custom VJP: closed-form norm backward + conv
    transpose) must match autodiff of the plain XLA composition."""
    from flow_supervisor_tpu.kernels.conv3x3 import (
        conv3x3_instnorm_relu,
        _norm_stats_ref,
    )

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(0, 1, (2, 8, 16, 32)), jnp.float32)
    k = jnp.asarray(rng.normal(0, 0.2, (3, 3, 32, 32)), jnp.float32)
    bias = jnp.asarray(rng.normal(0, 0.2, (32,)), jnp.float32)
    g = jnp.asarray(rng.normal(0, 1, (2, 8, 16, 32)), jnp.float32)

    def comp(x_, k_, b_):
        y = _conv_reference(x_, k_, b_)
        mean = jnp.mean(y, axis=(1, 2), keepdims=True)
        var = jnp.mean(jnp.square(y - mean), axis=(1, 2), keepdims=True)
        return jnp.maximum((y - mean) * jax.lax.rsqrt(var + 1e-5), 0.0)

    out = conv3x3_instnorm_relu(x, k, bias, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(comp(x, k, bias)),
                               atol=2e-5)
    f = lambda *a: jnp.vdot(conv3x3_instnorm_relu(*a, True), g)
    fr = lambda *a: jnp.vdot(comp(*a), g)
    for got, want in zip(jax.grad(f, (0, 1, 2))(x, k, bias),
                         jax.grad(fr, (0, 1, 2))(x, k, bias)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-4)


def test_conv_instnorm_falls_back_at_unaligned_width(monkeypatch):
    """Recipe shapes (400x720) give stage widths 180/90 — not sublane
    aligned. The integrated pair must fall back to the XLA composition
    instead of asserting (regression: crashed the semi train step on TPU)."""
    import flow_supervisor_tpu.kernels.conv3x3 as conv_mod

    monkeypatch.setattr(conv_mod, "_auto_interpret", lambda i: False)
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.normal(0, 1, (1, 8, 20, 32)), jnp.float32)  # w=20
    k = jnp.asarray(rng.normal(0, 0.2, (3, 3, 32, 32)), jnp.float32)
    bias = jnp.asarray(rng.normal(0, 0.2, (32,)), jnp.float32)
    out = conv_mod.conv3x3_instnorm_relu(x, k, bias, True)
    y = _conv_reference(x, k, bias)
    mean = jnp.mean(y, axis=(1, 2), keepdims=True)
    var = jnp.mean(jnp.square(y - mean), axis=(1, 2), keepdims=True)
    ref = jnp.maximum((y - mean) * jax.lax.rsqrt(var + 1e-5), 0.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
