"""Pallas fused instance-norm(+relu) vs the pure-jnp layers.instance_norm.

On CPU the kernel runs in interpret mode; on TPU it is compiled. Covers both
relu modes, bf16 inputs, row counts that straddle the tile size, batch > 1,
and the closed-form VJP against autodiff through the jnp reference.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from flow_supervisor_tpu.kernels.norm import instance_norm_fused
from flow_supervisor_tpu.models.layers import instance_norm


def _x(b=2, h=13, w=24, c=64, seed=0, dtype=jnp.float32):
    rng = np.random.RandomState(seed)
    return jnp.asarray(rng.randn(b, h, w, c) * 3 + 1.5, dtype)


@pytest.mark.parametrize("relu", [False, True])
def test_matches_jnp(relu):
    x = _x()
    ref = instance_norm(x)
    if relu:
        ref = jnp.maximum(ref, 0.0)
    got = instance_norm_fused(x, relu=relu)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_tail_rows_masked():
    """h*w not a multiple of the row tile: tail rows must not leak into the
    statistics."""
    x = _x(b=1, h=3, w=7, c=32, seed=1)  # m = 21
    got = instance_norm_fused(x)
    ref = instance_norm(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_bf16():
    x = _x(dtype=jnp.bfloat16)
    got = instance_norm_fused(x, relu=True)
    assert got.dtype == jnp.bfloat16
    ref = jnp.maximum(instance_norm(x), 0).astype(jnp.bfloat16)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32), atol=0.06
    )


@pytest.mark.parametrize("relu", [False, True])
def test_vjp_matches_autodiff(relu):
    x = _x(b=2, h=9, w=16, c=48, seed=2)
    g = jnp.asarray(np.random.RandomState(3).randn(*x.shape), jnp.float32)

    def ref_fn(x_):
        y = instance_norm(x_)
        if relu:
            y = jnp.maximum(y, 0.0)
        return jnp.vdot(y, g)

    def ours_fn(x_):
        return jnp.vdot(instance_norm_fused(x_, relu=relu), g)

    d_ref = jax.grad(ref_fn)(x)
    d_got = jax.grad(ours_fn)(x)
    np.testing.assert_allclose(np.asarray(d_got), np.asarray(d_ref), atol=2e-5)


def test_model_forward_fused_norm_matches():
    """RAFT forward with fused_norm on a CPU backend routes to the jnp norm
    (backend gate) — force the kernel by calling the encoder with a stub of
    jax.default_backend, and check parity."""
    from flow_supervisor_tpu.models.encoders import BasicEncoder

    x = _x(b=1, h=64, w=96, c=3, seed=4)
    enc_ref = BasicEncoder(64, "instance", 0.0, jnp.float32, False)
    v = enc_ref.init(jax.random.PRNGKey(0), x, train=False)
    ref = enc_ref.apply(v, x, train=False)

    import flow_supervisor_tpu.kernels.conv3x3 as conv_mod
    import flow_supervisor_tpu.kernels.norm as norm_mod
    import flow_supervisor_tpu.models.layers as layers_mod

    # route Norm AND the fused conv+norm pairs to the kernels on this CPU
    # backend, but keep the kernels themselves in interpret mode
    orig_backend = layers_mod.jax.default_backend
    orig_interp = norm_mod._auto_interpret
    orig_cinterp = conv_mod._auto_interpret
    layers_mod.jax.default_backend = lambda: "tpu"
    norm_mod._auto_interpret = lambda interpret: True
    conv_mod._auto_interpret = lambda interpret: True
    try:
        enc = BasicEncoder(64, "instance", 0.0, jnp.float32, True)
        got = enc.apply(v, x, train=False)
    finally:
        layers_mod.jax.default_backend = orig_backend
        norm_mod._auto_interpret = orig_interp
        conv_mod._auto_interpret = orig_cinterp
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)
