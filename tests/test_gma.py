import numpy as np
import jax
import jax.numpy as jnp

from flow_supervisor_tpu.models import RAFT, RAFTConfig
from flow_supervisor_tpu.models.gma import Attention, Aggregate, RelPosEmb


def test_attention_shape_and_softmax():
    att = Attention(dim=32, heads=2, dim_head=16, max_pos_size=16)
    fmap = jnp.ones((1, 6, 8, 32))
    variables = att.init(jax.random.PRNGKey(0), fmap)
    out = att.apply(variables, fmap)
    assert out.shape == (1, 2, 48, 48)
    np.testing.assert_allclose(np.asarray(out.sum(-1)), 1.0, rtol=1e-5)


def test_aggregate_residual_zero_init():
    agg = Aggregate(dim=32, heads=1, dim_head=32)
    fmap = jnp.asarray(np.random.default_rng(0).normal(size=(1, 4, 4, 32)), jnp.float32)
    attn = jnp.ones((1, 1, 16, 16)) / 16.0
    variables = agg.init(jax.random.PRNGKey(0), attn, fmap)
    out = agg.apply(variables, attn, fmap)
    # gamma initialized to zero -> identity at init
    np.testing.assert_allclose(np.asarray(out), np.asarray(fmap), atol=1e-6)


def test_relposemb_runs():
    emb = RelPosEmb(max_pos_size=8, dim_head=4)
    q = jnp.ones((1, 1, 4, 5, 4))
    variables = emb.init(jax.random.PRNGKey(0), q)
    out = emb.apply(variables, q)
    assert out.shape == (1, 1, 4, 5, 4, 5)


def test_gma_raft_forward_and_semi():
    cfg = RAFTConfig(
        iters=2, gma=True, teacher=True, teacher_iters=1, freeze_bn=True
    ).resolved()
    model = RAFT(cfg)
    img = jnp.full((1, 32, 32, 3), 0.5)
    variables = model.init(jax.random.PRNGKey(0), img, img, train=False)
    out = model.apply(variables, img, img, train=False)
    assert out["flow_up"].shape == (2, 1, 32, 32, 2)
    assert "att" in variables["params"]

    # semi forward with the GMA teacher
    orig = jnp.full((1, 48, 48, 3), 0.5)
    crop = jnp.zeros((1, 2), jnp.int32) + 8
    v2 = model.init(
        jax.random.PRNGKey(0), img, img, orig, orig, crop,
        train=False, method="semi_forward",
    )
    out2 = model.apply(
        v2, img, img, orig, orig, crop, train=False, method="semi_forward"
    )
    assert out2["teacher_fw"].shape == (1, 1, 32, 32, 2)
