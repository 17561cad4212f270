import numpy as np
import jax
import jax.numpy as jnp
import pytest

from flow_supervisor_tpu.models import RAFT, RAFTConfig


@pytest.fixture(scope="module")
def tiny_model():
    cfg = RAFTConfig(iters=2).resolved()
    model = RAFT(cfg)
    rng = jax.random.PRNGKey(0)
    img = jnp.zeros((1, 48, 64, 3), jnp.float32)
    variables = model.init(rng, img, img, train=False)
    return model, variables


def test_forward_shapes(tiny_model):
    model, variables = tiny_model
    img1 = jnp.ones((1, 48, 64, 3), jnp.float32) * 0.5
    img2 = img1
    out = model.apply(variables, img1, img2, train=False)
    assert out["flow_up"].shape == (2, 1, 48, 64, 2)
    assert out["flow_low"].shape == (2, 1, 6, 8, 2)
    assert np.isfinite(np.asarray(out["flow_up"])).all()


def test_forward_non_multiple_of_8(tiny_model):
    model, variables = tiny_model
    img = jnp.ones((1, 43, 61, 3), jnp.float32) * 0.5
    out = model.apply(variables, img, img, train=False)
    # ceil-division downsample (43 -> 22 -> 11 -> 6, 61 -> 31 -> 16 -> 8)
    assert out["flow_low"].shape == (2, 1, 6, 8, 2)
    assert out["flow_up"].shape == (2, 1, 43, 61, 2)


def test_param_structure(tiny_model):
    model, variables = tiny_model
    params = variables["params"]
    assert "fnet" in params and "cnet" in params and "update_block" in params
    assert "batch_stats" in variables  # cnet uses batch norm
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    # full RAFT is ~5.3M params
    assert 4.5e6 < n_params < 6.0e6, n_params


def test_jit_and_grad(tiny_model):
    model, variables = tiny_model

    @jax.jit
    def loss_fn(params, img1, img2):
        out = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            img1,
            img2,
            train=False,
        )
        return jnp.abs(out["flow_up"]).mean()

    img1 = jnp.ones((1, 48, 64, 3), jnp.float32) * 0.3
    img2 = jnp.roll(img1, 2, axis=2)
    g = jax.grad(loss_fn)(variables["params"], img1, img2)
    gnorm = sum(jnp.sum(jnp.square(x)) for x in jax.tree_util.tree_leaves(g))
    assert np.isfinite(np.asarray(gnorm)) and np.asarray(gnorm) > 0


def test_flow_init_warm_start(tiny_model):
    model, variables = tiny_model
    img = jnp.ones((1, 48, 64, 3), jnp.float32) * 0.5
    flow_init = jnp.ones((1, 6, 8, 2), jnp.float32)
    out = model.apply(variables, img, img, flow_init=flow_init, train=False)
    assert out["flow_up"].shape == (2, 1, 48, 64, 2)


def test_teacher_head_shares_encoders():
    cfg = RAFTConfig(iters=1, teacher=True).resolved()
    model = RAFT(cfg)
    img = jnp.zeros((1, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img, img, train=False)
    # teacher params only exist after being used; init via full pipeline
    params = variables["params"]
    assert "update_block" in params
    # run the teacher path explicitly
    def run(mdl):
        f1, f2 = mdl.features(img, img)
        pyr = mdl.build_corr(f1, f2)
        net, inp = mdl.context(img)
        c0 = jnp.zeros((1, 4, 4, 2))
        return mdl.teacher_iterate(net, inp, pyr, c0, c0, (32, 32), 1)

    variables2 = model.init(jax.random.PRNGKey(0), method=run)
    assert "teacher_update_block" in variables2["params"]


def test_small_model_forward():
    # small variant: bottleneck encoders, ConvGRU, bilinear x8 upsample
    cfg = RAFTConfig(iters=2, small=True).resolved()
    assert not cfg.convex_upsampling and cfg.corr_radius == 3
    model = RAFT(cfg)
    img = jnp.full((1, 48, 64, 3), 0.5)
    variables = model.init(jax.random.PRNGKey(0), img, img, train=False)
    out = model.apply(variables, img, img, train=False)
    assert out["flow_up"].shape == (2, 1, 48, 64, 2)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(variables["params"]))
    assert n_params < 1.5e6, n_params  # small RAFT ~1M params


def test_scan_matches_unrolled():
    import dataclasses

    cfg = RAFTConfig(iters=3).resolved()
    model_scan = RAFT(dataclasses.replace(cfg, scan_iters=True))
    model_unroll = RAFT(dataclasses.replace(cfg, scan_iters=False))
    img1 = jnp.full((1, 32, 48, 3), 0.4)
    img2 = jnp.roll(img1, 1, axis=2) * 0.9
    v = model_scan.init(jax.random.PRNGKey(3), img1, img2, train=False)
    a = model_scan.apply(v, img1, img2, train=False)
    b = model_unroll.apply(v, img1, img2, train=False)
    np.testing.assert_allclose(
        np.asarray(a["flow_up"]), np.asarray(b["flow_up"]), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(a["flow_low"]), np.asarray(b["flow_low"]), rtol=1e-5, atol=1e-5
    )


@pytest.mark.parametrize("scan", [True, False])
@pytest.mark.parametrize("small", [False, True])
def test_final_flow_only_matches_last(scan, small):
    """final_flow_only computes the convex upsample once after the loop; its
    single flow_up must equal the full run's flow_up[-1] (and flow_low must be
    identical — all iterations are still emitted for warm start)."""
    import dataclasses

    cfg = RAFTConfig(iters=3, small=small, scan_iters=scan).resolved()
    model = RAFT(cfg)
    img1 = jnp.full((1, 32, 48, 3), 0.4)
    img2 = jnp.roll(img1, 1, axis=2) * 0.9
    v = model.init(jax.random.PRNGKey(3), img1, img2, train=False)
    full = model.apply(v, img1, img2, train=False)
    last = model.apply(v, img1, img2, train=False, final_flow_only=True)
    assert last["flow_up"].shape[0] == 1
    np.testing.assert_allclose(
        np.asarray(last["flow_up"][-1]),
        np.asarray(full["flow_up"][-1]),
        rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(last["flow_low"]), np.asarray(full["flow_low"]),
        rtol=1e-5, atol=1e-5,
    )
