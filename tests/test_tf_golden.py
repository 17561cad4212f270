"""Full-forward numerics golden against the reference's ACTUAL TensorFlow
model (VERDICT r2 missing #2 / next-round #5).

The reference RAFT (/root/reference/raft/__init__.py:44-176) is imported and
executed directly — its real BasicEncoder / BasicUpdateBlock /
UpsampleConvexWithMask / calc_all_field / smurf_corr_block code — under the
legacy-Keras shim, with two absent third-party deps stood in:

  * ``box.Box``: dict-with-attribute-access (the reference only does
    Box(vars(namespace)) and attribute reads);
  * ``tensorflow_addons``: InstanceNormalization(center=False, scale=False,
    epsilon=1e-5) is affine-free instance norm (raft_extractor.py:95-116),
    and tfa.image.resampler's documented semantics (bilinear, OOB -> 0) are
    provided by the reference's own pure-TF drop-in
    uflow/uflow_resampler.py:56-74.

The TF model's random weights are saved as a genuine
``tf.train.Checkpoint(model=...)`` (the released-checkpoint format,
reference train.py:177), loaded through ``convert.load_tf_checkpoint``, and
the 12-iteration flow predictions of both frameworks are compared. This
upgrades the converter test from name-structure round-trip to numerics
parity against real TF — the closest in-env proxy for the <=0.05-EPE budget
(no checkpoint files / egress in this environment).
"""
import os

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax
import jax.numpy as jnp

H, W = 64, 96
ITERS = 12


from tf_ref_harness import install_stubs as _install_stubs  # noqa: E402


@pytest.fixture(scope="module")
def tf_reference_run(tmp_path_factory):
    if not os.path.isdir("/root/reference/raft"):
        pytest.skip("reference tree not mounted")
    _install_stubs()
    import raft as ref_raft

    from argparse import Namespace

    params = Namespace(small=False, dropout=0.0, iters=ITERS,
                       alternate_corr=False)
    model = ref_raft.RAFT(params)

    rng = np.random.RandomState(0)
    img1 = rng.uniform(0, 1, (1, H, W, 3)).astype(np.float32)
    img2 = rng.uniform(0, 1, (1, H, W, 3)).astype(np.float32)
    # build + forward with the real TF code (training=False: cnet BatchNorm
    # uses moving statistics, exactly like evaluation)
    preds = model((tf.constant(img1), tf.constant(img2)), training=False)
    flows_tf = np.stack([np.asarray(p) for p in preds])

    ckpt_dir = tmp_path_factory.mktemp("tf_golden_ckpt")
    path = tf.train.Checkpoint(model=model).write(str(ckpt_dir / "ckpt"))
    return path, img1, img2, flows_tf


def test_full_forward_matches_reference_tf(tf_reference_run):
    path, img1, img2, flows_tf = tf_reference_run

    from flow_supervisor_tpu.convert import load_tf_checkpoint
    from flow_supervisor_tpu.models import RAFT, RAFTConfig

    params, batch_stats = load_tf_checkpoint(path, teacher=False)
    cfg = RAFTConfig(
        iters=ITERS, lookup_backend="einsum", dy_major_corr=False
    ).resolved()
    model = RAFT(cfg)
    out = model.apply(
        {"params": params, "batch_stats": batch_stats},
        jnp.asarray(img1), jnp.asarray(img2), train=False,
    )
    flows_jax = np.asarray(out["flow_up"])  # [iters, B, H, W, 2]

    assert flows_jax.shape == flows_tf.shape
    # per-iteration agreement: the bar is far under the 0.05-EPE budget
    for i in (0, ITERS // 2, ITERS - 1):
        d = np.abs(flows_jax[i] - flows_tf[i])
        assert d.max() < 1e-2, (i, d.max())
    epe = np.sqrt(((flows_jax[-1] - flows_tf[-1]) ** 2).sum(-1)).mean()
    assert epe < 2e-3, epe


def test_final_epe_budget_on_magnitudes(tf_reference_run):
    """Flow magnitudes are non-degenerate (the comparison is not 0 vs 0)."""
    _, _, _, flows_tf = tf_reference_run
    assert np.abs(flows_tf[-1]).max() > 0.05


# Recipe-class shape: the chairs training resolution (reference train.sh:3).
# h8=46, w8=62 go ODD at pyramid levels 2+ (46->23->12->6, 62->31->16->8), so
# SAME-pool padding on odd sizes, pad specs, and resampler edge semantics are
# all exercised — none of which the 64x96 case can catch.
H_L, W_L = 368, 496


@pytest.fixture(scope="module")
def tf_reference_run_large(tmp_path_factory):
    if not os.path.isdir("/root/reference/raft"):
        pytest.skip("reference tree not mounted")
    _install_stubs()
    import raft as ref_raft

    from argparse import Namespace

    params = Namespace(small=False, dropout=0.0, iters=ITERS,
                       alternate_corr=False)
    model = ref_raft.RAFT(params)

    rng = np.random.RandomState(7)
    img1 = rng.uniform(0, 1, (1, H_L, W_L, 3)).astype(np.float32)
    img2 = rng.uniform(0, 1, (1, H_L, W_L, 3)).astype(np.float32)
    preds = model((tf.constant(img1), tf.constant(img2)), training=False)
    flows_tf = np.stack([np.asarray(p) for p in preds])

    ckpt_dir = tmp_path_factory.mktemp("tf_golden_ckpt_large")
    path = tf.train.Checkpoint(model=model).write(str(ckpt_dir / "ckpt"))
    return path, img1, img2, flows_tf


def test_epe_budget_at_recipe_shape(tf_reference_run_large):
    """<=0.05-EPE budget (BASELINE.md accuracy target) at a recipe-class
    resolution, 12 iterations — the strongest in-env proxy for released-
    checkpoint parity (no checkpoint files / egress here)."""
    path, img1, img2, flows_tf = tf_reference_run_large

    from flow_supervisor_tpu.convert import load_tf_checkpoint
    from flow_supervisor_tpu.models import RAFT, RAFTConfig

    params, batch_stats = load_tf_checkpoint(path, teacher=False)
    cfg = RAFTConfig(
        iters=ITERS, lookup_backend="einsum", dy_major_corr=False,
        scan_iters=True,  # 12x smaller HLO: keeps the CPU compile tractable
    ).resolved()
    model = RAFT(cfg)
    out = model.apply(
        {"params": params, "batch_stats": batch_stats},
        jnp.asarray(img1), jnp.asarray(img2), train=False,
    )
    flows_jax = np.asarray(out["flow_up"])

    assert flows_jax.shape == flows_tf.shape
    assert np.abs(flows_tf[-1]).max() > 0.05  # non-degenerate
    epe = np.sqrt(((flows_jax[-1] - flows_tf[-1]) ** 2).sum(-1)).mean()
    assert epe < 0.05, epe  # the published accuracy budget
    # expected far tighter (64x96 case holds <2e-3); record the real margin
    assert epe < 5e-3, epe
    d = np.abs(flows_jax[-1] - flows_tf[-1])
    assert d.max() < 5e-2, d.max()
