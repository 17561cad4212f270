"""Lockstep SEMI (flow-supervisor) training-dynamics parity vs the
reference's ACTUAL TF ``Semisupervised.train_step`` (raft/semi.py:346-497).

Closes the last untested parity surface from VERDICT r4 #3/#4: the two-tape
per-variable gradient merge (sup branch: student label loss + L_fl teacher
loss; unsup branch: L_fr student-vs-teacher-final with the reference's
Reduction.NONE pixel-SUM gradient semantics), the frozen-BN exclusion
(util/train.py:4-12: BN gamma/beta leave trainable_weights entirely for
non-chairs stages), and the tfa-AdamW update on the merged gradient.

The reference model runs eagerly with the same stubs as the full-forward
golden (tests/tf_ref_harness.py); weights flow through the proven TF
checkpoint converter (teacher head auto-detected). Sizes are the composed
L2L golden's (every pyramid level halves exactly, so the pooled-fmap
identity matches the reference's SAME-pooled volume bit-for-bit).

Torch note: the reference's own two implementations disagree on teacher
gradient flow (torch l2l.py:105-110 detaches only the first lookup; TF
semi.py stop-gradients the whole teacher volume) and on L_fr reduction —
this framework follows the TF main tree, so TF is the lockstep target
(see tests/test_torch_l2l_golden.py for the forward-values golden).
"""
import os

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax
import jax.numpy as jnp

from tf_ref_harness import TfaAdamW, install_stubs

FULL_H, FULL_W = 192, 256
CROP_H, CROP_W = 128, 128
OY, OX = 32, 64  # 8-aligned crop offset
ITERS = 2
TEACHER_ITERS = 2
STEPS = 2
LR = 1e-3
WD = 3e-3
GAMMA = 0.8


def _np_batches():
    rng = np.random.RandomState(11)
    out = []
    u = lambda s: rng.uniform(0, 1, s).astype(np.float32)
    for _ in range(STEPS):
        out.append(
            dict(
                sup_crop1=u((1, CROP_H, CROP_W, 3)),
                sup_crop2=u((1, CROP_H, CROP_W, 3)),
                sup_full1=u((1, FULL_H, FULL_W, 3)),
                sup_full2=u((1, FULL_H, FULL_W, 3)),
                flow=(rng.randn(1, CROP_H, CROP_W, 2) * 2).astype(np.float32),
                valid=np.ones((1, CROP_H, CROP_W, 1), np.float32),
                un_crop1=u((1, CROP_H, CROP_W, 3)),
                un_crop2=u((1, CROP_H, CROP_W, 3)),
                un_full1=u((1, FULL_H, FULL_W, 3)),
                un_full2=u((1, FULL_H, FULL_W, 3)),
            )
        )
    return out


@pytest.fixture(scope="module")
def tf_semi_run(tmp_path_factory):
    if not os.path.isdir("/root/reference/raft"):
        pytest.skip("reference tree not mounted")
    install_stubs()
    from argparse import Namespace

    from raft.loss import FlowLossRobust
    from raft.semi import Semisupervised
    from util.train import freeze_bn

    params = Namespace(
        small=False, dropout=0.0, iters=ITERS, alternate_corr=False,
        loss_decay_rate=GAMMA, teacher_iters=TEACHER_ITERS,
        lfl_loss_decay_rate=GAMMA, sup_weight=1.0, unsup_weight=1.0,
        lfr_weight=1.0, lfl_weight=1.0, sup_label_loss_weight=1.0,
        teacher_smurf_weight=0.0, lfr_loss_type="l2",
        census_weight=1.0, smooth1_weight=2.5, smooth2_weight=0.0,
        selfsup_weight=0.3, smurf_occlusion="wang",
    )
    model = Semisupervised(params)
    batches = _np_batches()
    b0 = batches[0]

    def six(b, sup):
        p = "sup_" if sup else "un_"
        return (
            tf.constant(b[p + "crop1"]), tf.constant(b[p + "crop2"]),
            tf.constant(b[p + "full1"]), tf.constant(b[p + "full2"]),
            tf.constant([OX], tf.int32), tf.constant([OY], tf.int32),
        )

    model(six(b0, True), training=False)  # build every head
    # reference initialize_teacher_net semantics without the 512x512 build
    model.teacher_update_block.set_weights(model.update_block.get_weights())
    freeze_bn(model)  # non-chairs stage: BN leaves trainable_weights

    ckpt_dir = tmp_path_factory.mktemp("lockstep_semi")
    path0 = tf.train.Checkpoint(model=model).write(str(ckpt_dir / "init"))

    captured = []

    class CapturingAdamW(TfaAdamW):
        def apply_gradients(self, grads_and_vars, *a, **k):
            gv = [(g, v) for g, v in grads_and_vars]
            if not captured:
                captured.append([
                    (None if g is None else np.array(g), v) for g, v in gv
                ])
            return super().apply_gradients(gv, *a, **k)

    opt = CapturingAdamW(weight_decay=WD, learning_rate=LR, epsilon=1e-8,
                         clipnorm=1.0)
    model.compile(loss=FlowLossRobust(), optimizer=opt, run_eagerly=True)

    logs = []
    step_paths = []
    for b in batches:
        x = {
            "sup_augmented_img": (tf.constant(b["sup_crop1"]),
                                  tf.constant(b["sup_crop2"])),
            "sup_original_img": (tf.constant(b["sup_full1"]),
                                 tf.constant(b["sup_full2"])),
            "sup_crop_x": tf.constant([[OX]], tf.int32),
            "sup_crop_y": tf.constant([[OY]], tf.int32),
            "augmented_img": (tf.constant(b["un_crop1"]),
                              tf.constant(b["un_crop2"])),
            "original_img": (tf.constant(b["un_full1"]),
                             tf.constant(b["un_full2"])),
            "crop_x": tf.constant([[OX]], tf.int32),
            "crop_y": tf.constant([[OY]], tf.int32),
        }
        y = {
            "sup_flows": tf.constant(b["flow"][:, None]),
            "sup_valids": tf.constant(b["valid"][:, None]),
            "flows": tf.constant(b["flow"][:, None]),
            "valids": tf.constant(b["valid"][:, None]),
        }
        m = model.train_step((x, y))
        logs.append({
            "sup_label_loss": float(m["sup_label_loss"]),
            "lfl_loss": float(m["lfl_loss"]),
            "lfr_sum": float(tf.reduce_sum(m["lfr_loss"])),
        })
        step_paths.append(
            tf.train.Checkpoint(model=model).write(
                str(ckpt_dir / f"step{len(step_paths) + 1}")
            )
        )

    # export the step-1 MERGED gradient (exactly what apply_gradients saw)
    # through the converter: assign into the trainable variables, write one
    # more checkpoint. Frozen-BN gamma/beta are NOT in this set — their ckpt
    # slots keep (init) values and are skipped by name in the comparisons.
    for g, v in captured[0]:
        v.assign(tf.zeros_like(v) if g is None else tf.cast(g, v.dtype))
    path_gm = tf.train.Checkpoint(model=model).write(str(ckpt_dir / "gradsm"))

    return dict(init=path0, steps=step_paths, gradsm=path_gm, logs=logs)


def _leaf_items(tree, prefix=""):
    if isinstance(tree, dict):
        for k, v in sorted(tree.items()):
            yield from _leaf_items(v, f"{prefix}/{k}")
    else:
        yield prefix, np.asarray(tree)


def _flat(tree):
    return dict(_leaf_items(jax.tree_util.tree_map(np.asarray, tree)))


@pytest.fixture(scope="module")
def jax_semi_run(tf_semi_run):
    from flow_supervisor_tpu.config import ModelCfg
    from flow_supervisor_tpu.convert import load_tf_checkpoint
    from flow_supervisor_tpu.models import RAFT, RAFTConfig
    from flow_supervisor_tpu.training.optim import adamw
    from flow_supervisor_tpu.training.semi import make_semi_train_step
    from flow_supervisor_tpu.training.state import TrainState

    params0, stats0 = load_tf_checkpoint(tf_semi_run["init"], teacher=True)
    cfg = RAFTConfig(
        iters=ITERS, teacher=True, teacher_iters=TEACHER_ITERS,
        freeze_bn=True, lookup_backend="einsum", dy_major_corr=False,
    ).resolved()
    model = RAFT(cfg)
    mc = ModelCfg(
        model_type="raft-semi", iters=ITERS, teacher_iters=TEACHER_ITERS,
        lfr_loss_type="l2", compute_dtype="float32", corr_dtype="float32",
        lookup_backend="einsum",
    )
    step = make_semi_train_step(model, mc, gamma=GAMMA, sup_loss_type="robust",
                                donate=False, debug_grads=True)

    def run(p0):
        tx = adamw(lambda t: LR, lambda t: WD, clip_norm=1.0, freeze_bn=True)
        state = TrainState.create(p0, stats0, tx)
        merged0, logs, snaps = None, [], []
        for b in _np_batches():
            sup = dict(
                image1=jnp.asarray(b["sup_crop1"]),
                image2=jnp.asarray(b["sup_crop2"]),
                orig_image1=jnp.asarray(b["sup_full1"]),
                orig_image2=jnp.asarray(b["sup_full2"]),
                crop_yx=jnp.asarray([[OY, OX]], jnp.int32),
                flow=jnp.asarray(b["flow"]),
                valid=jnp.asarray(b["valid"]),
            )
            unsup = dict(
                image1=jnp.asarray(b["un_crop1"]),
                image2=jnp.asarray(b["un_crop2"]),
                orig_image1=jnp.asarray(b["un_full1"]),
                orig_image2=jnp.asarray(b["un_full2"]),
                crop_yx=jnp.asarray([[OY, OX]], jnp.int32),
            )
            state, log = step(state, sup, unsup)
            if merged0 is None:
                merged0 = jax.tree_util.tree_map(np.asarray,
                                                 log["_merged_grads"])
            logs.append({k: float(v) for k, v in log.items()
                         if k != "_merged_grads"})
            snaps.append(jax.tree_util.tree_map(np.asarray, state.params))
        return merged0, logs, snaps

    merged0, logs, snaps = run(params0)
    # chaos twin: 1e-6-perturbed start prices the fp-noise floor of the
    # trajectory comparison (see test_lockstep_train.py rationale)
    params0p = jax.tree_util.tree_map(lambda x: x * (1.0 + 1e-6) + 1e-8,
                                      params0)
    _, _, snaps_p = run(params0p)
    return dict(params0=params0, merged0=merged0, logs=logs, snaps=snaps,
                snaps_p=snaps_p)


def test_semi_loss_scalars_match(tf_semi_run, jax_semi_run):
    """Per-step branch losses agree: sup label, L_fl, and the pixel-summed
    L_fr (reference logs the raw Reduction.NONE map; its sum equals our
    mean-based term times B*H*W)."""
    n_pix = float(CROP_H * CROP_W)
    for tl, jl in zip(tf_semi_run["logs"], jax_semi_run["logs"]):
        assert tl["sup_label_loss"] == pytest.approx(jl["sup_label_loss"],
                                                     rel=2e-2)
        assert tl["lfl_loss"] == pytest.approx(jl["lfl_loss"], rel=2e-2)
        assert tl["lfr_sum"] == pytest.approx(jl["lfr_loss"] * n_pix, rel=2e-2)


def _partition(flat_gt):
    """live/null leaf partition from the reference's own merged gradient.

    Null = the bias-before-norm leaves (algebraically zero gradient; fp
    noise only). The cutoff is RELATIVE PER SCALE FAMILY: the unsup
    branch's pixel-sum makes student-path gradients ~B*H*W larger than the
    teacher head's (which only the mean-scaled L_fl touches), so one global
    threshold would misclassify live teacher leaves."""
    fams = {}
    for name, g in flat_gt.items():
        if "BatchNorm" in name:
            continue
        fam = "teacher" if "teacher_update_block" in name else "student"
        fams.setdefault(fam, []).append(g.ravel())
    gref = {f: np.sqrt(np.mean(np.concatenate(v).astype(np.float64) ** 2))
            for f, v in fams.items()}
    live, null = set(), set()
    for name, g in flat_gt.items():
        if "BatchNorm" in name:
            continue
        fam = "teacher" if "teacher_update_block" in name else "student"
        rms = float(np.sqrt(np.mean(g.astype(np.float64) ** 2)))
        # only the bias-before-norm leaves are ALGEBRAIC nulls; tiny
        # non-bias leaves (e.g. the teacher mask head at init: softmax
        # weights near-uniform over smooth teacher flows, rms ~1e-6 vs the
        # family's ~1e-1) are genuinely live and handled by the floored
        # denominator in the comparisons.
        if name.endswith("/bias") and rms < 1e-4 * gref[fam]:
            null.add(name)
        else:
            live.add(name)
    return live, null, gref


def test_semi_merged_gradient_parity(tf_semi_run, jax_semi_run):
    """The step-1 merged gradient (two-branch per-variable merge, incl. the
    reference's pixel-sum L_fr scale) agrees leaf by leaf."""
    from flow_supervisor_tpu.convert import load_tf_checkpoint

    grads_tf, _ = load_tf_checkpoint(tf_semi_run["gradsm"], teacher=True)
    flat_gt = _flat(grads_tf)
    flat_gj = _flat(jax_semi_run["merged0"])
    assert set(flat_gt) == set(flat_gj)

    live, _null, gref = _partition(flat_gt)
    errs = []
    for name in live:
        fam = "teacher" if "teacher_update_block" in name else "student"
        gt = flat_gt[name]
        # floored relative error: a leaf whose own norm sits orders below
        # its family scale is compared against the family floor instead of
        # its (noise-dominated) own norm
        denom = max(np.linalg.norm(gt),
                    1e-3 * gref[fam] * np.sqrt(gt.size))
        errs.append((np.linalg.norm(flat_gj[name] - gt) / denom, name))
    assert len(errs) > 60
    errs.sort(reverse=True)
    assert errs[0][0] < 2e-2, f"merged gradient diverged: {errs[:8]}"


def test_semi_parameter_trajectory(tf_semi_run, jax_semi_run):
    """Post-2-step parameters agree leaf by leaf relative to drift, within
    3x the measured chaos floor; frozen BN gamma/beta must be EXACTLY
    unchanged on both sides (reference: not trainable; ours: masked update)."""
    from flow_supervisor_tpu.convert import load_tf_checkpoint

    params1_tf, _ = load_tf_checkpoint(tf_semi_run["steps"][-1], teacher=True)
    flat_tf0 = _flat(jax_semi_run["params0"])
    flat_tf1 = _flat(params1_tf)
    flat_jx1 = _flat(jax_semi_run["snaps"][-1])
    flat_jp1 = _flat(jax_semi_run["snaps_p"][-1])
    grads_tf, _ = load_tf_checkpoint(tf_semi_run["gradsm"], teacher=True)
    flat_gt = _flat(grads_tf)
    assert set(flat_tf1) == set(flat_jx1)

    live, null, _gref = _partition(flat_gt)
    worst = []
    for name in flat_tf1:
        if "BatchNorm" in name:
            np.testing.assert_array_equal(
                flat_tf1[name], flat_tf0[name],
                err_msg=f"reference moved frozen BN leaf {name}")
            np.testing.assert_array_equal(
                flat_jx1[name], flat_tf0[name],
                err_msg=f"our optimizer moved frozen BN leaf {name}")
            continue
        drift = np.linalg.norm(flat_tf1[name] - flat_tf0[name])
        mismatch = np.linalg.norm(flat_tf1[name] - flat_jx1[name])
        if name in null:
            # null-gradient leaf: Adam fp-noise walk, bound only
            assert mismatch < 2.0 * STEPS * LR * np.sqrt(flat_gt[name].size), name
            continue
        assert drift > 0, name
        ratio_tf = mismatch / drift
        ratio_chaos = np.linalg.norm(flat_jp1[name] - flat_jx1[name]) / drift
        worst.append((ratio_tf / max(ratio_chaos, 0.02), ratio_tf,
                      ratio_chaos, name))
    worst.sort(reverse=True)
    assert worst[0][0] < 3.0, f"semi trajectory diverged: {worst[:5]}"
    assert np.median([w[2] for w in worst]) < 0.6, worst[:5]
