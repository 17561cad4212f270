"""Composed flow-supervisor golden: `semi_forward` vs the reference's torch
L2L (/root/reference/pytorch/core/l2l.py:24-133) on the same random weights.

This pins the COMPOSED teacher-student forward — student refinement on the
crop, zero-pad of the student's hidden state and flow into full-image
coordinates, teacher context/correlation from the full frames, teacher
continuation from the student's final flow, and the crop of teacher
predictions back into the student frame — not just the piecewise ops. The
teacher path was restructured for speed in round 3 (crop-resolution teacher
upsample, final-only branches); this test ties that rewrite to the
reference's own composition.

Forward VALUES only: the reference's two implementations disagree with each
other on teacher-branch gradient flow (torch L2L detaches only the teacher's
first lookup, l2l.py:105-110, while TF stop-gradients the whole teacher
volume, raft/semi.py:208-212); this framework follows the TF semantics, so
gradients are checked against internal oracles (tests/test_semi_training.py)
instead.

Size constraints (same as test_torch_parity.py): H/8 and W/8 divisible by 8
for crop AND full frame (the torch tree pools the pyramid cascaded with
floor division; the TF main tree — which this framework follows — pools the
original volume with SAME padding; they only agree when every level divides
evenly), and >= 2 px at the coarsest level (torch grid_sample normalization
divides by size-1).
"""
import os
import sys

import numpy as np
import pytest

REF = "/root/reference/pytorch"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference tree not mounted"
)

FULL_H, FULL_W = 192, 256
CROP_H, CROP_W = 128, 128
OY, OX = 32, 64  # multiples of 8 (the augmentor 8-aligns crops)
ITERS = 2  # student iters; torch L2L runs 2*ITERS (first half student)


@pytest.fixture(scope="module")
def torch_l2l():
    sys.path.insert(0, REF)
    sys.path.insert(0, os.path.join(REF, "core"))
    import torch
    from argparse import Namespace
    from core.l2l import L2L

    torch.manual_seed(3)
    model = L2L(
        Namespace(small=False, dropout=0.0, alternate_corr=False,
                  mixed_precision=False)
    )
    model.eval()  # BatchNorm running stats, like evaluation/training-frozen-BN
    return model


def test_semi_forward_matches_reference_l2l(torch_l2l):
    import torch
    import jax
    import jax.numpy as jnp

    from flow_supervisor_tpu.convert import convert_torch_raft
    from flow_supervisor_tpu.models import RAFT, RAFTConfig

    rng = np.random.default_rng(42)
    full1 = rng.uniform(0, 255, (1, FULL_H, FULL_W, 3)).astype(np.float32)
    full2 = rng.uniform(0, 255, (1, FULL_H, FULL_W, 3)).astype(np.float32)
    crop1 = full1[:, OY : OY + CROP_H, OX : OX + CROP_W]
    crop2 = full2[:, OY : OY + CROP_H, OX : OX + CROP_W]

    def nchw(a):
        return torch.from_numpy(a.transpose(0, 3, 1, 2)).contiguous()

    with torch.no_grad():
        preds = torch_l2l(
            nchw(crop1), nchw(crop2), ci1=nchw(full1), ci2=nchw(full2),
            ox=torch.tensor([OX]), oy=torch.tensor([OY]), iters=2 * ITERS,
            test_mode=False,
        )
    preds = [p.numpy().transpose(0, 2, 3, 1) for p in preds]
    stu_t = np.stack(preds[:ITERS])  # student preds, crop frame
    tea_t = np.stack(preds[ITERS:])  # teacher preds, cropped back (l2l.py:124-125)
    assert tea_t.shape[2:4] == (CROP_H, CROP_W)

    params, stats = convert_torch_raft(torch_l2l.state_dict(), teacher=True)
    cfg = RAFTConfig(iters=ITERS, teacher=True, teacher_iters=ITERS).resolved()
    model = RAFT(cfg)
    variables = {
        "params": jax.tree_util.tree_map(jnp.asarray, params),
        "batch_stats": jax.tree_util.tree_map(jnp.asarray, stats),
    }
    out = model.apply(
        variables,
        jnp.asarray(crop1 / 255.0), jnp.asarray(crop2 / 255.0),
        jnp.asarray(full1 / 255.0), jnp.asarray(full2 / 255.0),
        jnp.asarray([[OY, OX]]),
        train=False, use_bw=False, method="semi_forward",
    )
    stu_j = np.asarray(out["student_fw"])
    tea_j = np.asarray(out["teacher_fw"])

    assert stu_j.shape == stu_t.shape
    assert tea_j.shape == tea_t.shape
    # non-degenerate comparison
    assert np.abs(tea_t[-1]).max() > 0.05

    for i in range(ITERS):
        d = np.abs(stu_j[i] - stu_t[i])
        assert d.max() < 2e-2, ("student", i, d.max())
    for i in range(ITERS):
        d = np.abs(tea_j[i] - tea_t[i])
        assert d.max() < 2e-2, ("teacher", i, d.max())
    epe_s = np.sqrt(((stu_j[-1] - stu_t[-1]) ** 2).sum(-1)).mean()
    epe_t = np.sqrt(((tea_j[-1] - tea_t[-1]) ** 2).sum(-1)).mean()
    assert epe_s < 2e-3, epe_s
    assert epe_t < 2e-3, epe_t
