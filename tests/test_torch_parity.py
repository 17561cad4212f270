"""Golden parity test: the reference torch RAFT and this framework produce the
same flow on the same (randomly initialized) weights.

The reference tree is mounted read-only at /root/reference; we import its torch
model for VALIDATION only. Skipped when the reference isn't present.
"""
import os
import sys

import numpy as np
import pytest

REF = "/root/reference/pytorch"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference tree not mounted"
)


@pytest.fixture(scope="module")
def torch_raft():
    sys.path.insert(0, REF)
    sys.path.insert(0, os.path.join(REF, "core"))
    import torch
    from argparse import Namespace
    from core.raft import RAFT as TorchRAFT

    torch.manual_seed(7)
    model = TorchRAFT(
        Namespace(small=False, dropout=0.0, alternate_corr=False, mixed_precision=False)
    )
    model.eval()
    return model


def test_forward_parity_with_reference_torch(torch_raft):
    import torch
    import jax
    import jax.numpy as jnp

    from flow_supervisor_tpu.convert import convert_torch_raft
    from flow_supervisor_tpu.models import RAFT, RAFTConfig

    # Size constraints for an apples-to-apples comparison:
    # - >= 2px at the coarsest corr level (the torch reference's grid_sample
    #   normalization divides by W-1 -> NaN for 1-px planes);
    # - H/8 and W/8 divisible by 8: the torch tree pools the pyramid CASCADED
    #   with floor division (pytorch/core/corr.py avg_pool2d) while the TF main
    #   tree — which this framework follows — pools the original volume with
    #   SAME padding (raft/allfield.py:80-92); they only agree when every level
    #   divides evenly.
    h, w, iters = 128, 192, 4
    rng = np.random.default_rng(0)
    img1 = rng.uniform(0, 255, (1, h, w, 3)).astype(np.float32)
    img2 = rng.uniform(0, 255, (1, h, w, 3)).astype(np.float32)

    with torch.no_grad():
        t1 = torch.from_numpy(img1.transpose(0, 3, 1, 2))
        t2 = torch.from_numpy(img2.transpose(0, 3, 1, 2))
        flow_low_t, flow_up_t = torch_raft(t1, t2, iters=iters, test_mode=True)
    flow_up_t = flow_up_t.numpy().transpose(0, 2, 3, 1)
    flow_low_t = flow_low_t.numpy().transpose(0, 2, 3, 1)

    params, stats = convert_torch_raft(torch_raft.state_dict())
    model = RAFT(RAFTConfig(iters=iters).resolved())
    variables = {
        "params": jax.tree_util.tree_map(jnp.asarray, params),
        "batch_stats": jax.tree_util.tree_map(jnp.asarray, stats),
    }
    out = model.apply(
        variables,
        jnp.asarray(img1 / 255.0),
        jnp.asarray(img2 / 255.0),
        train=False,
    )
    flow_up_j = np.asarray(out["flow_up"][-1])
    flow_low_j = np.asarray(out["flow_low"][-1])

    # identical weights + math => near-identical flows (fp32 conv reassociation
    # tolerance only)
    err_low = np.abs(flow_low_j - flow_low_t).max()
    err_up = np.abs(flow_up_j - flow_up_t).max()
    assert err_low < 2e-3, err_low
    assert err_up < 2e-2, err_up


def test_l2l_teacher_mapping(torch_raft):
    from flow_supervisor_tpu.convert import convert_torch_raft

    sd = {("grad_" + k if k.startswith("update_block") else k): v
          for k, v in torch_raft.state_dict().items()}
    sd = dict(torch_raft.state_dict(), **{
        "grad_update_block" + k[len("update_block"):]: v
        for k, v in torch_raft.state_dict().items() if k.startswith("update_block")
    })
    params, _ = convert_torch_raft(sd, teacher=True)
    assert "teacher_update_block" in params
    a = params["teacher_update_block"]["FlowHead_0"]["UpdateConv_0"]["Conv_0"]["kernel"]
    b = params["update_block"]["FlowHead_0"]["UpdateConv_0"]["Conv_0"]["kernel"]
    np.testing.assert_array_equal(a, b)


def test_gma_forward_parity_with_reference_torch():
    import torch
    import jax
    import jax.numpy as jnp
    from argparse import Namespace

    sys.path.insert(0, REF)
    sys.path.insert(0, os.path.join(REF, "core"))
    from core.gma_network import RAFTGMA

    from flow_supervisor_tpu.convert import convert_torch_raft
    from flow_supervisor_tpu.models import RAFT, RAFTConfig

    torch.manual_seed(11)
    tm = RAFTGMA(
        Namespace(
            small=False, dropout=0.0, alternate_corr=False, mixed_precision=False,
            num_heads=1, position_only=False, position_and_content=False,
        )
    )
    tm.eval()

    h, w, iters = 128, 192, 3
    rng = np.random.default_rng(1)
    img1 = rng.uniform(0, 255, (1, h, w, 3)).astype(np.float32)
    img2 = rng.uniform(0, 255, (1, h, w, 3)).astype(np.float32)
    with torch.no_grad():
        t1 = torch.from_numpy(img1.transpose(0, 3, 1, 2))
        t2 = torch.from_numpy(img2.transpose(0, 3, 1, 2))
        _, up_t = tm(t1, t2, iters=iters, test_mode=True)
    up_t = up_t.numpy().transpose(0, 2, 3, 1)

    params, stats = convert_torch_raft(tm.state_dict(), gma=True)
    model = RAFT(RAFTConfig(iters=iters, gma=True).resolved())
    variables = {
        "params": jax.tree_util.tree_map(jnp.asarray, params),
        "batch_stats": jax.tree_util.tree_map(jnp.asarray, stats),
    }
    out = model.apply(
        variables, jnp.asarray(img1 / 255.0), jnp.asarray(img2 / 255.0), train=False
    )
    err = np.abs(np.asarray(out["flow_up"][-1]) - up_t).max()
    assert err < 2e-2, err
