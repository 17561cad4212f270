"""Weight converter: reference torch RAFT / L2L / GMA state_dicts -> flax params.

Enables (a) loading the reference's released .pth checkpoints
(pytorch/train.py:195-198 load_state_dict semantics, including the
grad_update_block -> teacher head mapping) and (b) golden parity tests that run
the reference torch model and this framework side by side on the same weights.

Layout notes:
- torch conv weight [out, in, kh, kw] -> flax [kh, kw, in, out];
- correlation-lookup channel order is identical between the torch reference and
  this framework (both enumerate the (2r+1)^2 window x-offset-major), so no
  input-channel permutation is needed for convc1;
- torch InstanceNorm2d(affine=False, track_running_stats=False) maps to the
  parameter-free instance_norm here; BatchNorm2d maps scale/bias + running
  mean/var into flax's params/batch_stats split.
"""
from __future__ import annotations

from typing import Mapping

import numpy as np


def _k(w) -> np.ndarray:
    return np.asarray(w).transpose(2, 3, 1, 0)


def _conv(sd: Mapping, name: str) -> dict:
    return {
        "Conv_0": {"kernel": _k(sd[name + ".weight"]), "bias": np.asarray(sd[name + ".bias"])}
    }


def _bn(sd: Mapping, name: str):
    params = {
        "BatchNorm_0": {
            "scale": np.asarray(sd[name + ".weight"]),
            "bias": np.asarray(sd[name + ".bias"]),
        }
    }
    stats = {
        "BatchNorm_0": {
            "mean": np.asarray(sd[name + ".running_mean"]),
            "var": np.asarray(sd[name + ".running_var"]),
        }
    }
    return params, stats


def _encoder(sd: Mapping, prefix: str, batch_norm: bool):
    """BasicEncoder params (+ batch_stats when batch_norm)."""
    p: dict = {"ExtractorConv_0": _conv(sd, f"{prefix}.conv1")}
    stats: dict = {}
    if batch_norm:
        p["Norm_0"], stats["Norm_0"] = _bn(sd, f"{prefix}.norm1")

    block_i = 0
    for layer in (1, 2, 3):
        for sub in (0, 1):
            t = f"{prefix}.layer{layer}.{sub}"
            bp: dict = {
                "ExtractorConv_0": _conv(sd, f"{t}.conv1"),
                "ExtractorConv_1": _conv(sd, f"{t}.conv2"),
            }
            bs: dict = {}
            if batch_norm:
                bp["Norm_0"], bs["Norm_0"] = _bn(sd, f"{t}.norm1")
                bp["Norm_1"], bs["Norm_1"] = _bn(sd, f"{t}.norm2")
            if f"{t}.downsample.0.weight" in sd:
                bp["ExtractorConv_2"] = _conv(sd, f"{t}.downsample.0")
                if batch_norm:
                    bp["Norm_2"], bs["Norm_2"] = _bn(sd, f"{t}.downsample.1")
            p[f"ResidualBlock_{block_i}"] = bp
            if bs:
                stats[f"ResidualBlock_{block_i}"] = bs
            block_i += 1

    p["ExtractorConv_1"] = _conv(sd, f"{prefix}.conv2")
    return p, stats


def _update_conv(sd: Mapping, name: str) -> dict:
    return _conv(sd, name)


def _update_block(sd: Mapping, prefix: str, gma: bool = False) -> dict:
    p: dict = {
        "BasicMotionEncoder_0": {
            "UpdateConv_0": _update_conv(sd, f"{prefix}.encoder.convc1"),
            "UpdateConv_1": _update_conv(sd, f"{prefix}.encoder.convc2"),
            "UpdateConv_2": _update_conv(sd, f"{prefix}.encoder.convf1"),
            "UpdateConv_3": _update_conv(sd, f"{prefix}.encoder.convf2"),
            "UpdateConv_4": _update_conv(sd, f"{prefix}.encoder.conv"),
        },
        "SepConvGRU_0": {
            "UpdateConv_0": _update_conv(sd, f"{prefix}.gru.convz1"),
            "UpdateConv_1": _update_conv(sd, f"{prefix}.gru.convr1"),
            "UpdateConv_2": _update_conv(sd, f"{prefix}.gru.convq1"),
            "UpdateConv_3": _update_conv(sd, f"{prefix}.gru.convz2"),
            "UpdateConv_4": _update_conv(sd, f"{prefix}.gru.convr2"),
            "UpdateConv_5": _update_conv(sd, f"{prefix}.gru.convq2"),
        },
        "FlowHead_0": {
            "UpdateConv_0": _update_conv(sd, f"{prefix}.flow_head.conv1"),
            "UpdateConv_1": _update_conv(sd, f"{prefix}.flow_head.conv2"),
        },
        "UpdateConv_0": _update_conv(sd, f"{prefix}.mask.0"),
        "UpdateConv_1": _update_conv(sd, f"{prefix}.mask.2"),
    }
    if gma:
        agg: dict = {
            "Conv_0": {"kernel": _k(sd[f"{prefix}.aggregator.to_v.weight"])},
            "gamma": np.asarray(sd[f"{prefix}.aggregator.gamma"]),
        }
        if f"{prefix}.aggregator.project.weight" in sd:
            agg["Conv_1"] = {"kernel": _k(sd[f"{prefix}.aggregator.project.weight"])}
        p["Aggregate_0"] = agg
    return p


def convert_torch_raft(state_dict: Mapping, teacher: bool = False, gma: bool = False):
    """torch RAFT / L2L (+GMA) state_dict -> (params, batch_stats) pytrees.

    L2L checkpoints carry a 'grad_update_block' (the flow-supervisor teacher,
    pytorch/core/l2l.py) which maps to 'teacher_update_block' here.
    """
    sd = {k: v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
          for k, v in state_dict.items()}
    # strip DataParallel 'module.' prefixes (pytorch/train.py saves DP-wrapped)
    sd = {k[7:] if k.startswith("module.") else k: v for k, v in sd.items()}

    params: dict = {}
    stats: dict = {}
    params["fnet"], _ = _encoder(sd, "fnet", batch_norm=False)
    params["cnet"], cnet_stats = _encoder(sd, "cnet", batch_norm=True)
    stats["cnet"] = cnet_stats
    params["update_block"] = _update_block(sd, "update_block", gma=gma)
    if gma and "att.to_qk.weight" in sd:
        params["att"] = {"Conv_0": {"kernel": _k(sd["att.to_qk.weight"])}}
    if teacher:
        t_prefix = (
            "grad_update_block" if "grad_update_block.encoder.convc1.weight" in sd
            else "update_block"
        )
        params["teacher_update_block"] = _update_block(sd, t_prefix, gma=gma)
    return params, stats


def load_torch_checkpoint(path: str, teacher: bool = False, gma: bool = False):
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "model" in sd:
        sd = sd["model"]
    return convert_torch_raft(sd, teacher=teacher, gma=gma)
