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


# ---- TensorFlow checkpoint converter ---------------------------------------
#
# The reference's RELEASED checkpoints are TF object-graph checkpoints
# (README.md:24-38) written as tf.train.Checkpoint(model=<RAFT subclass>)
# (train.py:177, ckpt_cleaner.py:59). Variable keys follow the Keras attribute
# graph, e.g.
#   model/fnet/conv1/kernel/.ATTRIBUTES/VARIABLE_VALUE
#   model/cnet/layer2/layer_with_weights-0/norm1/gamma/...
#   model/update_block/gru/convz1/bias/...
#   model/teacher_update_block/...                       (semi checkpoints)
# (attribute structure: raft_extractor.py:266-343 BasicEncoder with
# tf.keras.Sequential layers -> 'layer_with_weights-N'; raft_update.py:180-212
# BasicUpdateBlock; semi.py:15-25 teacher head; upsample layers have no
# variables). TF conv kernels are already [kh, kw, in, out] -- no transpose.

_TF_SUFFIX = "/.ATTRIBUTES/VARIABLE_VALUE"


class _TFVars:
    """Normalized view over a TF checkpoint reader: 'model/' + attribute path
    (no .ATTRIBUTES suffix) -> tensor."""

    def __init__(self, reader):
        self.reader = reader
        self.index = {}
        for full, _ in reader.get_variable_to_shape_map().items():
            if not full.endswith(_TF_SUFFIX):
                continue
            norm = full[: -len(_TF_SUFFIX)]
            if norm.startswith("model/"):
                norm = norm[len("model/"):]
            elif norm.split("/")[0] in ("optimizer", "save_counter", "step"):
                continue
            self.index[norm] = full

    def __contains__(self, key):
        return key in self.index

    def get(self, *alternatives) -> np.ndarray:
        for a in alternatives:
            if a in self.index:
                return np.asarray(self.reader.get_tensor(self.index[a]))
        raise KeyError(f"none of {alternatives} in TF checkpoint")


def _tf_conv(v: _TFVars, *names) -> dict:
    return {
        "Conv_0": {
            "kernel": v.get(*[n + "/kernel" for n in names]),
            "bias": v.get(*[n + "/bias" for n in names]),
        }
    }


def _tf_bn(v: _TFVars, *names):
    params = {
        "BatchNorm_0": {
            "scale": v.get(*[n + "/gamma" for n in names]),
            "bias": v.get(*[n + "/beta" for n in names]),
        }
    }
    stats = {
        "BatchNorm_0": {
            "mean": v.get(*[n + "/moving_mean" for n in names]),
            "var": v.get(*[n + "/moving_variance" for n in names]),
        }
    }
    return params, stats


def _tf_encoder(v: _TFVars, prefix: str, batch_norm: bool):
    p: dict = {"ExtractorConv_0": _tf_conv(v, f"{prefix}/conv1")}
    stats: dict = {}
    if batch_norm:
        p["Norm_0"], stats["Norm_0"] = _tf_bn(v, f"{prefix}/norm1")

    block_i = 0
    for layer in (1, 2, 3):
        for sub in (0, 1):
            # Sequential-tracked ResidualBlocks (raft_extractor.py:319-326)
            t = f"{prefix}/layer{layer}/layer_with_weights-{sub}"
            t_alt = f"{prefix}/layer{layer}/layer-{sub}"
            bp: dict = {
                "ExtractorConv_0": _tf_conv(v, f"{t}/conv1", f"{t_alt}/conv1"),
                "ExtractorConv_1": _tf_conv(v, f"{t}/conv2", f"{t_alt}/conv2"),
            }
            bs: dict = {}
            if batch_norm:
                bp["Norm_0"], bs["Norm_0"] = _tf_bn(
                    v, f"{t}/norm1", f"{t_alt}/norm1"
                )
                bp["Norm_1"], bs["Norm_1"] = _tf_bn(
                    v, f"{t}/norm2", f"{t_alt}/norm2"
                )
            # strided blocks have a downsample Sequential([conv, norm3])
            ds = f"{t}/downsample/layer_with_weights-0"
            ds_alts = (ds, f"{t}/downsample/layer-0", f"{t_alt}/downsample/layer_with_weights-0")
            if any(a + "/kernel" in v for a in ds_alts):
                bp["ExtractorConv_2"] = _tf_conv(v, *ds_alts)
                if batch_norm:
                    # norm3 is tracked both as an attribute and inside the
                    # Sequential; accept whichever path the writer canonicalized
                    bp["Norm_2"], bs["Norm_2"] = _tf_bn(
                        v,
                        f"{t}/norm3",
                        f"{t}/downsample/layer_with_weights-1",
                        f"{t_alt}/norm3",
                        f"{t}/downsample/layer-1",
                    )
            p[f"ResidualBlock_{block_i}"] = bp
            if bs:
                stats[f"ResidualBlock_{block_i}"] = bs
            block_i += 1

    p["ExtractorConv_1"] = _tf_conv(v, f"{prefix}/conv2")
    return p, stats


def _tf_update_conv(v: _TFVars, *names) -> dict:
    return _tf_conv(v, *names)


def _tf_update_block(v: _TFVars, prefix: str) -> dict:
    p: dict = {
        "BasicMotionEncoder_0": {
            "UpdateConv_0": _tf_update_conv(v, f"{prefix}/encoder/convc1"),
            "UpdateConv_1": _tf_update_conv(v, f"{prefix}/encoder/convc2"),
            "UpdateConv_2": _tf_update_conv(v, f"{prefix}/encoder/convf1"),
            "UpdateConv_3": _tf_update_conv(v, f"{prefix}/encoder/convf2"),
            "UpdateConv_4": _tf_update_conv(v, f"{prefix}/encoder/conv"),
        },
        "SepConvGRU_0": {
            "UpdateConv_0": _tf_update_conv(v, f"{prefix}/gru/convz1"),
            "UpdateConv_1": _tf_update_conv(v, f"{prefix}/gru/convr1"),
            "UpdateConv_2": _tf_update_conv(v, f"{prefix}/gru/convq1"),
            "UpdateConv_3": _tf_update_conv(v, f"{prefix}/gru/convz2"),
            "UpdateConv_4": _tf_update_conv(v, f"{prefix}/gru/convr2"),
            "UpdateConv_5": _tf_update_conv(v, f"{prefix}/gru/convq2"),
        },
        "FlowHead_0": {
            "UpdateConv_0": _tf_update_conv(v, f"{prefix}/flow_head/conv1"),
            "UpdateConv_1": _tf_update_conv(v, f"{prefix}/flow_head/conv2"),
        },
        # mask head Sequential([conv 3x3, relu, conv 1x1]) raft_update.py:190-194
        "UpdateConv_0": _tf_update_conv(
            v, f"{prefix}/mask/layer_with_weights-0", f"{prefix}/mask/layer-0"
        ),
        "UpdateConv_1": _tf_update_conv(
            v, f"{prefix}/mask/layer_with_weights-1", f"{prefix}/mask/layer-2"
        ),
    }
    return p


def convert_tf_checkpoint(reader, teacher: bool | None = None):
    """TF object-graph checkpoint reader -> (params, batch_stats) pytrees.

    teacher=None auto-detects the flow-supervisor head
    (model/teacher_update_block/..., semi.py:22-25)."""
    v = _TFVars(reader)
    if teacher is None:
        teacher = "teacher_update_block/encoder/convc1/kernel" in v

    params: dict = {}
    stats: dict = {}
    params["fnet"], _ = _tf_encoder(v, "fnet", batch_norm=False)
    params["cnet"], cnet_stats = _tf_encoder(v, "cnet", batch_norm=True)
    stats["cnet"] = cnet_stats
    params["update_block"] = _tf_update_block(v, "update_block")
    if teacher:
        params["teacher_update_block"] = _tf_update_block(v, "teacher_update_block")
    return params, stats


def load_tf_checkpoint(path: str, teacher: bool | None = None):
    """Load a reference TF checkpoint (ckpt-NNN or ckpt-NNN-weights prefix)."""
    import tensorflow as tf

    reader = tf.train.load_checkpoint(path)
    return convert_tf_checkpoint(reader, teacher=teacher)
