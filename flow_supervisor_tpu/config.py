"""Experiment configuration with save-beside-checkpoint YAML semantics.

Replaces the reference's cargbox + python-box config stack (SURVEY.md §5): every
model class contributes flags (``get_argparse`` chain raft/__init__.py:178 ->
baseline.py:116 -> unsup.py:259 -> semi.py:539), and the parsed config is saved
as YAML next to the checkpoint dir so evaluate/extract reconstruct the exact
training config (train.py:80-87, evaluate.py:76-79).

Here: one flat dataclass per concern, composed into ``ExperimentConfig``;
``save_yaml`` / ``load_yaml`` / ``maybe_restore`` give the same persistence
semantics without an external dependency.
"""
from __future__ import annotations

import dataclasses
import os
from argparse import ArgumentParser
from typing import Any, Optional

import yaml

CONFIG_FILENAME = "args.yaml"


@dataclasses.dataclass
class ModelCfg:
    model_type: str = "raft-baseline"  # raft-baseline | raft-unsup | raft-semi | gma-*
    small: bool = False
    iters: int = 12
    dropout: float = 0.0
    corr_levels: int = 4
    corr_radius: int = 4
    # semi / flow-supervisor (reference semi.py:539-552)
    teacher_iters: int = 12
    sup_weight: float = 1.0
    unsup_weight: float = 1.0
    lfr_weight: float = 1.0
    lfl_weight: float = 1.0
    sup_label_loss_weight: float = 1.0
    teacher_smurf_weight: float = 0.0
    lfl_loss_decay_rate: float = 0.8
    lfr_loss_type: str = "l2"  # reference default (semi.py:549); recipes use robust
    # Reference-exact L_fr reduction: the reference builds lfr_loss_fn with
    # Reduction.NONE (semi.py:29-34), so unsup_loss is a [B,H,W] TENSOR and
    # tape.gradient of a non-scalar target implicitly sums over pixels —
    # the unsup branch's gradient is a pixel-SUM (x B*H*W vs the sup
    # branch's pixel-mean), which per-variable clipnorm then renormalizes.
    # True reproduces that (the released checkpoints were trained with it);
    # False uses the pixel-mean the paper's equations suggest.
    lfr_sum_reduction: bool = True
    stop_teacher_gradient: bool = True
    # unsupervised loss weights; defaults match the reference argparse
    # (unsup.py:268-274: smooth1 2.5, smooth2 0.0, selfsup 0.3, wang)
    census_weight: float = 1.0
    smooth1_weight: float = 2.5
    smooth2_weight: float = 0.0
    selfsup_weight: float = 0.3
    occlusion: str = "wang"  # wang | brox | none
    unsup_loss_decay_rate: float = 0.8
    teacher_smurf_loss: bool = False
    use_bw: bool = True
    # GMA variant (reference pytorch/train_gma.py:345-356)
    num_heads: int = 1
    position_only: bool = False
    position_and_content: bool = False
    # precision
    compute_dtype: str = "bfloat16"  # bfloat16 | float32
    corr_dtype: str = "float32"  # correlation volume storage dtype
    # correlation-lookup backend: auto | fused | plane | pallas | einsum
    # (auto = fused on TPU, einsum elsewhere; see models/raft.py RAFTConfig)
    lookup_backend: str = "auto"
    # lax.scan over refinement iterations: 12x smaller HLO, far faster
    # compiles (mandatory for pallas backends through remote-compile relays)
    scan_iters: bool = False


@dataclasses.dataclass
class TrainCfg:
    stage: str = "chairs"
    batch_size: int = 8
    image_size: tuple[int, int] = (368, 496)
    unsup_image_size: tuple[int, int] = (368, 768)
    # static full-image frame for semi/unsup. None = auto: the stage's native
    # floor-multiple-of-8 size (data/pipeline.py FULL_SIZE_DEFAULTS), so the
    # augmentor's upscale-if-smaller policy never engages — measured to shift
    # the census loss floor ~+23% at upscale factor 1.33
    # (tools/exp_full_size_policy.py; docs/PARITY.md)
    full_size: Optional[tuple[int, int]] = None
    lr: float = 4e-4
    lr_schedule: str = "onecycle"  # onecycle | exponential | smurf | constant
    lr_decay_steps: int = 25000
    lr_decay_rate: float = 0.5
    min_lr: float = 1e-8
    weight_decay: float = 1e-4
    clip_norm: float = 1.0
    num_steps: int = 100000
    val_step: int = 5000
    val_max_records: int = 0  # cap records per standing-validation set (0 = all)
    # standing-validation policy: the reference validates with the same engine
    # used for final eval (util/validate.py:17-132), whose iters policy is
    # 32 sintel / 24 otherwise (evaluate.py:166-174). 0 = that auto policy;
    # >0 = fixed override. Deliberately NOT the train iters.
    val_iters: int = 0
    val_warm_start: bool = False  # warm-start within scenes during validation
    # pad bucket for sparse (KITTI) validation sets: rounds padded eval shapes
    # up so KITTI's several native sizes share jit entries (evaluation.py)
    val_pad_bucket: int = 64
    skip_validation_at_start: bool = False  # reference train.py:38
    freeze_bn: bool = False
    loss_type: str = "robust"
    loss_decay_rate: float = 0.8
    seed: int = 1234
    # flow-aware rotation augmentation (reference augmentor.py:54-55,116-117;
    # uflow random_rotation semantics, off by default there too)
    do_rotation: bool = False
    max_rotation: float = 10.0
    pretrained_ckpt: str = ""
    data_parallel: int = -1  # -1 = all local devices
    # pod-scale hierarchical DP: number of pod slices (DCN axis). 1 = single
    # slice (flat data mesh). >1 builds a (dcn, ici) mesh; batch shards over
    # both axes and the gradient all-reduce goes ICI-first (parallel/mesh.py).
    dcn_parallel: int = 1
    # data-loader worker processes per stream (0/1 = in-process; the serial
    # loader decodes+augments slower than the train step at recipe shapes)
    loader_workers: int = 4
    log_every: int = 100
    # profiler: dump a jax.profiler xplane trace of a few steady-state train
    # steps into this dir (SURVEY.md §5 observability; bench.py --trace is the
    # forward-only twin). Empty = off.
    trace_dir: str = ""
    trace_steps: int = 3


@dataclasses.dataclass
class ExperimentConfig:
    model: ModelCfg = dataclasses.field(default_factory=ModelCfg)
    train: TrainCfg = dataclasses.field(default_factory=TrainCfg)
    ckpt_dir: str = "ckpts/run"

    # ---- YAML persistence (cargbox semantics) ----

    def to_dict(self) -> dict[str, Any]:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "ExperimentConfig":
        model = ModelCfg(**d.get("model", {}))
        tr = d.get("train", {})
        for k in ("image_size", "unsup_image_size", "full_size"):
            if k in tr and tr[k] is not None:
                tr[k] = tuple(tr[k])
        train = TrainCfg(**tr)
        return cls(model=model, train=train, ckpt_dir=d.get("ckpt_dir", "ckpts/run"))

    def save_yaml(self, path: Optional[str] = None) -> str:
        path = path or os.path.join(self.ckpt_dir, CONFIG_FILENAME)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            yaml.safe_dump(self.to_dict(), f, sort_keys=False)
        return path

    @classmethod
    def load_yaml(cls, path: str) -> "ExperimentConfig":
        if os.path.isdir(path):
            path = os.path.join(path, CONFIG_FILENAME)
        with open(path) as f:
            return cls.from_dict(yaml.safe_load(f))

    @classmethod
    def maybe_restore(
        cls,
        ckpt_dir: str,
        fallback: "ExperimentConfig",
        explicit: Optional[set] = None,
    ) -> "ExperimentConfig":
        """Restore the saved config if one exists beside the checkpoints
        (evaluate.py:76-79 semantics), else persist and return the fallback.

        ``explicit`` = field names the user passed on THIS command line; those
        override the restored values (CargBox ``maybe_restore(update=True)``
        semantics, reference train.py:85-87) — e.g. resuming with a larger
        --num_steps extends the run instead of being ignored.
        """
        path = os.path.join(ckpt_dir, CONFIG_FILENAME)
        if os.path.exists(path):
            cfg = cls.load_yaml(path)
            cfg.ckpt_dir = ckpt_dir
            for name in explicit or ():
                for section, fb in ((cfg.model, fallback.model), (cfg.train, fallback.train)):
                    if hasattr(section, name):
                        setattr(section, name, getattr(fb, name))
            return cfg
        fallback.ckpt_dir = ckpt_dir
        fallback.save_yaml(path)
        return fallback


def _add_dataclass_args(parser: ArgumentParser, dc, prefix: str = "") -> None:
    for f in dataclasses.fields(dc):
        name = f"--{prefix}{f.name}"
        default = getattr(dc, f.name)
        if isinstance(default, bool):
            parser.add_argument(name, type=lambda s: s.lower() in ("1", "true", "yes"),
                                default=default)
        elif isinstance(default, tuple):
            parser.add_argument(name, type=int, nargs=len(default), default=list(default))
        elif default is None:
            # optional (h, w) pair (full_size): None = per-stage auto
            parser.add_argument(name, type=int, nargs=2, default=None)
        else:
            parser.add_argument(name, type=type(default), default=default)


# reference flag spellings -> our field names (usability parity with train.sh)
FLAG_ALIASES = {
    "--max_step": "num_steps",
    "--learning_rate": "lr",
    "--sup_image_size": "image_size",
    "--main_loss": "loss_type",
    "--smurf_occlusion": "occlusion",
    "--ckpt_path": "ckpt_dir",
}


def build_argparser(cfg: Optional[ExperimentConfig] = None) -> ArgumentParser:
    cfg = cfg or ExperimentConfig()
    p = ArgumentParser("flow_supervisor_tpu")
    p.add_argument("ckpt_dir", nargs="?", default=cfg.ckpt_dir)
    _add_dataclass_args(p, cfg.model)
    _add_dataclass_args(p, cfg.train)
    for alias, dest in FLAG_ALIASES.items():
        if dest == "ckpt_dir":
            continue
        default = getattr(cfg.train, dest, getattr(cfg.model, dest, None))
        if dest == "image_size":
            p.add_argument(alias, dest=dest + "_alias", type=int, nargs=2, default=None)
        elif isinstance(default, float):
            p.add_argument(alias, dest=dest + "_alias", type=float, default=None)
        elif isinstance(default, int):
            p.add_argument(alias, dest=dest + "_alias", type=int, default=None)
        else:
            p.add_argument(alias, dest=dest + "_alias", type=str, default=None)
    return p


def explicit_cli_fields(argv) -> set:
    """Field names explicitly passed on the command line (normalized through
    the reference-flag aliases) — used for CargBox update-on-restore."""
    names = set()
    for tok in argv:
        if tok.startswith("--"):
            name = tok[2:].split("=")[0]
            names.add(FLAG_ALIASES.get("--" + name, name))
    return names


def config_from_args(args) -> ExperimentConfig:
    d = dict(vars(args))
    for dest in set(FLAG_ALIASES.values()):
        v = d.pop(dest + "_alias", None)
        if v is not None:
            d[dest] = v
    model = {f.name: d[f.name] for f in dataclasses.fields(ModelCfg) if f.name in d}
    train = {f.name: d[f.name] for f in dataclasses.fields(TrainCfg) if f.name in d}
    for k in ("image_size", "unsup_image_size", "full_size"):
        if k in train and isinstance(train[k], list):
            train[k] = tuple(train[k])
    return ExperimentConfig(
        model=ModelCfg(**model), train=TrainCfg(**train), ckpt_dir=d["ckpt_dir"]
    )
