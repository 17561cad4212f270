import os

from flow_supervisor_tpu.config import (
    ExperimentConfig,
    ModelCfg,
    TrainCfg,
    build_argparser,
    config_from_args,
)


def test_yaml_roundtrip(tmp_path):
    cfg = ExperimentConfig(
        model=ModelCfg(model_type="raft-semi", teacher_iters=3),
        train=TrainCfg(stage="things", image_size=(400, 720), lr=1.25e-4),
        ckpt_dir=str(tmp_path / "run"),
    )
    path = cfg.save_yaml()
    back = ExperimentConfig.load_yaml(path)
    assert back.model.model_type == "raft-semi"
    assert back.model.teacher_iters == 3
    assert back.train.image_size == (400, 720)
    assert back.train.lr == 1.25e-4


def test_maybe_restore_prefers_saved(tmp_path):
    ckpt_dir = str(tmp_path / "run")
    first = ExperimentConfig(
        train=TrainCfg(stage="chairs", lr=4e-4), ckpt_dir=ckpt_dir
    )
    ExperimentConfig.maybe_restore(ckpt_dir, first)
    # a later invocation with different args restores the saved config
    # (evaluate.py:76-79 semantics)
    second = ExperimentConfig(train=TrainCfg(stage="things", lr=1e-5))
    restored = ExperimentConfig.maybe_restore(ckpt_dir, second)
    assert restored.train.stage == "chairs"
    assert restored.train.lr == 4e-4


def test_maybe_restore_explicit_overrides(tmp_path):
    # CargBox maybe_restore(update=True): flags passed on THIS command line
    # override the restored YAML (e.g. extending --num_steps on resume)
    from flow_supervisor_tpu.config import explicit_cli_fields

    ckpt_dir = str(tmp_path / "run")
    first = ExperimentConfig(
        train=TrainCfg(stage="chairs", num_steps=2), ckpt_dir=ckpt_dir
    )
    ExperimentConfig.maybe_restore(ckpt_dir, first)

    argv = [ckpt_dir, "--num_steps", "4", "--max_step", "4"]
    explicit = explicit_cli_fields(argv[1:])
    assert "num_steps" in explicit  # both spellings normalize to the field
    second = ExperimentConfig(train=TrainCfg(stage="things", num_steps=4))
    restored = ExperimentConfig.maybe_restore(ckpt_dir, second, explicit=explicit)
    assert restored.train.num_steps == 4  # overridden
    assert restored.train.stage == "chairs"  # not passed -> restored value


def test_reference_flag_aliases():
    p = build_argparser()
    args = p.parse_args(
        [
            "ckpts/x", "--stage", "things", "--max_step", "100000",
            "--learning_rate", "0.000125", "--sup_image_size", "400", "720",
            "--main_loss", "l1", "--smurf_occlusion", "brox",
        ]
    )
    cfg = config_from_args(args)
    assert cfg.train.num_steps == 100000
    assert cfg.train.lr == 0.000125
    assert cfg.train.image_size == (400, 720)
    assert cfg.train.loss_type == "l1"
    assert cfg.model.occlusion == "brox"


def test_native_flag_spellings_still_work():
    p = build_argparser()
    args = p.parse_args(["ckpts/x", "--num_steps", "5", "--lr", "0.001"])
    cfg = config_from_args(args)
    assert cfg.train.num_steps == 5 and cfg.train.lr == 0.001


def test_lookup_backend_plumbs_to_model():
    import jax.numpy as jnp

    from flow_supervisor_tpu.training.loop import build_model

    p = build_argparser()
    args = p.parse_args(
        ["ckpts/x", "--lookup_backend", "plane", "--scan_iters", "true",
         "--corr_dtype", "bfloat16"]
    )
    cfg = config_from_args(args)
    model = build_model(cfg)
    assert model.cfg.lookup_backend == "plane"
    assert model.cfg.scan_iters is True
    assert model.cfg.corr_dtype == jnp.bfloat16
    # defaults preserve prior behavior: auto backend, f32 volume, unrolled
    dflt = build_model(ExperimentConfig())
    assert dflt.cfg.lookup_backend in ("einsum", "fused")
    assert dflt.cfg.corr_dtype == jnp.float32
    assert dflt.cfg.scan_iters is False
