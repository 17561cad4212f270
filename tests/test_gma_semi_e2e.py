"""End-to-end GMA flow-supervisor training on the flagship recipe's stage.

Drives the real train CLI with ``--model_type gma-semi --stage
semi-davis_unsup-ctskh`` (the reference's GMA DAVIS recipe,
pytorch/train_gma.py:345-356 + README.md:31-33) on the synthetic dataset tree,
at tiny shapes — proving the GMA semi path trains, checkpoints, and resumes.
"""
import json
import os
import sys

import numpy as np


def _run_train(ckpt_dir, num_steps, monkeypatch):
    argv = [
        "train.py", ckpt_dir,
        "--stage", "semi-davis_unsup-ctskh",
        "--model_type", "gma-semi",
        "--iters", "1",
        "--teacher_iters", "1",
        "--image_size", "32", "48",
        "--unsup_image_size", "32", "48",
        "--full_size", "40", "56",
        "--batch_size", "1",
        "--num_steps", str(num_steps),
        "--val_step", str(num_steps),
        "--val_max_records", "1",
        "--skip_validation_at_start", "true",
        "--lr", "1e-5",
        "--lr_schedule", "constant",
        "--compute_dtype", "float32",
        "--log_every", "1",
    ]
    monkeypatch.setattr(sys, "argv", argv)
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import train as train_cli

    train_cli.main()


def test_gma_semi_train_checkpoint_resume(fake_root, tmp_path, monkeypatch):
    from flow_supervisor_tpu.training import checkpoint as ckpt

    ckpt_dir = str(tmp_path / "gma_semi")
    _run_train(ckpt_dir, 2, monkeypatch)

    assert os.path.exists(os.path.join(ckpt_dir, "args.yaml"))
    assert ckpt.latest_step(ckpt_dir) == 2
    rows = [json.loads(l) for l in open(os.path.join(ckpt_dir, "metrics.jsonl"))]
    step_rows = [r for r in rows if "sup_loss" in r]
    assert len(step_rows) >= 2
    for r in step_rows:
        for key in ("sup_loss", "lfl_loss", "lfr_loss", "unsup_loss"):
            assert np.isfinite(r[key]), (key, r)

    # the saved config records the GMA model type (cargbox semantics)
    from flow_supervisor_tpu.config import ExperimentConfig

    saved = ExperimentConfig.load_yaml(ckpt_dir)
    assert saved.model.model_type == "gma-semi"

    # resume: 2 more steps on top of the restored checkpoint
    _run_train(ckpt_dir, 4, monkeypatch)
    assert ckpt.latest_step(ckpt_dir) == 4
    rows = [json.loads(l) for l in open(os.path.join(ckpt_dir, "metrics.jsonl"))]
    steps = [r["step"] for r in rows if "sup_loss" in r]
    assert max(steps) == 4 and 3 in steps  # continued from 2, not from scratch
