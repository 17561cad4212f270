import os

import numpy as np
import jax.numpy as jnp
import pytest

from flow_supervisor_tpu.config import ExperimentConfig, ModelCfg, TrainCfg
from flow_supervisor_tpu.training import checkpoint as ckpt
from flow_supervisor_tpu.training.loop import train


def _synthetic_iter(b=2, h=32, w=48, seed=0):
    rng = np.random.default_rng(seed)
    while True:
        yield {
            "image1": rng.uniform(0, 1, (b, h, w, 3)).astype(np.float32),
            "image2": rng.uniform(0, 1, (b, h, w, 3)).astype(np.float32),
            "flow": rng.normal(0, 2, (b, h, w, 2)).astype(np.float32),
            "valid": np.ones((b, h, w, 1), np.float32),
        }


@pytest.fixture()
def cfg(tmp_path):
    return ExperimentConfig(
        model=ModelCfg(model_type="raft-baseline", iters=1, compute_dtype="float32"),
        train=TrainCfg(
            stage="chairs",
            batch_size=2,
            image_size=(32, 48),
            num_steps=4,
            val_step=2,
            lr=1e-4,
            lr_schedule="constant",
            log_every=2,
        ),
        ckpt_dir=str(tmp_path / "run"),
    )


def test_train_loop_checkpoints_and_resumes(cfg):
    vals = []

    def validate(step, state):
        vals.append(step)
        return {"epe": 1.0}

    state = train(cfg, _synthetic_iter(), validate_fn=validate)
    assert int(state.step) == 4
    # at-start validation (reference train.py:38) + every val_step
    assert vals == [0, 2, 4]
    assert ckpt.latest_step(cfg.ckpt_dir) == 4
    assert os.path.exists(os.path.join(cfg.ckpt_dir, "args.yaml"))
    assert os.path.exists(os.path.join(cfg.ckpt_dir, "metrics.jsonl"))

    # resume: extend to 6 steps; restores from step 4
    cfg.train.num_steps = 6
    state2 = train(cfg, _synthetic_iter(), validate_fn=None)
    assert int(state2.step) == 6


def test_pretrained_init_and_teacher_transplant(cfg, tmp_path):
    state = train(cfg, _synthetic_iter())
    # semi run initialized from the baseline checkpoint
    semi_cfg = ExperimentConfig(
        model=ModelCfg(
            model_type="raft-semi", iters=1, teacher_iters=1,
            compute_dtype="float32", unsup_weight=0.0,
        ),
        train=TrainCfg(
            stage="semi-x-y", batch_size=1, image_size=(32, 48),
            full_size=(48, 64), num_steps=1, val_step=1, lr=1e-5,
            lr_schedule="constant", pretrained_ckpt=cfg.ckpt_dir, freeze_bn=True,
        ),
        ckpt_dir=str(tmp_path / "semi"),
    )

    def semi_iter():
        rng = np.random.default_rng(1)
        while True:
            sup = {
                "image1": rng.uniform(0, 1, (1, 32, 48, 3)).astype(np.float32),
                "image2": rng.uniform(0, 1, (1, 32, 48, 3)).astype(np.float32),
                "orig_image1": rng.uniform(0, 1, (1, 48, 64, 3)).astype(np.float32),
                "orig_image2": rng.uniform(0, 1, (1, 48, 64, 3)).astype(np.float32),
                "crop_yx": np.asarray([[8, 8]], np.int32),
                "flow": rng.normal(0, 1, (1, 32, 48, 2)).astype(np.float32),
                "valid": np.ones((1, 32, 48, 1), np.float32),
            }
            yield sup, dict(sup)

    semi_state = train(semi_cfg, semi_iter())
    # teacher head transplanted from the student update block at init
    pre = ckpt.restore_checkpoint(cfg.ckpt_dir)
    a = pre["params"]["update_block"]["FlowHead_0"]["UpdateConv_0"]["Conv_0"]["kernel"]
    assert "teacher_update_block" in semi_state.params
