import numpy as np
import pytest

from flow_supervisor_tpu.data.datasets import FlowRecord
from flow_supervisor_tpu.data.io import write_flo, write_flow_kitti
from flow_supervisor_tpu.evaluation import Evaluator
from flow_supervisor_tpu.models import RAFT, RAFTConfig


def _write_img(path, h, w, seed=0):
    import cv2

    rng = np.random.default_rng(seed)
    cv2.imwrite(path, rng.integers(0, 256, (h, w, 3)).astype(np.uint8))


@pytest.fixture(scope="module")
def model_and_vars():
    import jax
    import jax.numpy as jnp

    cfg = RAFTConfig(iters=2).resolved()
    model = RAFT(cfg)
    img = jnp.zeros((1, 64, 96, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img, img, train=False)
    return model, variables


def _records(tmp_path, n=2, h=61, w=93, sparse=False, scene="a"):
    recs = []
    for i in range(n):
        p1 = str(tmp_path / f"{scene}_{i}_1.png")
        p2 = str(tmp_path / f"{scene}_{i}_2.png")
        _write_img(p1, h, w, seed=i)
        _write_img(p2, h, w, seed=i + 50)
        rng = np.random.default_rng(i)
        flow = rng.normal(0, 1, (h, w, 2)).astype(np.float32)
        if sparse:
            fp = str(tmp_path / f"{scene}_{i}.png")
            write_flow_kitti(fp, flow)
        else:
            fp = str(tmp_path / f"{scene}_{i}.flo")
            write_flo(fp, flow)
        recs.append(FlowRecord((p1, p2), fp, sparse=sparse, extra=(scene, i)))
    return recs


def test_dense_eval_with_warm_start(tmp_path, model_and_vars):
    model, variables = model_and_vars
    ev = Evaluator(model, variables, iters=2)
    res = ev.evaluate(_records(tmp_path), sparse=False, warm_start=True)
    assert "student_epe" in res and np.isfinite(res["student_epe"])
    assert 0.0 <= res["student_epe_1px"] <= 1.0


def test_sparse_eval_fl_all(tmp_path, model_and_vars):
    model, variables = model_and_vars
    ev = Evaluator(model, variables, iters=2)
    res = ev.evaluate(_records(tmp_path, sparse=True), sparse=True)
    assert "student_fl" in res and 0.0 <= res["student_fl"] <= 1.0


def test_teacher_eval(tmp_path):
    import jax
    import jax.numpy as jnp

    cfg = RAFTConfig(iters=1, teacher=True, teacher_iters=1, freeze_bn=True).resolved()
    model = RAFT(cfg)
    img = jnp.zeros((1, 64, 96, 3), jnp.float32)
    orig = jnp.zeros((1, 64, 96, 3), jnp.float32)
    variables = model.init(
        jax.random.PRNGKey(0), img, img, orig, orig,
        jnp.zeros((1, 2), jnp.int32), train=False, method="semi_forward",
    )
    # teacher-bearing models score student AND teacher with NO flag
    # (reference util/validate.py:154-166 arity dispatch)
    ev = Evaluator(model, variables, iters=1)
    assert ev.use_teacher
    res = ev.evaluate(_records(tmp_path, n=1), sparse=False)
    assert "teacher_epe" in res and "student_epe" in res
    assert res["pairs_per_sec"] > 0


def test_pad_bucket_bounds_shapes(tmp_path, model_and_vars):
    # pad_bucket=64 maps multiple native sizes onto one padded shape
    model, variables = model_and_vars
    ev = Evaluator(model, variables, iters=1, pad_bucket=64)
    recs = _records(tmp_path, n=1, h=61, w=93) + _records(
        tmp_path, n=1, h=58, w=90, scene="b"
    )
    res = ev.evaluate(recs, sparse=False)
    assert np.isfinite(res["student_epe"])


def test_make_train_validator_runs(tmp_path, monkeypatch, model_and_vars):
    # standing validation: sintel root exists -> validator runs and returns
    # per-dataset metrics (reference train.py:211-217)
    import importlib
    import jax

    from flow_supervisor_tpu.config import ExperimentConfig, TrainCfg
    from flow_supervisor_tpu.data import paths

    root = tmp_path / "datasets"
    d = root / "Sintel/training/clean/alley_1"
    d.mkdir(parents=True)
    fd = root / "Sintel/training/flow/alley_1"
    fd.mkdir(parents=True)
    for i in range(3):
        _write_img(str(d / f"frame_{i:04d}.png"), 48, 64, seed=i)
    rng = np.random.default_rng(0)
    for i in range(2):
        write_flo(str(fd / f"frame_{i:04d}.flo"),
                  rng.normal(0, 1, (48, 64, 2)).astype(np.float32))

    monkeypatch.setenv("FST_DATA_ROOT", str(root))
    importlib.reload(paths)
    try:
        from flow_supervisor_tpu.evaluation import make_train_validator

        model, variables = model_and_vars
        cfg = ExperimentConfig(train=TrainCfg(stage="sintel", val_max_records=1))
        cfg.model.iters = 2
        # default policy: standing validation runs at the EVAL iters policy
        # (32 sintel / 24 otherwise, reference evaluate.py:166-174), NOT the
        # train iters
        policy_fn = make_train_validator(cfg, model)
        assert policy_fn is not None
        for name, ev in policy_fn.evaluators.items():
            assert ev.iters != cfg.model.iters
            assert ev.iters == (32 if name.startswith("sintel") else 24)

        # explicit override (kept small so the test actually runs the engine)
        cfg.train.val_iters = 2
        val_fn = make_train_validator(cfg, model)
        assert val_fn is not None
        assert all(ev.iters == 2 for ev in val_fn.evaluators.values())

        class S:  # minimal TrainState stand-in
            params = variables["params"]
            batch_stats = variables["batch_stats"]

        res = val_fn(0, S())
        assert "sintel_clean_student_epe" in res
        assert np.isfinite(res["sintel_clean_student_epe"])
    finally:
        importlib.reload(paths)
