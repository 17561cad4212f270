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
    ev = Evaluator(model, variables, iters=1, use_teacher=True)
    res = ev.evaluate(_records(tmp_path, n=1), sparse=False)
    assert "teacher_epe" in res and "student_epe" in res
