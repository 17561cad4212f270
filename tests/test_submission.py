import os

import numpy as np
import pytest

from flow_supervisor_tpu.evaluation import Evaluator
from flow_supervisor_tpu.models import RAFT, RAFTConfig


def _write_img(path, h, w, seed=0):
    import cv2

    rng = np.random.default_rng(seed)
    cv2.imwrite(path, rng.integers(0, 256, (h, w, 3)).astype(np.uint8))


@pytest.fixture()
def fake_benchmarks(tmp_path, monkeypatch):
    root = tmp_path / "datasets"
    # Sintel test split: two scenes x 2 frames, clean+final
    for dstype in ("clean", "final"):
        for scene in ("sc_a", "sc_b"):
            d = root / "Sintel/test" / dstype / scene
            d.mkdir(parents=True)
            for i in range(2):
                _write_img(str(d / f"frame_{i:04d}.png"), 64, 96, seed=i)
    # KITTI test split
    k = root / "KITTI/data_scene_flow/testing/image_2"
    k.mkdir(parents=True)
    for i in range(2):
        _write_img(str(k / f"{i:06d}_10.png"), 64, 96, seed=i)
        _write_img(str(k / f"{i:06d}_11.png"), 64, 96, seed=i + 9)

    monkeypatch.setenv("FST_DATA_ROOT", str(root))
    import importlib
    from flow_supervisor_tpu.data import paths

    importlib.reload(paths)
    yield root
    importlib.reload(paths)


def test_submission_writers(fake_benchmarks, tmp_path):
    import jax
    import jax.numpy as jnp

    from flow_supervisor_tpu.submission import (
        create_kitti_submission,
        create_sintel_submission,
    )
    from flow_supervisor_tpu.data.io import read_flo, read_flow_kitti

    model = RAFT(RAFTConfig(iters=1).resolved())
    img = jnp.zeros((1, 64, 96, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img, img, train=False)
    ev = Evaluator(model, variables, iters=1)

    out_s = str(tmp_path / "sintel_sub")
    create_sintel_submission(ev, out_s, warm_start=True)
    flo = read_flo(os.path.join(out_s, "clean", "sc_a", "frame0001.flo"))
    assert flo.shape == (64, 96, 2)

    out_k = str(tmp_path / "kitti_sub")
    create_kitti_submission(ev, out_k)
    flow, valid = read_flow_kitti(os.path.join(out_k, "000000_10.png"))
    assert flow.shape == (64, 96, 2) and valid.min() == 1.0
