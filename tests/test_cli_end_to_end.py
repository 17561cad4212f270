"""End-to-end CLI tests on synthetic miniature datasets.

Builds a fake FlyingChairs (for train.py --stage chairs) and a fake Sintel tree
(for evaluate.py) under a temp FST_DATA_ROOT, then drives the real CLI mains
in-process.
"""
import json
import os
import sys

import numpy as np
import pytest


def _write_ppm(path, h, w, seed):
    import cv2

    rng = np.random.default_rng(seed)
    cv2.imwrite(path, rng.integers(0, 256, (h, w, 3)).astype(np.uint8))


@pytest.fixture()
def fake_chairs(tmp_path, monkeypatch):
    from flow_supervisor_tpu.data.io import write_flo

    root = tmp_path / "datasets"
    base = root / "FlyingChairs/FlyingChairs_release/data"
    base.mkdir(parents=True)
    split = root / "FlyingChairs/FlyingChairs_train_val.txt"
    lines = []
    rng = np.random.default_rng(0)
    for i in range(1, 5):
        _write_ppm(str(base / ("%05d_img1.ppm" % i)), 96, 128, seed=i)
        _write_ppm(str(base / ("%05d_img2.ppm" % i)), 96, 128, seed=i + 10)
        write_flo(
            str(base / ("%05d_flow.flo" % i)),
            rng.normal(0, 2, (96, 128, 2)).astype(np.float32),
        )
        lines.append("1" if i <= 3 else "2")
    split.write_text("\n".join(lines) + "\n")

    monkeypatch.setenv("FST_DATA_ROOT", str(root))
    # paths module caches at import; reload it
    import importlib
    from flow_supervisor_tpu.data import paths

    importlib.reload(paths)
    yield root
    importlib.reload(paths)


def test_train_cli_end_to_end(fake_chairs, tmp_path, monkeypatch, capsys):
    ckpt_dir = str(tmp_path / "run")
    argv = [
        "train.py", ckpt_dir,
        "--stage", "chairs",
        "--iters", "1",
        "--image_size", "64", "96",
        "--batch_size", "2",
        "--num_steps", "2",
        "--val_step", "2",
        "--lr", "1e-4",
        "--lr_schedule", "constant",
        "--compute_dtype", "float32",
        "--log_every", "1",
    ]
    monkeypatch.setattr(sys, "argv", argv)
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import train as train_cli

    train_cli.main()
    assert os.path.exists(os.path.join(ckpt_dir, "args.yaml"))
    assert os.path.exists(os.path.join(ckpt_dir, "metrics.jsonl"))
    rows = [json.loads(l) for l in open(os.path.join(ckpt_dir, "metrics.jsonl"))]
    assert any("loss" in r for r in rows)

    from flow_supervisor_tpu.training import checkpoint as ckpt

    assert ckpt.latest_step(ckpt_dir) == 2

    # evaluate on the fake chairs val split using the saved config + ckpt
    argv = ["evaluate.py", ckpt_dir, "--dataset", "chairs", "--eval_iters", "1"]
    monkeypatch.setattr(sys, "argv", argv)
    import evaluate as eval_cli

    eval_cli.main()
    out = capsys.readouterr().out
    payload = json.loads(out[out.index("{"):])
    assert "student_epe" in payload and np.isfinite(payload["student_epe"])

    # extract_flow on a tiny frame dir with the same ckpt (reference
    # extract_flow.py:118-156: pairwise inference -> .flo + HSV png)
    frames = tmp_path / "frames"
    outdir = tmp_path / "extract"
    frames.mkdir()
    for i in range(3):
        _write_ppm(str(frames / f"frame_{i:04d}.png"), 64, 96, seed=50 + i)
    argv = [
        "extract_flow.py", ckpt_dir,
        "--source_dirs", str(frames),
        "--target_dirs", str(outdir),
        "--eval_iters", "1",
    ]
    monkeypatch.setattr(sys, "argv", argv)
    import extract_flow as extract_cli

    extract_cli.main()
    from flow_supervisor_tpu.data.io import read_flo

    flos = sorted((outdir / "flo").iterdir())
    pngs = sorted((outdir / "vis").iterdir())
    assert len(flos) == 2 and len(pngs) == 2  # 3 frames -> 2 pairs
    flow = read_flo(str(flos[0]))
    assert flow.shape == (64, 96, 2) and np.isfinite(flow).all()
