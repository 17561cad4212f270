"""Stage registry tests on synthetic dataset trees."""
import os

import numpy as np
import pytest


def _img(path, h=48, w=64, seed=0):
    import cv2

    rng = np.random.default_rng(seed)
    cv2.imwrite(str(path), rng.integers(0, 256, (h, w, 3)).astype(np.uint8))


@pytest.fixture()
def fake_root(tmp_path, monkeypatch):
    from flow_supervisor_tpu.data.io import write_flo, write_flow_kitti

    root = tmp_path / "datasets"
    rng = np.random.default_rng(0)

    # sintel training: 1 scene, 3 frames, clean+final + flow
    for dstype in ("clean", "final"):
        d = root / "Sintel/training" / dstype / "alley_1"
        d.mkdir(parents=True)
        for i in range(3):
            _img(d / f"frame_{i:04d}.png", seed=i)
    fd = root / "Sintel/training/flow/alley_1"
    fd.mkdir(parents=True)
    for i in range(2):
        write_flo(str(fd / f"frame_{i:04d}.flo"),
                  rng.normal(0, 1, (48, 64, 2)).astype(np.float32))
    # sintel test (for sintel_unsup_test)
    for dstype in ("clean", "final"):
        d = root / "Sintel/test" / dstype / "wall"
        d.mkdir(parents=True)
        for i in range(3):
            _img(d / f"frame_{i:04d}.png", seed=i + 7)

    # things: one dir pair
    for pas in ("frames_cleanpass", "frames_finalpass"):
        d = root / "FlyingThings" / pas / "TRAIN/A/0000/left"
        d.mkdir(parents=True)
        for i in range(3):
            _img(d / f"{i:04d}.png", seed=i)
    for direction in ("into_future", "into_past"):
        d = root / "FlyingThings/optical_flow/TRAIN/A/0000" / direction / "left"
        d.mkdir(parents=True)
        for i in range(3):
            data = rng.normal(0, 1, (48, 64, 3)).astype("<f4")
            with open(d / f"{i:04d}.pfm", "wb") as f:
                f.write(b"PF\n64 48\n-1.0\n")
                data.tofile(f)

    # kitti 2015 train + multiview test
    k = root / "KITTI/data_scene_flow/training"
    (k / "image_2").mkdir(parents=True)
    (k / "flow_occ").mkdir(parents=True)
    for i in range(2):
        _img(k / "image_2" / f"{i:06d}_10.png", seed=i)
        _img(k / "image_2" / f"{i:06d}_11.png", seed=i + 5)
        write_flow_kitti(str(k / "flow_occ" / f"{i:06d}_10.png"),
                         rng.normal(0, 1, (48, 64, 2)).astype(np.float32))
    mv = root / "KITTI/data_scene_flow_multiview/testing/image_2"
    mv.mkdir(parents=True)
    for i in range(3):
        _img(mv / f"000000_{i:02d}.png", seed=i)

    # hd1k
    (root / "HD1K/hd1k_input/image_2").mkdir(parents=True)
    (root / "HD1K/hd1k_flow_gt/flow_occ").mkdir(parents=True)
    for i in range(2):
        _img(root / "HD1K/hd1k_input/image_2" / f"000000_{i:04d}.png", seed=i)
        write_flow_kitti(
            str(root / "HD1K/hd1k_flow_gt/flow_occ" / f"000000_{i:04d}.png"),
            rng.normal(0, 1, (48, 64, 2)).astype(np.float32),
        )

    # davis
    dv = root / "DAVIS/JPEGImages/480p/bear"
    dv.mkdir(parents=True)
    for i in range(3):
        _img(dv / f"{i:05d}.jpg", seed=i)

    monkeypatch.setenv("FST_DATA_ROOT", str(root))
    import importlib
    from flow_supervisor_tpu.data import paths

    importlib.reload(paths)
    yield root
    importlib.reload(paths)


def test_stage_registry(fake_root):
    from flow_supervisor_tpu.data.pipeline import stage_records

    things, _ = stage_records("things")
    assert len(things) == 2 * 2 * 2  # 2 passes x 2 directions x 2 pairs

    sintel_unsup, _ = stage_records("sintel_unsup_test")
    # clean+final x (2 pairs + 1 interval) x fwd+bwd
    assert len(sintel_unsup) == 2 * 3 * 2

    kitti_mv, _ = stage_records("kitti_unsup_test")
    assert len(kitti_mv) > 0
    assert all(r.canonical_size == (375, 1242) for r in kitti_mv)

    ctskh, _ = stage_records("ctskh")
    # 4 things + 2*100 sintel clean + 2*100 final... -> dominated by sintel
    assert len(ctskh) == 4 + 2 * 2 * 100 + 2 * 200 + 1 * 5

    davis, _ = stage_records("davis_unsup")
    assert len(davis) == 2 * 2  # 2 pairs x fwd+bwd
    assert all(r.flow is None for r in davis)


def test_kitti2015_and_labeled_train(fake_root):
    from flow_supervisor_tpu.data.pipeline import stage_records

    k, _ = stage_records("kitti2015_unsup")
    assert len(k) == 2 and all(r.sparse for r in k)
    s, _ = stage_records("sintel_unsup_labeled_train")
    assert len(s) == 2 * 2 * 2  # clean+final x 2 pairs x fwd+bwd


def test_semi_fetch_dataloader_end_to_end(fake_root):
    from flow_supervisor_tpu.config import TrainCfg
    from flow_supervisor_tpu.data.pipeline import fetch_dataloader

    cfg = TrainCfg(
        stage="semi-sintel_unsup_test-things_unsup",
        batch_size=1,
        image_size=(32, 48),
        unsup_image_size=(32, 48),
        full_size=(40, 56),
        seed=7,
    )
    it = fetch_dataloader(cfg)
    sup_b, unsup_b = next(it)
    assert sup_b["image1"].shape == (1, 32, 48, 3)
    assert sup_b["orig_image1"].shape == (1, 40, 56, 3)
    assert sup_b["flow"].shape == (1, 32, 48, 2)
    assert unsup_b["crop_yx"].shape == (1, 2)
    assert (unsup_b["crop_yx"] % 8 == 0).all()
    # unlabeled stream: dummy zero flow/valid
    assert (unsup_b["valid"] == 0).all()


def test_multiframe_pipeline(fake_root):
    from flow_supervisor_tpu.data.datasets import sintel_multiframe
    from flow_supervisor_tpu.data.pipeline import MultiFramePipeline

    recs = sintel_multiframe(training=True, dstype="clean")
    assert recs and len(recs[0].images) == 3
    pipe = MultiFramePipeline(recs, (32, 48), min_scale=-0.2, max_scale=0.5,
                              do_flip=True, batch_size=1)
    b = next(iter(pipe))
    assert b["image1"].shape == (1, 32, 48, 3)
    assert b["image3"].shape == (1, 32, 48, 3)
    assert b["flow1"].shape == (1, 32, 48, 2)
    assert b["valid2"].shape == (1, 32, 48, 1)
