"""Synthetic miniature dataset tree: every catalog this framework knows
(Sintel train/test, FlyingThings, KITTI 2015 + multiview, HD1K, DAVIS) at toy
sizes. Used by the test suite (tests/conftest.py fake_root) and the multi-chip
dryrun to exercise the real data pipeline without real datasets — the
reference has no equivalent (its only correctness harness was validation on
real data, SURVEY.md §4).
"""
from __future__ import annotations

from pathlib import Path

import numpy as np


def _img(path, h=48, w=64, seed=0):
    import cv2

    rng = np.random.default_rng(seed)
    cv2.imwrite(str(path), rng.integers(0, 256, (h, w, 3)).astype(np.uint8))


def build_synthetic_tree(root) -> None:
    """Populate ``root`` with tiny Sintel/Things/KITTI/HD1K/DAVIS trees whose
    layouts match the real catalogs (data/datasets.py)."""
    from flow_supervisor_tpu.data.io import write_flo, write_flow_kitti

    root = Path(root)
    rng = np.random.default_rng(0)

    # sintel training: 1 scene, 3 frames, clean+final + flow
    for dstype in ("clean", "final"):
        d = root / "Sintel/training" / dstype / "alley_1"
        d.mkdir(parents=True, exist_ok=True)
        for i in range(3):
            _img(d / f"frame_{i:04d}.png", seed=i)
    fd = root / "Sintel/training/flow/alley_1"
    fd.mkdir(parents=True, exist_ok=True)
    for i in range(2):
        write_flo(str(fd / f"frame_{i:04d}.flo"),
                  rng.normal(0, 1, (48, 64, 2)).astype(np.float32))
    # sintel test (for sintel_unsup_test)
    for dstype in ("clean", "final"):
        d = root / "Sintel/test" / dstype / "wall"
        d.mkdir(parents=True, exist_ok=True)
        for i in range(3):
            _img(d / f"frame_{i:04d}.png", seed=i + 7)

    # things: one dir pair
    for pas in ("frames_cleanpass", "frames_finalpass"):
        d = root / "FlyingThings" / pas / "TRAIN/A/0000/left"
        d.mkdir(parents=True, exist_ok=True)
        for i in range(3):
            _img(d / f"{i:04d}.png", seed=i)
    for direction in ("into_future", "into_past"):
        d = root / "FlyingThings/optical_flow/TRAIN/A/0000" / direction / "left"
        d.mkdir(parents=True, exist_ok=True)
        for i in range(3):
            data = rng.normal(0, 1, (48, 64, 3)).astype("<f4")
            with open(d / f"{i:04d}.pfm", "wb") as f:
                f.write(b"PF\n64 48\n-1.0\n")
                data.tofile(f)

    # kitti 2015 train + multiview test
    k = root / "KITTI/data_scene_flow/training"
    (k / "image_2").mkdir(parents=True, exist_ok=True)
    (k / "flow_occ").mkdir(parents=True, exist_ok=True)
    for i in range(2):
        _img(k / "image_2" / f"{i:06d}_10.png", seed=i)
        _img(k / "image_2" / f"{i:06d}_11.png", seed=i + 5)
        write_flow_kitti(str(k / "flow_occ" / f"{i:06d}_10.png"),
                         rng.normal(0, 1, (48, 64, 2)).astype(np.float32))
    mv = root / "KITTI/data_scene_flow_multiview/testing/image_2"
    mv.mkdir(parents=True, exist_ok=True)
    for i in range(3):
        _img(mv / f"000000_{i:02d}.png", seed=i)

    # hd1k
    (root / "HD1K/hd1k_input/image_2").mkdir(parents=True, exist_ok=True)
    (root / "HD1K/hd1k_flow_gt/flow_occ").mkdir(parents=True, exist_ok=True)
    for i in range(2):
        _img(root / "HD1K/hd1k_input/image_2" / f"000000_{i:04d}.png", seed=i)
        write_flow_kitti(
            str(root / "HD1K/hd1k_flow_gt/flow_occ" / f"000000_{i:04d}.png"),
            rng.normal(0, 1, (48, 64, 2)).astype(np.float32),
        )

    # davis
    dv = root / "DAVIS/JPEGImages/480p/bear"
    dv.mkdir(parents=True, exist_ok=True)
    for i in range(3):
        _img(dv / f"{i:05d}.jpg", seed=i)
