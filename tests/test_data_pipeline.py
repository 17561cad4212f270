import os

import numpy as np
import pytest

from flow_supervisor_tpu.data.augment import (
    ColorJitter,
    FlowAugmentor,
    SparseFlowAugmentor,
    UnsupAugmentor,
)
from flow_supervisor_tpu.data.datasets import FlowRecord, backward, frames_directory
from flow_supervisor_tpu.data.io import write_flo
from flow_supervisor_tpu.data.pipeline import (
    Prefetcher,
    SupervisedPipeline,
    UnsupPipeline,
    load_record,
    semi_zip,
)


def _write_img(path, h, w, seed=0):
    import cv2

    rng = np.random.default_rng(seed)
    img = (rng.uniform(0, 255, (h, w, 3))).astype(np.uint8)
    cv2.imwrite(path, img)


@pytest.fixture()
def tiny_dataset(tmp_path):
    records = []
    for i in range(4):
        p1 = str(tmp_path / f"{i}_a.png")
        p2 = str(tmp_path / f"{i}_b.png")
        _write_img(p1, 128, 160, seed=i)
        _write_img(p2, 128, 160, seed=i + 100)
        fp = str(tmp_path / f"{i}.flo")
        rng = np.random.default_rng(i)
        write_flo(fp, rng.normal(0, 3, (128, 160, 2)).astype(np.float32))
        records.append(FlowRecord((p1, p2), fp))
    return records


def test_color_jitter_bounds():
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (16, 16, 3)).astype(np.float32)
    cj = ColorJitter(0.4, 0.4, 0.4, 0.16)
    out = cj(img, rng)
    assert out.shape == img.shape and np.isfinite(out).all()


def test_color_jitter_matches_numpy_hsv_oracle():
    # the production path rides cv2's SIMD HSV; the numpy formulation is the
    # readable oracle it must match
    from flow_supervisor_tpu.data.augment import _hsv_to_rgb, _rgb_to_hsv

    rng = np.random.default_rng(3)
    img = rng.uniform(0, 1, (40, 56, 3)).astype(np.float32)
    cj = ColorJitter(0.4, 0.4, 0.4, 0.16)
    got = cj(img, np.random.default_rng(7))

    r = np.random.default_rng(7)
    b = r.uniform(0.6, 1.4)
    c = r.uniform(0.6, 1.4)
    mean = img.reshape(-1, 3).mean(axis=0)
    im = img * np.float32(b * c) + (mean * (b * (1.0 - c))).astype(np.float32)
    s = r.uniform(0.6, 1.4)
    d = r.uniform(-0.16, 0.16)
    hsv = _rgb_to_hsv(np.clip(im, 0, 1))
    hsv[..., 1] = np.clip(hsv[..., 1] * s, 0, 1)
    hsv[..., 0] = (hsv[..., 0] + d) % 1.0
    ref = _hsv_to_rgb(hsv)
    np.testing.assert_allclose(got, ref, atol=2e-6)


def test_dense_augmentor_output_shapes():
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (100, 120, 3)).astype(np.float32)
    flow = rng.normal(0, 2, (100, 120, 2)).astype(np.float32)
    aug = FlowAugmentor((64, 96), min_scale=-0.2, max_scale=0.5)
    for _ in range(5):
        i1, i2, f = aug(img, img, flow, rng)
        assert i1.shape == (64, 96, 3) and f.shape == (64, 96, 2)
        assert i1.min() >= 0.0 and i1.max() <= 1.0


def test_sparse_augmentor_keeps_valid():
    rng = np.random.default_rng(1)
    img = rng.uniform(0, 1, (100, 120, 3)).astype(np.float32)
    flow = rng.normal(0, 2, (100, 120, 2)).astype(np.float32)
    valid = (rng.uniform(0, 1, (100, 120, 1)) > 0.5).astype(np.float32)
    aug = SparseFlowAugmentor((64, 96))
    i1, i2, f, v = aug(img, img, flow, valid, rng)
    assert v.shape == (64, 96, 1)
    assert set(np.unique(v)).issubset({0.0, 1.0})


def test_unsup_augmentor_contract():
    rng = np.random.default_rng(2)
    img = rng.uniform(0, 1, (140, 180, 3)).astype(np.float32)
    flow = np.zeros((140, 180, 2), np.float32)
    valid = np.zeros((140, 180, 1), np.float32)
    aug = UnsupAugmentor((64, 96), min_scale=-0.2, max_scale=0.5,
                         full_size=(96, 128))
    for _ in range(5):
        out = aug(img, img, flow, valid, rng)
        assert out["image1"].shape == (64, 96, 3)
        assert out["orig_image1"].shape == (96, 128, 3)
        y0, x0 = out["crop_yx"]
        assert y0 % 8 == 0 and x0 % 8 == 0
        assert y0 + 64 <= 96 and x0 + 96 <= 128
        # the unaugmented crop of the full frame equals the pre-color crop —
        # check the flow crop consistency instead (no color applied to flow)
        np.testing.assert_allclose(
            out["flow"], out["orig_flow"][y0 : y0 + 64, x0 : x0 + 96]
        )


def test_supervised_pipeline_batches(tiny_dataset):
    pipe = SupervisedPipeline(
        tiny_dataset, (64, 96), min_scale=-0.2, max_scale=0.5, do_flip=True,
        batch_size=2,
    )
    it = iter(pipe)
    b = next(it)
    assert b["image1"].shape == (2, 64, 96, 3)
    assert b["flow"].shape == (2, 64, 96, 2)
    assert b["valid"].shape == (2, 64, 96, 1)


def test_semi_zip_and_prefetch(tiny_dataset):
    sup = UnsupPipeline(
        tiny_dataset, (64, 96), min_scale=-0.2, max_scale=0.5, do_flip=True,
        batch_size=1, full_size=(96, 128),
    )
    unsup = UnsupPipeline(
        [FlowRecord(r.images) for r in tiny_dataset], (64, 96),
        min_scale=-0.2, max_scale=0.5, do_flip=True, batch_size=1,
        full_size=(96, 128),
    )
    it = Prefetcher(semi_zip(iter(unsup), iter(sup)), depth=2)
    sup_b, unsup_b = next(it)
    assert sup_b["flow"].shape == (1, 64, 96, 2)
    assert unsup_b["orig_image1"].shape == (1, 96, 128, 3)
    assert (unsup_b["valid"] == 0).all()  # unlabeled: dummy zero valid


def test_frames_directory_and_backward(tmp_path):
    for i in range(3):
        _write_img(str(tmp_path / f"f{i:03d}.png"), 32, 32, seed=i)
    recs = frames_directory(str(tmp_path))
    assert len(recs) == 2
    back = backward(recs)
    assert back[0].images == tuple(reversed(recs[0].images))


def test_load_record_unlabeled_dummy(tmp_path):
    p1, p2 = str(tmp_path / "a.png"), str(tmp_path / "b.png")
    _write_img(p1, 40, 50)
    _write_img(p2, 40, 50)
    img1, img2, flow, valid = load_record(FlowRecord((p1, p2)))
    assert flow.shape == (40, 50, 2) and (flow == 0).all()
    assert (valid == 0).all()


def test_random_rotation_flow_aware():
    from flow_supervisor_tpu.data.augment import random_rotation

    rng = np.random.default_rng(5)
    img = rng.uniform(0, 1, (64, 64, 3)).astype(np.float32)
    flow = np.zeros((64, 64, 2), np.float32)
    flow[..., 0] = 4.0  # uniform +4 px in x
    mask = np.ones((64, 64, 1), np.float32)
    (img1r,), flow_r, mask_r = random_rotation([img], flow, mask, 10.0, rng)
    assert img1r.shape == img.shape and flow_r.shape == flow.shape
    # vector magnitude preserved under rotation (interior pixels)
    mags = np.linalg.norm(flow_r[20:44, 20:44], axis=-1)
    valid = mask_r[20:44, 20:44, 0] > 0
    np.testing.assert_allclose(mags[valid], 4.0, atol=0.2)
