import os

import numpy as np

from flow_supervisor_tpu.data.io import (
    read_flo,
    read_flow_any,
    read_flow_kitti,
    read_pfm,
    write_flo,
    write_flow_kitti,
)
from flow_supervisor_tpu.utils.viz import flow_to_rgb_wheel, visualize_flow
from flow_supervisor_tpu.utils.warm_start import forward_interpolate


def test_flo_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    flow = rng.normal(0, 5, (7, 9, 2)).astype(np.float32)
    p = str(tmp_path / "a.flo")
    write_flo(p, flow)
    back = read_flo(p)
    np.testing.assert_array_equal(back, flow)
    # byte-exact header: magic + w + h
    raw = open(p, "rb").read()
    assert np.frombuffer(raw[:4], np.float32)[0] == np.float32(202021.25)
    assert np.frombuffer(raw[4:12], np.int32).tolist() == [9, 7]


def test_kitti_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    flow = (rng.normal(0, 5, (6, 8, 2)) * 64).round() / 64  # representable
    p = str(tmp_path / "k.png")
    write_flow_kitti(p, flow.astype(np.float32))
    back, valid = read_flow_kitti(p)
    np.testing.assert_allclose(back, flow, atol=1 / 64)
    assert valid.min() == 1.0


def test_pfm_read(tmp_path):
    data = np.arange(12, dtype="<f4").reshape(3, 4)
    p = str(tmp_path / "x.pfm")
    with open(p, "wb") as f:
        f.write(b"Pf\n4 3\n-1.0\n")
        data.tofile(f)
    out = read_pfm(p)
    np.testing.assert_array_equal(out, np.flipud(data))
    flow, valid = read_flow_any(p)
    assert valid is None


def test_visualizers():
    flow = np.zeros((8, 8, 2), np.float32)
    flow[..., 0] = 3.0
    rgb = visualize_flow(flow)
    assert rgb.shape == (8, 8, 3) and rgb.max() <= 1.0 and rgb.min() >= 0.0
    wheel = flow_to_rgb_wheel(flow)
    assert wheel.dtype == np.uint8 and wheel.shape == (8, 8, 3)


def test_forward_interpolate_shifts():
    flow = np.zeros((6, 6, 2), np.float32)
    flow[..., 0] = 2.0  # everything moves +2 in x
    out = forward_interpolate(flow)
    assert out.shape == (6, 6, 2)
    # splatted flow should still be ~2 in x where defined
    np.testing.assert_allclose(out[2, 4], [2.0, 0.0], atol=1e-5)
