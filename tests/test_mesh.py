"""Mesh construction tests, incl. the hybrid (multi-slice) pod-mesh branch.

The hybrid branch of ``make_pod_mesh`` only activates on devices carrying a
``slice_index`` attribute (real multi-slice TPU); CPU test devices take the
fallback reshape. These tests fake sliced devices so the hybrid call signature
— which must yield a (dcn, ici) array, not the 1-D elementwise product — is
covered without hardware (reference had no multi-host story at all,
SURVEY.md §2.5).
"""
import numpy as np
import pytest

from flow_supervisor_tpu.parallel.mesh import (
    DATA_AXIS,
    DCN_AXIS,
    ICI_AXIS,
    _hybrid_mesh_array,
    auto_data_parallel,
    make_mesh,
    make_pod_mesh,
)


class _FakeSlicedDevice:
    """Minimal device stand-in carrying slice_index for hybrid-mesh grouping."""

    def __init__(self, i: int, slice_index: int):
        self.id = i
        self.slice_index = slice_index
        self.process_index = 0
        self.platform = "cpu"
        self.device_kind = "fake"

    def __repr__(self):
        return f"FakeDev(id={self.id}, slice={self.slice_index})"


def test_hybrid_mesh_array_shape_and_slice_grouping():
    # Interleave slices in the input order so a plain reshape fallback would
    # mix slices within a row — proving the hybrid branch actually ran.
    devs = [_FakeSlicedDevice(i, i % 2) for i in range(8)]
    arr = _hybrid_mesh_array(devs, dcn=2, ici=4)
    assert arr.shape == (2, 4)
    for row in arr:
        slices = {d.slice_index for d in row}
        assert len(slices) == 1, f"ICI row spans slices: {row}"
    assert {arr[0, 0].slice_index, arr[1, 0].slice_index} == {0, 1}


def test_hybrid_mesh_array_fallback_without_slice_index():
    class Bare:
        pass

    devs = [Bare() for _ in range(8)]
    arr = _hybrid_mesh_array(devs, dcn=2, ici=4)
    assert arr.shape == (2, 4)


def test_make_pod_mesh_cpu_devices():
    mesh = make_pod_mesh(2, 4)
    assert mesh.axis_names == (DCN_AXIS, ICI_AXIS)
    assert mesh.devices.shape == (2, 4)


def test_make_pod_mesh_infers_ici():
    mesh = make_pod_mesh(2)
    assert mesh.devices.shape == (2, 4)


def test_make_mesh_flat():
    mesh = make_mesh(8)
    assert mesh.devices.shape == (8, 1)
    assert mesh.axis_names[0] == DATA_AXIS


def test_auto_data_parallel():
    assert auto_data_parallel(6, 8) == 6
    assert auto_data_parallel(7, 8) == 7
    assert auto_data_parallel(9, 8) == 3
    assert auto_data_parallel(1, 8) == 1
