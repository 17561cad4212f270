"""Device mesh and sharding helpers.

The reference's only parallelism is single-host data parallelism
(tf.distribute.MirroredStrategy / torch DataParallel — SURVEY.md §2.5). The
TPU-native equivalent: one jitted train step over a ``jax.sharding.Mesh`` with the
batch sharded on a 'data' axis and parameters replicated; XLA inserts the gradient
all-reduce over ICI. A second 'space' axis is reserved for spatially sharding the
correlation volume's source-pixel axis at large resolution (SURVEY.md §5
long-context analog).
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPACE_AXIS = "space"
DCN_AXIS = "dcn"
ICI_AXIS = "ici"


def make_mesh(n_devices: Optional[int] = None, space: int = 1) -> Mesh:
    devices = jax.devices()
    n = len(devices) if (n_devices is None or n_devices < 0) else n_devices
    assert n % space == 0, (n, space)
    arr = np.asarray(devices[:n]).reshape(n // space, space)
    return Mesh(arr, (DATA_AXIS, SPACE_AXIS))


def make_pod_mesh(dcn: int, ici: Optional[int] = None) -> Mesh:
    """Pod-scale data-parallel mesh: a slow DCN axis over pod slices times a
    fast ICI axis within each slice. The batch is sharded over BOTH axes;
    XLA lowers the gradient all-reduce hierarchically (reduce over ICI inside
    each slice, then the small cross-slice exchange over DCN) — the TPU
    equivalent of multi-host MirroredStrategy, which the reference never had
    (single host only, train.py:63-78).

    Uses ``jax.experimental.mesh_utils.create_hybrid_device_mesh`` on real
    multi-slice hardware so the ICI axis maps onto physically-linked chips;
    falls back to a plain reshape for virtual/CPU device sets.
    """
    devices = jax.devices()
    if ici is None:
        assert len(devices) % dcn == 0, (len(devices), dcn)
        ici = len(devices) // dcn
    n = dcn * ici
    assert len(devices) >= n, (len(devices), n)
    arr = _hybrid_mesh_array(devices[:n], dcn, ici)
    return Mesh(arr, (DCN_AXIS, ICI_AXIS))


def _hybrid_mesh_array(devices, dcn: int, ici: int) -> np.ndarray:
    """[dcn, ici] device array; ICI axis maps to physically-linked chips on
    real multi-slice hardware, plain reshape otherwise.

    ``create_hybrid_device_mesh`` returns shape ``mesh_shape * dcn_mesh_shape``
    elementwise, so the per-slice mesh must be (1, ici) and the cross-slice
    mesh (dcn, 1) to land on (dcn, ici)."""
    try:
        from jax.experimental import mesh_utils

        arr = np.asarray(
            mesh_utils.create_hybrid_device_mesh(
                (1, ici), (dcn, 1), devices=devices
            )
        ).reshape(dcn, ici)
    except Exception:
        arr = np.asarray(devices).reshape(dcn, ici)
    return arr


def is_pod_mesh(mesh: Mesh) -> bool:
    return DCN_AXIS in mesh.axis_names


def auto_data_parallel(batch_size: int, n_devices: Optional[int] = None) -> int:
    """Largest device count <= available that divides the global batch (the
    reference instead errors when batch % replicas != 0, train.py:111-114)."""
    avail = len(jax.devices()) if (n_devices is None or n_devices < 0) else n_devices
    n = min(avail, batch_size)
    while n > 1 and batch_size % n != 0:
        n -= 1
    return max(n, 1)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    if is_pod_mesh(mesh):
        return NamedSharding(mesh, P((DCN_AXIS, ICI_AXIS)))
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Place a host batch onto the mesh, sharded over the data axis."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
