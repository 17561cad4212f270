"""Space-axis sharded forward (parallel/spatial.py) vs single-device oracle.

Runs on the 8-virtual-CPU-device mesh from conftest; the sharded forward must
match the unsharded one to fp-reassociation tolerance (the cross-shard norm
all-reduces change the reduction order)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from flow_supervisor_tpu.models import RAFT, RAFTConfig
from flow_supervisor_tpu.parallel.spatial import make_space_mesh, spatial_forward


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs virtual device mesh")
def test_spatial_forward_matches_single_device():
    space = 4
    mesh = make_space_mesh(space)
    cfg = RAFTConfig(iters=2, lookup_backend="einsum").resolved()
    model = RAFT(cfg)

    rng = np.random.default_rng(0)
    h, w = 8 * space * 2, 96  # H divisible by 8*space
    img1 = jnp.asarray(rng.uniform(0, 1, (1, h, w, 3)), jnp.float32)
    img2 = jnp.asarray(rng.uniform(0, 1, (1, h, w, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img1, img2, train=False)

    ref = model.apply(variables, img1, img2, train=False)["flow_up"][-1]
    fwd = spatial_forward(model, mesh)
    got = fwd(variables, img1, img2)

    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs virtual device mesh")
def test_evaluator_space_parallel_matches_single(tmp_path):
    import cv2
    from flow_supervisor_tpu.data.datasets import FlowRecord
    from flow_supervisor_tpu.data.io import write_flo
    from flow_supervisor_tpu.evaluation import Evaluator

    rng = np.random.default_rng(1)
    paths = []
    for i in range(2):
        p = str(tmp_path / f"f{i}.png")
        cv2.imwrite(p, rng.integers(0, 256, (50, 64, 3)).astype(np.uint8))
        paths.append(p)
    fp = str(tmp_path / "f.flo")
    write_flo(fp, rng.normal(0, 1, (50, 64, 2)).astype(np.float32))
    recs = [FlowRecord(images=(paths[0], paths[1]), flow=fp)]

    cfg = RAFTConfig(iters=1, lookup_backend="einsum").resolved()
    model = RAFT(cfg)
    img = jnp.zeros((1, 50, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img, img, train=False)

    base = Evaluator(model, variables, iters=1).evaluate(recs)
    spc = Evaluator(model, variables, iters=1, space_parallel=4).evaluate(recs)
    # padding differs (H aligned to 32 vs 8) so the metrics match loosely
    assert abs(base["student_epe"] - spc["student_epe"]) < 0.15


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs virtual device mesh")
def test_spatial_forward_rejects_unaligned_height():
    space = 4
    mesh = make_space_mesh(space)
    model = RAFT(RAFTConfig(iters=1, lookup_backend="einsum").resolved())
    img = jnp.zeros((1, 40, 64, 3), jnp.float32)  # 40 % 32 != 0
    variables = model.init(jax.random.PRNGKey(0), img, img, train=False)
    fwd = spatial_forward(model, mesh)
    with pytest.raises(AssertionError):
        fwd(variables, img, img)
