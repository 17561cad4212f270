import numpy as np
import jax
import jax.numpy as jnp
import pytest

from flow_supervisor_tpu.config import TrainCfg
from flow_supervisor_tpu.models import RAFT, RAFTConfig
from flow_supervisor_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from flow_supervisor_tpu.training.baseline import make_train_step
from flow_supervisor_tpu.training.optim import make_optimizer
from flow_supervisor_tpu.training.schedules import build_schedules, one_cycle, smurf
from flow_supervisor_tpu.training.state import TrainState


def test_schedules_shapes():
    sched = one_cycle(4e-4, 1000, pct_start=0.05)
    np.testing.assert_allclose(float(sched(0)), 4e-4 / 25, rtol=1e-5)
    np.testing.assert_allclose(float(sched(50)), 4e-4, rtol=1e-5)
    np.testing.assert_allclose(float(sched(1000)), 4e-4 / 25 / 1e4, rtol=1e-5)
    s2 = smurf(1e-5, 1e-8, 1000, 0.8)
    np.testing.assert_allclose(float(s2(799)), 1e-5, rtol=1e-6)
    np.testing.assert_allclose(float(s2(1000)), 1e-8, rtol=1e-4)
    lr_fn, wd_fn = build_schedules(TrainCfg(lr=1e-4, weight_decay=1e-4, num_steps=100))
    assert float(wd_fn(50)) < float(lr_fn(50))


def _batch(b=2, h=48, w=64):
    rng = np.random.default_rng(0)
    return {
        "image1": jnp.asarray(rng.uniform(0, 1, (b, h, w, 3)), jnp.float32),
        "image2": jnp.asarray(rng.uniform(0, 1, (b, h, w, 3)), jnp.float32),
        "flow": jnp.asarray(rng.normal(0, 2, (b, h, w, 2)), jnp.float32),
        "valid": jnp.ones((b, h, w, 1), jnp.float32),
    }


def test_train_step_runs_and_descends():
    cfg = RAFTConfig(iters=2).resolved()
    model = RAFT(cfg)
    batch = _batch()
    variables = model.init(
        jax.random.PRNGKey(0), batch["image1"], batch["image2"], train=True
    )
    tx = make_optimizer(TrainCfg(lr=1e-3, num_steps=100, lr_schedule="constant"))
    state = TrainState.create(variables["params"], variables["batch_stats"], tx)
    step = make_train_step(model, loss_type="l1", donate=False)
    state1, m1 = step(state, batch)
    cur = state1
    # Adam overshoots in the first few steps at this lr; give it room before
    # requiring descent on the fixed batch.
    for _ in range(9):
        cur, m_last = step(cur, batch)
    state3, m3 = cur, m_last
    assert int(state3.step) == 10
    assert np.isfinite(m1["loss"]) and np.isfinite(m3["epe"])
    assert float(m3["loss"]) < float(m1["loss"])  # same batch -> should descend
    # batch stats actually updated (cnet batch norm)
    diff = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), state.batch_stats, state3.batch_stats
    )
    assert max(jax.tree_util.tree_leaves(diff)) > 0


def test_data_parallel_mesh_step():
    assert len(jax.devices()) == 8, "conftest must provide 8 CPU devices"
    mesh = make_mesh()
    cfg = RAFTConfig(iters=1).resolved()
    model = RAFT(cfg)
    batch = _batch(b=8, h=32, w=32)
    variables = model.init(
        jax.random.PRNGKey(0), batch["image1"][:1], batch["image2"][:1], train=True
    )
    tx = make_optimizer(TrainCfg(lr=1e-4, num_steps=100, lr_schedule="constant"))
    state = TrainState.create(variables["params"], variables["batch_stats"], tx)
    with jax.set_mesh(mesh):
        state = replicate(state, mesh)
        sharded = shard_batch(batch, mesh)
        step = make_train_step(model, donate=False)
        new_state, metrics = step(state, sharded)
    assert np.isfinite(float(metrics["loss"]))
    # grads were all-reduced: params stay fully replicated across the mesh
    leaf = jax.tree_util.tree_leaves(new_state.params)[0]
    assert leaf.sharding.is_fully_replicated
