"""Checkpoint management (orbax) + cross-model weight surgery.

Replaces the reference's tf.train.CheckpointManager flow (train.py:177-209,
util/callback.py): checkpoints keyed by step, resume-from-latest, pretrained
initialization, and the weight transplants:

- ``initialize_teacher_net``: copy the student update block into the teacher head
  (reference semi.py:554-557).
- ``initialize_from_baseline``: fnet/cnet/update_block transplant
  (reference unsup.py:251-257).

The reference's ``ckpt_cleaner`` (optimizer-free '-weights' twin produced in a
subprocess) is unnecessary here: params and optimizer state are separate pytrees,
so "clean" restore = restoring params only.
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


def _manager(ckpt_dir: str, max_to_keep: Optional[int] = None) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(ckpt_dir),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
    )


def save_checkpoint(ckpt_dir: str, step: int, params, batch_stats, opt_state=None):
    mgr = _manager(ckpt_dir)
    payload = {"params": params, "batch_stats": batch_stats}
    if opt_state is not None:
        payload["opt_state"] = opt_state
    mgr.save(step, args=ocp.args.StandardSave(payload))
    mgr.wait_until_finished()
    mgr.close()


def latest_step(ckpt_dir: str) -> Optional[int]:
    if not os.path.isdir(ckpt_dir):
        return None
    mgr = _manager(ckpt_dir)
    step = mgr.latest_step()
    mgr.close()
    return step


def restore_checkpoint(
    ckpt_dir: str,
    step: Optional[int] = None,
    template: Optional[Any] = None,
) -> Optional[dict]:
    """Restore {'params', 'batch_stats'[, 'opt_state']}; None if absent.

    With a template pytree the restore enforces/casts to its structure; restoring
    params-only from a full checkpoint (pretrained init) just drops opt_state.
    """
    mgr = _manager(ckpt_dir)
    step = mgr.latest_step() if step is None else step
    if step is None:
        mgr.close()
        return None
    if template is None:
        out = mgr.restore(step)
    else:
        out = mgr.restore(step, args=ocp.args.StandardRestore(template))
    mgr.close()
    return out


def _deep_copy(tree):
    import jax.numpy as jnp

    # materialize NEW buffers: aliased leaves across the pytree break buffer
    # donation in the jitted train step (same buffer donated twice)
    return jax.tree_util.tree_map(lambda x: jnp.array(x), tree)


def initialize_teacher_net(params: dict) -> dict:
    """Copy student update-block weights into the teacher head."""
    assert "update_block" in params, sorted(params)
    new = dict(params)
    new["teacher_update_block"] = _deep_copy(params["update_block"])
    return new


def initialize_from_baseline(params: dict, baseline_params: dict) -> dict:
    """Transplant fnet/cnet/update_block from a baseline checkpoint."""
    new = dict(params)
    for k in ("fnet", "cnet", "update_block"):
        if k in baseline_params:
            new[k] = _deep_copy(baseline_params[k])
    return new
