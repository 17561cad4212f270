"""Spatial (space-axis) sharding of the RAFT forward for multi-chip eval.

The correlation volume [B, h1, w1, h2, w2] is the memory wall (SURVEY §2.5):
448x1024 already costs ~205 MB fp32 per pair, and >1080p inference per-chip is
HBM-bound. The reference has no answer (single-GPU eval only,
``evaluate.py:67-70``). TPU-native answer: shard the image H axis — and with
it the /8 query grid h1 and the volume's query rows — across the mesh's
``space`` axis and let XLA SPMD insert the collectives:

- encoder convs on the H-sharded image exchange halos automatically;
- instance/group-norm spatial means become cross-shard all-reduces;
- ``fmap1 . fmap2^T`` all-gathers fmap2 (the small side) and leaves the
  volume sharded over query rows — each chip holds [B, h1/n, w1, h2, w2];
- the window lookup, update GRU, and convex upsampling are row-local apart
  from conv halos.

Works with the einsum lookup backend (pure XLA ops shard transparently; the
pallas kernel would need an explicit shard_map wrapper, so ``spatial_forward``
forces ``lookup_backend='einsum'``). Result is bitwise-identical to the
single-device forward up to fp reassociation in the cross-shard norm
reductions.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from flow_supervisor_tpu.parallel.mesh import SPACE_AXIS, make_mesh


def make_space_mesh(space: Optional[int] = None) -> Mesh:
    """1 x space mesh over the local devices (data axis unused)."""
    n = space or len(jax.devices())
    return make_mesh(n_devices=n, space=n)


def spatial_forward(model, mesh: Mesh, train: bool = False):
    """A jitted ``(variables, image1, image2) -> flow`` with the image H axis
    sharded over ``mesh``'s space axis and a replicated output.

    The input H must be a multiple of 8 * mesh.shape[SPACE_AXIS] (the eval
    padding already rounds to a bucket; pass ``pad_bucket=8*n``).
    """
    n_space = mesh.shape[SPACE_AXIS]
    if (
        getattr(model.cfg, "lookup_backend", "einsum") != "einsum"
        or getattr(model.cfg, "fused_norm", False)
    ):
        # pure-XLA ops only: pallas custom-calls don't shard under SPMD, and
        # the fused instance norm's spatial mean must become a cross-device
        # collective (the XLA reduce gets one inserted automatically)
        model = type(model)(
            dataclasses.replace(
                model.cfg, lookup_backend="einsum", fused_norm=False
            )
        )

    img_sharding = NamedSharding(mesh, P(None, SPACE_AXIS, None, None))
    repl = NamedSharding(mesh, P())

    @jax.jit
    def forward(variables, image1, image2):
        image1 = jax.lax.with_sharding_constraint(image1, img_sharding)
        image2 = jax.lax.with_sharding_constraint(image2, img_sharding)
        out = model.apply(variables, image1, image2, train=train,
                          final_flow_only=True)
        flow = out["flow_up"][-1]
        return jax.lax.with_sharding_constraint(flow, repl)

    def run(variables, image1, image2):
        h = image1.shape[1]
        assert h % (8 * n_space) == 0, (
            f"H={h} must be a multiple of 8*space={8 * n_space} "
            "(use pad_bucket=8*space in the evaluator)"
        )
        return forward(variables, image1, image2)

    return run
