"""Interleaved A/B forward bench: alternate backends call-by-call so relay
contention drift cancels. Fresh inputs per call, scalar fetch per call."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def build(backend):
    from flow_supervisor_tpu.models import RAFT, RAFTConfig

    cfg = RAFTConfig(
        iters=12, dtype=jnp.bfloat16, corr_dtype=jnp.bfloat16,
        lookup_backend=backend,
    ).resolved()
    model = RAFT(cfg)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64, 3)), train=False,
    )

    @jax.jit
    def fwd(variables, i1, i2):
        out = model.apply(variables, i1, i2, train=False)
        return jnp.mean(jnp.abs(out["flow_up"][-1]))

    return fwd, variables


def main():
    from flow_supervisor_tpu.utils.jax_setup import setup

    setup()
    rng = np.random.RandomState(0)
    shape = (1, 448, 1024, 3)
    fns = {b: build(b) for b in ("zero", "einsum", "pallas")}
    # warmup both
    x1 = jnp.asarray(rng.uniform(0, 1, shape), jnp.float32)
    x2 = jnp.asarray(rng.uniform(0, 1, shape), jnp.float32)
    for b, (fwd, v) in fns.items():
        print(f"warmup {b}:", float(fwd(v, x1, x2)), flush=True)

    times = {b: [] for b in fns}
    for i in range(8):
        a = jnp.asarray(rng.uniform(0, 1, shape), jnp.float32)
        c = jnp.asarray(rng.uniform(0, 1, shape), jnp.float32)
        jax.block_until_ready((a, c))
        for b, (fwd, v) in fns.items():
            t0 = time.perf_counter()
            val = float(fwd(v, a, c))
            dt = time.perf_counter() - t0
            times[b].append(dt)
            print(f"round {i} {b}: {dt*1000:.2f} ms (|flow|={val:.4f})", flush=True)
    for b, ts in times.items():
        med = sorted(ts)[len(ts) // 2]
        print(f"{b}: median {med*1000:.2f} ms/fwd = {1/med:.1f} pairs/sec")


if __name__ == "__main__":
    main()
