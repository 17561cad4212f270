"""Memoization-proof forward bench: fresh host inputs every call, per-call
blocking, print a data-dependent scalar per call."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    backend = sys.argv[1] if len(sys.argv) > 1 else "pallas"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    from flow_supervisor_tpu.models import RAFT, RAFTConfig
    from flow_supervisor_tpu.utils.jax_setup import setup

    setup()
    cfg = RAFTConfig(
        iters=12, dtype=jnp.bfloat16, corr_dtype=jnp.bfloat16,
        lookup_backend=backend,
    ).resolved()
    model = RAFT(cfg)
    rng = np.random.RandomState(0)
    shape = (batch, 448, 1024, 3)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64, 3)), train=False,
    )

    @jax.jit
    def fwd(variables, i1, i2):
        out = model.apply(variables, i1, i2, train=False)
        return jnp.mean(jnp.abs(out["flow_up"][-1]))

    x1 = jnp.asarray(rng.uniform(0, 1, shape), jnp.float32)
    x2 = jnp.asarray(rng.uniform(0, 1, shape), jnp.float32)
    print("warmup:", float(fwd(variables, x1, x2)))

    times = []
    for i in range(8):
        a = jnp.asarray(rng.uniform(0, 1, shape), jnp.float32)
        b = jnp.asarray(rng.uniform(0, 1, shape), jnp.float32)
        jax.block_until_ready((a, b))
        t0 = time.perf_counter()
        v = float(fwd(variables, a, b))
        dt = time.perf_counter() - t0
        times.append(dt)
        print(f"call {i}: {dt*1000:.2f} ms  mean|flow|={v:.4f}")
    med = sorted(times)[len(times) // 2]
    print(f"{backend}: median {med*1000:.2f} ms/fwd = {batch/med:.1f} pairs/sec")


if __name__ == "__main__":
    main()
