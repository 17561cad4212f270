"""Round-3 forward bench: einsum vs pallas vs fused lookup backends, B=1 and
batched, 448x1024x12 bf16. Chained fori_loop protocol (one launch, one scalar
fetch) per config; fresh inputs per run so the relay cannot memoize."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def build(backend, batch, n):
    from flow_supervisor_tpu.models import RAFT, RAFTConfig

    scan = backend.endswith("-scan")
    if scan:
        backend = backend[: -len("-scan")]
    cfg = RAFTConfig(
        iters=12, dtype=jnp.bfloat16, corr_dtype=jnp.bfloat16,
        lookup_backend=backend, scan_iters=scan,
    ).resolved()
    model = RAFT(cfg)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64, 3)), train=False,
    )

    @jax.jit
    def chained(v, i1, i2, s0):
        def body(i, s):
            out = model.apply(v, i1 + s * 1e-9, i2, train=False,
                              final_flow_only=True)["flow_up"][-1]
            return jnp.mean(jnp.abs(out))

        return jax.lax.fori_loop(0, n, body, s0)

    return chained, variables


def main():
    from flow_supervisor_tpu.utils.jax_setup import setup

    setup()
    rng = np.random.RandomState(0)
    configs = []
    for arg in sys.argv[1:]:
        backend, b = arg.split(":")
        configs.append((backend, int(b)))
    if not configs:
        configs = [("einsum", 1), ("pallas", 1), ("fused", 1),
                   ("fused", 2), ("fused", 4)]

    results = {}
    for backend, batch in configs:
        n = max(4, 24 // batch)
        try:
            t_build = time.perf_counter()
            fn, v = build(backend, batch, n)
            shape = (batch, 448, 1024, 3)
            x1 = jnp.asarray(rng.uniform(0, 1, shape), jnp.float32)
            x2 = jnp.asarray(rng.uniform(0, 1, shape), jnp.float32)
            warm = float(fn(v, x1, x2, jnp.float32(0)))
            print(f"{backend} B={batch}: compiled+warm in "
                  f"{time.perf_counter()-t_build:.1f}s (|flow|={warm:.4f})",
                  flush=True)
            ts = []
            for rep in range(2):
                x1 = jnp.asarray(rng.uniform(0, 1, shape), jnp.float32)
                x2 = jnp.asarray(rng.uniform(0, 1, shape), jnp.float32)
                jax.block_until_ready((x1, x2))
                t0 = time.perf_counter()
                val = float(fn(v, x1, x2, jnp.float32(rep + 1)))
                dt = time.perf_counter() - t0
                pps = n * batch / dt
                ts.append(pps)
                print(f"  {backend} B={batch} rep{rep}: {dt*1000:.1f} ms "
                      f"/{n} fwds = {pps:.1f} pairs/sec", flush=True)
            results[(backend, batch)] = max(ts)
        except Exception as e:
            print(f"{backend} B={batch}: FAILED {type(e).__name__}: {e}",
                  flush=True)
            results[(backend, batch)] = None

    print("\n=== summary (pairs/sec, chained-loop lower bound) ===")
    for (backend, batch), pps in results.items():
        print(f"  {backend:8s} B={batch}: "
              f"{'FAIL' if pps is None else f'{pps:.1f}'}")


if __name__ == "__main__":
    main()
