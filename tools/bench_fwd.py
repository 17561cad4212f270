"""Full RAFT forward benchmark on TPU: einsum vs pallas lookup backends.

python tools/bench_fwd.py [--backends einsum pallas] [--batch 1] [--n 30]
"""
import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--backends", nargs="+", default=["einsum", "pallas"])
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--h", type=int, default=448)
    ap.add_argument("--w", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--n", type=int, default=30)
    args = ap.parse_args()

    from flow_supervisor_tpu.models import RAFT, RAFTConfig
    from flow_supervisor_tpu.utils.jax_setup import setup

    setup()
    rng = np.random.RandomState(0)
    imgs = [
        jnp.asarray(rng.uniform(0, 1, (args.batch, args.h, args.w, 3)), jnp.float32)
        for _ in range(2)
    ]

    results = {}
    for backend in args.backends:
        cfg = RAFTConfig(
            iters=args.iters,
            dtype=jnp.bfloat16,
            corr_dtype=jnp.bfloat16,
            lookup_backend=backend,
        ).resolved()
        model = RAFT(cfg)
        variables = model.init(jax.random.PRNGKey(0), imgs[0][:1, :64, :64], imgs[1][:1, :64, :64], train=False)

        @jax.jit
        def fwd(variables, i1, i2):
            out = model.apply(variables, i1, i2, train=False)
            return out["flow_up"][-1]

        out = fwd(variables, imgs[0], imgs[1])
        jax.block_until_ready(out)
        # block per call: the relay overlaps queued launches, so blocking only
        # at the end measures pipeline throughput, not per-forward latency
        t0 = time.perf_counter()
        for i in range(args.n):
            jax.block_until_ready(fwd(variables, imgs[0] + i * 1e-4, imgs[1]))
        dt = (time.perf_counter() - t0) / args.n
        t0 = time.perf_counter()
        outs = [fwd(variables, imgs[0] + i * 1e-4, imgs[1]) for i in range(args.n)]
        jax.block_until_ready(outs)
        dt_pipe = (time.perf_counter() - t0) / args.n
        print(f"  pipelined: {dt_pipe*1000:.2f} ms/fwd ({args.batch/dt_pipe:.1f} pairs/sec)")
        pairs = args.batch / dt
        results[backend] = out
        print(f"{backend}: {dt*1000:.2f} ms/fwd, {pairs:.1f} pairs/sec (B={args.batch})")

    if len(results) == 2:
        a, b = [np.asarray(v) for v in results.values()]
        print("max |diff| between backends:", float(np.max(np.abs(a - b))))


if __name__ == "__main__":
    main()
