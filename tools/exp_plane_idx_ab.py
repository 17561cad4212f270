"""Interleaved A/B: plane-lookup kernel with XLA-side index prologue (HEAD)
vs in-kernel scalar index math (working tree). One process, alternating
rounds — the only comparison the relay's clock drift permits.

Context: exp_model_plane_ablate's "staticidx 22.0 vs full 35.1 ms/fwd" result
suggested ~13 ms/fwd of XLA-side index cost, but staticidx made the lookup
indices CONSTANT, which plausibly let XLA hoist the now-iteration-invariant
lookups out of the refinement loop (12 lookups -> 1) — an ablation trap.
This tool measures the real delta between the two live implementations.
"""
import importlib.util
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from flow_supervisor_tpu.kernels import corr_plane as cp_new


def load_head_module():
    src = subprocess.run(
        ["git", "-C", "/root/repo", "show",
         "HEAD:flow_supervisor_tpu/kernels/corr_plane.py"],
        capture_output=True, text=True, check=True,
    ).stdout
    with tempfile.NamedTemporaryFile(
        "w", suffix="_corr_plane_head.py", delete=False
    ) as f:
        f.write(src)
        path = f.name
    spec = importlib.util.spec_from_file_location("corr_plane_head", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def build_chain(n):
    from flow_supervisor_tpu.models import RAFT, RAFTConfig

    cfg = RAFTConfig(
        iters=12, dtype=jnp.bfloat16, corr_dtype=jnp.bfloat16,
        lookup_backend="plane", scan_iters=True,
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
    import signal

    def _alarm(signum, frame):
        raise RuntimeError("relay watchdog")

    signal.signal(signal.SIGALRM, _alarm)
    signal.alarm(560)

    cp_head = load_head_module()
    n = 24
    rng = np.random.RandomState(0)
    shape = (1, 448, 1024, 3)
    x2 = jnp.asarray(rng.uniform(0, 1, shape), jnp.float32)

    variants = {
        "head_xla_idx": cp_head.corr_pyramid_lookup_plane,
        "new_inkernel": cp_new.corr_pyramid_lookup_plane,
    }
    orig = cp_new.corr_pyramid_lookup_plane
    fns = {}
    for name, lookup in variants.items():
        cp_new.corr_pyramid_lookup_plane = lookup
        try:
            fn, v = build_chain(n)
            x1 = jnp.asarray(rng.uniform(0, 1, shape), jnp.float32)
            t0 = time.perf_counter()
            val = float(fn(v, x1, x2, jnp.float32(0)))
            print(f"{name:13s} warm: {val:.4f} "
                  f"({time.perf_counter()-t0:.0f}s)", flush=True)
            fns[name] = (fn, v)
        finally:
            cp_new.corr_pyramid_lookup_plane = orig

    times = {k: [] for k in fns}
    for r in range(3):
        x1 = jnp.asarray(rng.uniform(0, 1, shape), jnp.float32)
        for name, (fn, v) in fns.items():
            t0 = time.perf_counter()
            float(fn(v, x1, x2, jnp.float32(r + 1)))
            times[name].append(time.perf_counter() - t0)
            print(f"round {r} {name:13s}: "
                  f"{times[name][-1]/n*1e3:7.2f} ms/fwd", flush=True)
    print("---")
    for name, ts in times.items():
        med = sorted(ts)[len(ts) // 2] / n * 1e3
        print(f"{name:13s}: {med:7.2f} ms/fwd", flush=True)


if __name__ == "__main__":
    main()
