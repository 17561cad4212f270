"""Encoder-internal cost decomposition (round 4, VERDICT #3).

The model-level ablation (tools/exp_model_plane_ablate.py) prices
fnet+pyramid at ~10.1 ms/fwd at 448x1024 bf16, but ideal is ~0.6 ms of MXU
time (124 GFLOP) / ~1-2 ms of HBM traffic — something inside the encoder
stack runs at <10% of roofline. This interleaves STANDALONE encoder chains
(no refinement loop) to split the cost by stage and by norm lowering:

  full    : BasicEncoder(256ch, instance norm, fused pallas norm) on the
            fnet input ([2,H,W,3] -- the siamese concat), eval mode
  xlanorm : same, fused_norm=False (pure-XLA instance norm)
  nonorm  : same, norm="none" (isolates the conv stack)
  stem    : stem s2d conv + norm + relu only
  stage1  : stem + residual stage 1 (64ch @ H/2)
  stage2  : stem + stages 1-2 (96ch @ H/4)
  cnet    : BasicEncoder(batch norm) at [1,H,W,3] eval (the context encoder)
  build   : all-pairs correlation + pooled pyramid build from fake fmaps
            (isolates the volume build from the encoders)

Methodology: one process, interleaved rounds, chained fori_loop with a single
scalar fetch (docs/PERF.md). Bracket with full first and full2 last; read
production cost off full2 (first-warmed programs measure 30-50% slow on the
relay).
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from flax import linen as nn

from flow_supervisor_tpu.models.encoders import BasicEncoder, ResidualBlock
from flow_supervisor_tpu.models.layers import ExtractorConv, Norm


class StemOnly(nn.Module):
    norm: str = "instance"
    dtype: jnp.dtype = jnp.bfloat16
    stages: int = 0  # 0 = stem only, 1 = +stage1, 2 = +stage2

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ExtractorConv(3, 64, 7, 2, self.dtype)(x)
        x = Norm(self.norm, self.dtype, 8, True)(x, train, relu=True)
        in_planes = 64
        for dim, stride in (((64, 1), (96, 2), (128, 2))[: self.stages]):
            x = ResidualBlock(in_planes, dim, self.norm, stride, self.dtype,
                              True)(x, train)
            x = ResidualBlock(dim, dim, self.norm, 1, self.dtype, True)(x, train)
            in_planes = dim
        return x


def build_chain(n, module, shape, init_shape=(1, 64, 64, 3)):
    variables = module.init(jax.random.PRNGKey(0), jnp.zeros(init_shape),
                            train=False)

    @jax.jit
    def chained(v, x, s0):
        def body(i, s):
            out = module.apply(v, x + s * 1e-9, train=False)
            return jnp.mean(jnp.abs(out.astype(jnp.float32)))

        return jax.lax.fori_loop(0, n, body, s0)

    return chained, variables


def build_pyr_chain(n, h, w):
    """All-pairs corr + pooled pyramid from a cheap fmap stand-in."""
    from flow_supervisor_tpu.ops.corr import build_corr_pyramid_from_fmaps

    @jax.jit
    def chained(x1, x2, s0):
        def body(i, s):
            f1 = jnp.broadcast_to(
                (x1[0, 0, 0, 0] + s * 1e-9).astype(jnp.bfloat16),
                (1, h // 8, w // 8, 256))
            f2 = jnp.broadcast_to(
                x2[0, 0, 0, 0].astype(jnp.bfloat16), (1, h // 8, w // 8, 256))
            vols = build_corr_pyramid_from_fmaps(f1, f2, 4, jnp.bfloat16)
            return sum(jnp.mean(v.astype(jnp.float32)) for v in vols)

        return jax.lax.fori_loop(0, n, body, s0)

    return chained


def main():
    import signal

    def _alarm(signum, frame):
        raise RuntimeError("relay watchdog")

    signal.signal(signal.SIGALRM, _alarm)
    signal.alarm(int(sys.argv[sys.argv.index("--watchdog") + 1])
                 if "--watchdog" in sys.argv else 900)

    h, w = 448, 1024
    n = 50
    if "--hw" in sys.argv:  # CPU smoke: --hw 64x128
        h, w = map(int, sys.argv[sys.argv.index("--hw") + 1].split("x"))
        n = 2
    rng = np.random.RandomState(0)
    fnet_shape = (2, h, w, 3)  # siamese concat
    cnet_shape = (1, h, w, 3)

    dt = jnp.bfloat16
    variants = {
        "full": (BasicEncoder(256, "instance", dtype=dt), fnet_shape),
        "xlanorm": (BasicEncoder(256, "instance", dtype=dt, fused_norm=False),
                    fnet_shape),
        "nonorm": (BasicEncoder(256, "none", dtype=dt), fnet_shape),
        "stem": (StemOnly(dtype=dt, stages=0), fnet_shape),
        "stage1": (StemOnly(dtype=dt, stages=1), fnet_shape),
        "stage2": (StemOnly(dtype=dt, stages=2), fnet_shape),
        "cnet": (BasicEncoder(256, "batch", dtype=dt), cnet_shape),
        "full2": (BasicEncoder(256, "instance", dtype=dt), fnet_shape),
    }
    argv, names = sys.argv[1:], []
    i = 0
    while i < len(argv):
        if argv[i].startswith("--"):
            i += 2
            continue
        names.append(argv[i])
        i += 1
    names = names or list(variants) + ["build"]

    fns = {}
    for name in names:
        try:
            if name == "build":
                fn = build_pyr_chain(n, h, w)
                x1 = jnp.asarray(rng.uniform(0, 1, (1, 1, 1, 1)), jnp.float32)
                x2 = jnp.asarray(rng.uniform(0, 1, (1, 1, 1, 1)), jnp.float32)
                t0 = time.perf_counter()
                val = float(fn(x1, x2, jnp.float32(0)))
                fns[name] = (lambda v, x, s, _f=fn, _x2=x2: _f(x, _x2, s), None,
                             (1, 1, 1, 1))
            else:
                module, shape = variants[name]
                fn, v = build_chain(n, module, shape)
                x1 = jnp.asarray(rng.uniform(0, 1, shape), jnp.float32)
                t0 = time.perf_counter()
                val = float(fn(v, x1, jnp.float32(0)))
                fns[name] = (fn, v, shape)
            print(f"{name:8s} warm: {val:.4f} ({time.perf_counter()-t0:.0f}s)",
                  flush=True)
        except Exception as e:
            print(f"{name:8s} FAILED {type(e).__name__}: {e}", flush=True)

    times = {k: [] for k in fns}
    for r in range(3):
        for name, (fn, v, shape) in fns.items():
            x = jnp.asarray(rng.uniform(0, 1, shape), jnp.float32)
            t0 = time.perf_counter()
            float(fn(v, x, jnp.float32(r + 1)))
            times[name].append(time.perf_counter() - t0)
            print(f"round {r} {name:8s}: {times[name][-1]/n*1e3:7.2f} ms",
                  flush=True)
    print("---")
    for name, ts in times.items():
        med = sorted(ts)[len(ts) // 2] / n * 1e3
        print(f"{name:8s}: {med:7.2f} ms")


if __name__ == "__main__":
    main()
