"""Model-level decomposition of the plane-backend lookup cost.

The kernel microbench (tools/exp_plane_ablate.py) says one all-levels lookup
costs 0.81 ms, 0.63 of it plane-block DMA — but the full forward shows ~18 ms
of lookup-path cost over the zero-backend floor. This interleaves full-model
chains (448x1024x12, scan, fused norm) whose lookup is progressively gutted
IN PLACE:

  full     : production plane backend
  staticidx: (historical — only valid on the pre-in-kernel-index revision,
             where corr_plane still had an XLA-side _level_indices prologue;
             measured full 35.1 vs staticidx 22.0 ms/fwd. CAUTION: that delta
             was mostly an ablation ARTIFACT — constant indices make all 12
             lookups iteration-invariant and XLA hoists 11 of them out of the
             refinement loop. The honest interleaved A/B of XLA-prologue vs
             in-kernel index math is tools/exp_plane_idx_ab.py: 34.6 vs 32.9
             ms/fwd, a real but modest -1.7 ms)
  nothing  : production pallas call, kernel body = const store (keeps the
             block DMA, drops extraction/combine) — isolates the kernel body
  noplanes : corr_pyramid_lookup_plane replaced by a coords-dependent
             broadcast (planes still built; XLA hoists their reads out of the
             scan) — isolates DMA + pallas-call overhead + index glue
  nobuild  : build_padded_pyramid replaced by fmap-mean broadcast planes
             (fnet + lookup kernel kept, the all-pairs matmul + pooling +
             pad_plane killed) — isolates the pyramid build
  full2    : second copy of the production chain. The first-warmed program
             in a process measures 30-50% SLOWER than an identical program
             warmed last (full 49.3 vs dup 32.9 ms/fwd in one 5-variant run)
             — a relay executable-management artifact. Always bracket with
             full first and full2 last and read the production number off
             full2; deltas between middle variants appear position-stable.
  zero     : lookup_backend="zero" floor — CAVEAT: with a constant corr, XLA
             dead-codes the fnet AND the pyramid build (fmaps have no other
             consumer), so this is the no-fnet/no-lookup floor

All variants share one process and interleave rounds (relay drift rule).
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from flow_supervisor_tpu.kernels import corr_plane as cp
from tools.exp_plane_ablate import make_kernel


def build_chain(n, backend):
    from flow_supervisor_tpu.models import RAFT, RAFTConfig

    cfg = RAFTConfig(
        iters=12, dtype=jnp.bfloat16, corr_dtype=jnp.bfloat16,
        lookup_backend=backend, scan_iters=True,
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


def _nobuild_pyramid(fmap1, fmap2, num_levels=4, radius=4,
                     out_dtype=jnp.float32):
    """Fake planes derived from a cheap fmap reduction: keeps fnet and the
    lookup kernel alive, kills the all-pairs matmul + pooling + pad_plane."""
    from flow_supervisor_tpu.kernels.corr_lookup_v2 import (
        PaddedPyramid, _round_up, plane_height,
    )

    b, h1, w1, _ = fmap1.shape
    bq = b * h1 * w1
    bqp = _round_up(bq, 128)
    seed = (jnp.mean(fmap1.astype(jnp.float32))
            + jnp.mean(fmap2.astype(jnp.float32)))
    planes, shapes = [], []
    for lvl in range(num_levels):
        h2, w2 = h1 // (2 ** lvl), w1 // (2 ** lvl)
        hp = plane_height(h2)
        # real pad_plane keeps the lane axis at the UNPADDED w2
        planes.append(
            jnp.broadcast_to(seed.astype(out_dtype), (bqp, hp, w2)))
        shapes.append((h2, w2))
    return PaddedPyramid(planes=planes, shapes=tuple(shapes), radius=radius)


def _nofnet_features(self, image1, image2, train=False):
    """fnet replaced by an image-mean broadcast: isolates the fnet encoder
    (build + lookup + cnet + update loop all stay alive)."""
    b, h, w, _ = image1.shape
    seed = (jnp.mean(image1.astype(jnp.float32))
            + jnp.mean(image2.astype(jnp.float32)))
    f = jnp.broadcast_to(
        seed.astype(self.cfg.dtype), (b, h // 8, w // 8, 256))
    return f, f * 0.5


def _nocnet_context(self, image1, train=False):
    """cnet replaced by an image-mean broadcast: isolates the cnet encoder."""
    b, h, w, _ = image1.shape
    seed = jnp.mean(image1.astype(jnp.float32))
    hd = self.cfg.hidden_dim
    net = jnp.broadcast_to(
        seed.astype(self.cfg.dtype), (b, h // 8, w // 8, hd))
    inp = jnp.broadcast_to(
        (seed * 0.5).astype(self.cfg.dtype),
        (b, h // 8, w // 8, self.cfg.context_dim))
    return jnp.tanh(net), jax.nn.relu(inp)


def _noplanes_lookup(pyramid, coords, radius=4, dy_major=False,
                     out_dtype=jnp.float32):
    k2 = len(pyramid.planes) * (2 * radius + 1) ** 2
    b, h1, w1, _ = coords.shape
    seed = sum(jnp.mean(p.astype(jnp.float32)) for p in pyramid.planes)
    return jnp.broadcast_to(
        (coords[..., :1] * 1e-12 + seed * 1e-12).astype(out_dtype),
        (b, h1, w1, k2),
    )


def main():
    import signal

    def _alarm(signum, frame):
        raise RuntimeError("relay watchdog")

    signal.signal(signal.SIGALRM, _alarm)
    signal.alarm(int(sys.argv[sys.argv.index("--watchdog") + 1])
                 if "--watchdog" in sys.argv else 560)

    n = 24
    rng = np.random.RandomState(0)
    shape = (1, 448, 1024, 3)
    x2 = jnp.asarray(rng.uniform(0, 1, shape), jnp.float32)

    from flow_supervisor_tpu.kernels import corr_lookup_v2 as clv2

    from flow_supervisor_tpu.models import raft as raft_mod

    orig_kernel = cp._plane_kernel
    orig_lookup = cp.corr_pyramid_lookup_plane
    orig_build = clv2.build_padded_pyramid
    orig_features = raft_mod.RAFT.features
    orig_context = raft_mod.RAFT.context
    argv, names = sys.argv[1:], []
    i = 0
    while i < len(argv):
        if argv[i].startswith("--"):
            i += 2  # every flag takes a value
            continue
        names.append(argv[i])
        i += 1
    names = names or ["full", "nothing", "noplanes", "zero"]
    fns = {}
    for name in names:
        backend = "zero" if name == "zero" else "plane"
        if name == "nothing":
            cp._plane_kernel = make_kernel("nothing")
        elif name == "noplanes":
            cp.corr_pyramid_lookup_plane = _noplanes_lookup
        elif name == "nobuild":
            clv2.build_padded_pyramid = _nobuild_pyramid
        elif name == "nofnet":
            raft_mod.RAFT.features = _nofnet_features
        elif name == "nocnet":
            raft_mod.RAFT.context = _nocnet_context
        try:
            fn, v = build_chain(n, backend)
            x1 = jnp.asarray(rng.uniform(0, 1, shape), jnp.float32)
            t0 = time.perf_counter()
            val = float(fn(v, x1, x2, jnp.float32(0)))
            print(f"{name:9s} warm: {val:.4f} "
                  f"({time.perf_counter()-t0:.0f}s)", flush=True)
            fns[name] = (fn, v)
        except Exception as e:
            print(f"{name:9s} FAILED {type(e).__name__}: {e}", flush=True)
        finally:
            cp._plane_kernel = orig_kernel
            cp.corr_pyramid_lookup_plane = orig_lookup
            clv2.build_padded_pyramid = orig_build

    times = {k: [] for k in fns}
    for r in range(3):
        x1 = jnp.asarray(rng.uniform(0, 1, shape), jnp.float32)
        for name, (fn, v) in fns.items():
            t0 = time.perf_counter()
            float(fn(v, x1, x2, jnp.float32(r + 1)))
            times[name].append(time.perf_counter() - t0)
            print(f"round {r} {name:9s}: "
                  f"{times[name][-1]/n*1e3:7.2f} ms/fwd", flush=True)
    print("---")
    for name, ts in times.items():
        med = sorted(ts)[len(ts) // 2] / n * 1e3
        print(f"{name:9s}: {med:7.2f} ms/fwd", flush=True)


if __name__ == "__main__":
    main()
