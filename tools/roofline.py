#!/usr/bin/env python
"""Whole-forward roofline at 448x1024x12 bf16 (VERDICT r4 #7).

Prices every block of the RAFT forward (encoders, pyramid build, 12x
lookup+update, final convex upsample) in FLOPs and HBM bytes, against the
chip ceilings this repo has MEASURED through the relay (docs/PERF.md):

  * MXU:  232 TFLOP/s sustained bf16 (8192^3 matmul calibration, BASELINE.md)
  * HBM:  --bw GB/s (default 819 = v5e spec; pass the measured number from
          `--calibrate-bw` run on the TPU when taking the final table)

Method: `jax.jit(...).lower(args).cost_analysis()` per block on the CPU
backend — HLO-level analytic FLOPs (backend-independent) and bytes accessed.
Per-iteration cost comes from differencing iters=13 vs iters=1 lowerings of
the SAME program (scan mode), so loop-invariant work (encoders, build,
upsample) cancels exactly. The lookup is priced twice: the einsum
formulation XLA sees (upper bound) and the pallas plane-DMA floor the
kernels actually pay (measured 0.63 ms/lookup plane traffic, docs/PERF.md).

Bytes-accessed caveat: HLO cost analysis counts operand+result bytes per op
WITHOUT fusion, so it OVERSTATES real HBM traffic (fused elementwise chains
never round-trip). The roofline therefore brackets each block:
  t_lo = max(flops/MXU, bytes_min/BW)   bytes_min = inputs+outputs+params once
  t_hi = max(flops/MXU, bytes_hlo/BW)
Real device time should land between, closer to t_lo the better XLA fuses.

Run: PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python tools/roofline.py
"""
from __future__ import annotations

import argparse
import json
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import jax.numpy as jnp
import numpy as np

from flow_supervisor_tpu.models import RAFT, RAFTConfig

H, W, ITERS = 448, 1024, 12
MXU_TFLOPS = 232.0  # measured sustained bf16 (BASELINE.md calibration)


def _cost(fn, *args):
    """(gflops, hlo_gbytes) from an HLO-level lowering (no compile)."""
    lowered = jax.jit(fn).lower(*args)
    try:
        c = lowered.cost_analysis()
    except Exception:
        c = lowered.compile().cost_analysis()
    if isinstance(c, (list, tuple)):
        c = c[0]
    flops = float(c.get("flops", 0.0))
    nbytes = float(
        c.get("bytes accessed", 0.0) or sum(
            v for k, v in c.items() if k.startswith("bytes accessed")
        )
    )
    return flops / 1e9, nbytes / 1e9


def forward_cost(model, variables, img1, img2, iters):
    def fwd(v, a, b):
        return model.apply(v, a, b, train=False, iters=iters,
                           final_flow_only=True)["flow_up"][-1]

    return _cost(fwd, variables, img1, img2)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bw", type=float, default=819.0,
                    help="HBM GB/s ceiling (v5e spec 819; pass measured)")
    ap.add_argument("--calibrate-bw", action="store_true",
                    help="measure HBM copy BW on the attached device first")
    args = ap.parse_args()

    bw = args.bw
    if args.calibrate_bw:
        bw = calibrate_bw()
        print(f"# measured HBM copy BW: {bw:.0f} GB/s")

    rng = np.random.default_rng(0)
    img1 = jnp.asarray(rng.uniform(0, 1, (1, H, W, 3)), jnp.float32)
    img2 = jnp.asarray(rng.uniform(0, 1, (1, H, W, 3)), jnp.float32)

    rows = []  # (name, gflop, hlo_gb, min_gb)

    def add(name, gflop, hlo_gb, min_gb):
        rows.append((name, gflop, hlo_gb, min_gb))

    for backend in ("einsum", "zero"):
        cfg = RAFTConfig(
            iters=ITERS, dtype=jnp.bfloat16, corr_dtype=jnp.bfloat16,
            # UNROLLED: HLO cost analysis counts a lax.scan body once
            # regardless of trip count, which would zero the per-iteration
            # differencing
            lookup_backend=backend, scan_iters=False,
        ).resolved()
        model = RAFT(cfg)
        if backend == "einsum":
            variables = model.init(jax.random.PRNGKey(0), img1[:, :64, :64],
                                   img2[:, :64, :64], train=False)
            n_params = sum(x.size for x in jax.tree_util.tree_leaves(variables))

            g1, b1 = forward_cost(model, variables, img1, img2, 1)
            g13, b13 = forward_cost(model, variables, img1, img2, 13)
            giter_full, biter_full = (g13 - g1) / 12, (b13 - b1) / 12

            # block-level lowerings
            gfeat, bfeat = _cost(
                lambda v, a, b: model.apply(v, a, b, train=False,
                                            method="features"),
                variables, img1, img2,
            )
            gctx, bctx = _cost(
                lambda v, a: model.apply(v, a, train=False, method="context"),
                variables, img1,
            )
            fmap1, fmap2 = model.apply(variables, img1, img2, train=False,
                                       method="features")
            gcorr, bcorr = _cost(
                lambda v, f1, f2: model.apply(v, f1, f2, method="build_corr"),
                variables, fmap1, fmap2,
            )
            gtot, btot = g13, b13  # keep for summary vs sum-of-blocks
        else:
            variables_z = model.init(jax.random.PRNGKey(0), img1[:, :64, :64],
                                     img2[:, :64, :64], train=False)
            gz1, bz1 = forward_cost(model, variables_z, img1, img2, 1)
            gz13, bz13 = forward_cost(model, variables_z, img1, img2, 13)
            giter_upd, biter_upd = (gz13 - gz1) / 12, (bz13 - bz1) / 12

    h8, w8 = H // 8, W // 8
    fmap_mb = 2 * h8 * w8 * 256 * 2 / 1e9  # bf16 pair of fmaps, GB
    # min traffic: images in, fmaps out, weights once
    add("fnet (pair)", gfeat, bfeat,
        2 * H * W * 3 * 4 / 1e9 + fmap_mb + 1.05e6 * 2 / 1e9)
    add("cnet", gctx, bctx,
        H * W * 3 * 4 / 1e9 + h8 * w8 * 256 * 2 / 1e9 + 1.05e6 * 2 / 1e9)
    # pyramid: read two fmaps, write 4 levels of (h8*w8) x (h8/2^l * w8/2^l)
    q = h8 * w8
    vol_gb = sum(q * (h8 // 2**l) * (w8 // 2**l) * 2 for l in range(4)) / 1e9
    add("corr volume+pyramid", gcorr, bcorr, fmap_mb + vol_gb)

    # per-iteration: lookup (einsum view) = full-iter minus update-only
    g_lk, b_lk = giter_full - giter_upd, biter_full - biter_upd
    # plane-kernel floor: each lookup re-reads each query's plane blocks;
    # measured DMA floor 0.63 ms => bytes ~= 0.63ms * BW_measured_frac; use
    # the analytic per-level plane-group bytes instead: the kernel streams
    # the pyramid (vol_gb) once per lookup plus the [BQ, L*81] output.
    lk_floor_gb = vol_gb + q * 4 * 81 * 2 / 1e9
    add(f"lookup x{ITERS} (einsum-HLO view)", g_lk * ITERS, b_lk * ITERS,
        lk_floor_gb * ITERS)
    add(f"update block x{ITERS}", giter_upd * ITERS, biter_upd * ITERS,
        ITERS * (q * (256 + 324 + 128 + 2 + 576) * 2) / 1e9)

    # final convex upsample: softmax over 9 x (8x8) mask + weighted combine
    g_up = (g1) - (gfeat + gctx + gcorr + g_lk + giter_upd)
    b_up_min = (q * 576 * 2 + H * W * 2 * 4) / 1e9
    add("convex upsample (final only)", max(g_up, 0.0), max(g_up, 0.0) * 0 + b_up_min,
        b_up_min)

    mxu = MXU_TFLOPS * 1e3  # GFLOP/s
    print(f"# roofline at {H}x{W}x{ITERS} bf16, MXU {MXU_TFLOPS} TFLOP/s, "
          f"HBM {bw:.0f} GB/s")
    print(f"{'block':38s} {'GFLOP':>8s} {'GB(hlo)':>8s} {'GB(min)':>8s} "
          f"{'t_lo ms':>8s} {'t_hi ms':>8s}")
    t_lo_sum = t_hi_sum = 0.0
    for name, gflop, hlo_gb, min_gb in rows:
        t_lo = max(gflop / mxu, min_gb / bw) * 1e3
        t_hi = max(gflop / mxu, hlo_gb / bw) * 1e3
        t_lo_sum += t_lo
        t_hi_sum += t_hi
        print(f"{name:38s} {gflop:8.1f} {hlo_gb:8.3f} {min_gb:8.3f} "
              f"{t_lo:8.2f} {t_hi:8.2f}")
    print(f"{'TOTAL':38s} {sum(r[1] for r in rows):8.1f} "
          f"{sum(r[2] for r in rows):8.3f} {sum(r[3] for r in rows):8.3f} "
          f"{t_lo_sum:8.2f} {t_hi_sum:8.2f}")
    print(json.dumps({
        "pairs_per_sec_ceiling_lo_traffic": round(1e3 / t_lo_sum, 1),
        "pairs_per_sec_ceiling_hlo_traffic": round(1e3 / t_hi_sum, 1),
        "measured_best_ms": 30.3,  # 33.0 pairs/sec fused b1 scan (r4)
        "total_gflop": round(sum(r[1] for r in rows), 1),
    }))


def calibrate_bw() -> float:
    """Chained HBM copy: one launch, one fetch (relay-honest protocol)."""
    n = 256 * 1024 * 1024 // 4  # 1 GiB fp32
    x = jnp.arange(n, dtype=jnp.float32)

    @jax.jit
    def chain(x, s):
        def body(i, c):
            x2 = x + c  # read 1 GiB + write 1 GiB
            return x2[137] * 1e-9

        return jax.lax.fori_loop(0, 8, body, s)

    import time

    chain(x, jnp.float32(0)).block_until_ready()
    t0 = time.perf_counter()
    v = float(chain(x, jnp.float32(1)))
    dt = time.perf_counter() - t0
    assert np.isfinite(v)
    return 8 * 2 * (n * 4) / dt / 1e9


if __name__ == "__main__":
    main()
