"""Quantify the static-full_size policy deviation (VERDICT r3 weak #6 / next #8).

The reference's UnsupAugmentor keeps the full-size frame at each dataset's
NATIVE floor-multiple-of-8 resolution (raft_utils/augmentor.py:557-662 —
dynamic shapes per dataset); this framework fixes `full_size` per stage for
XLA static shapes and UPSCALES sources smaller than it
(data/augment.py:418-428). This experiment measures what that does to the
unsupervised loss terms.

Probe design: synthetic pairs with an ANALYTIC smooth flow (img2 = img1
inverse-warped, so the true flow is photometrically near-perfect). The two
policies are simulated directly — native: frames at source resolution;
static: frames bilinearly upscaled by s = the policy's factor, with the true
flow recomputed analytically on the upscaled grid (flow_s(p) = s*flow(p/s)),
NOT resized (in real training the loss consumes MODEL predictions at the
frame resolution, so resize artifacts of the augmentor's metric-only flow
field must not pollute the measurement). The SMURF loss terms computed with
the true flow as a perfect student+teacher then isolate exactly what the
policy changes: resample blur of the frames, the zoom of image content, and
scaled flow magnitudes.

Run on CPU: dynamic shapes are fine there. Results recorded in docs/PARITY.md.

  JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python tools/exp_full_size_policy.py
"""
from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")

import numpy as np

SRC_H, SRC_W = 192, 384          # synthetic "small dataset" native size
STATIC_FULL = (256, 448)         # static full_size > source => upscale engages
CROP = (160, 320)
N_SEEDS = 6


def make_flow_fn(rng):
    ax, ay = rng.uniform(2.0, 5.0, 2)
    cx, cy = rng.uniform(-2, 2, 2)

    def flow(yy, xx, h, w):
        fx = ax * np.sin(2 * np.pi * yy / h) + cx
        fy = ay * np.cos(2 * np.pi * xx / w) + cy
        return np.stack([fx, fy], -1).astype(np.float32)  # (x, y) channels

    return flow


def make_pair(rng, flow_fn):
    """Blurred-noise texture; img2(p)=img1(p-flow(p)) so warping img2 by the
    flow reproduces img1 to first order."""
    import cv2

    img1 = rng.uniform(0, 1, (SRC_H, SRC_W, 3)).astype(np.float32)
    img1 = cv2.GaussianBlur(img1, (0, 0), 3.0)
    yy, xx = np.mgrid[0:SRC_H, 0:SRC_W].astype(np.float32)
    f = flow_fn(yy, xx, SRC_H, SRC_W)
    img2 = cv2.remap(
        img1, (xx - f[..., 0]).astype(np.float32),
        (yy - f[..., 1]).astype(np.float32),
        cv2.INTER_LINEAR, borderMode=cv2.BORDER_REPLICATE,
    )
    return img1, img2


def run_policy(static, seed):
    """Simulate one policy and compute the unsup loss with the analytic true
    flow as both (perfect) student and teacher prediction."""
    import cv2
    import jax.numpy as jnp

    from flow_supervisor_tpu.losses.unsupervised import (
        UnsupLossConfig,
        unsupervised_sequence_loss,
    )

    rng = np.random.default_rng(seed)
    flow_fn = make_flow_fn(rng)
    img1, img2 = make_pair(rng, flow_fn)

    if static:
        s = max(STATIC_FULL[0] / SRC_H, STATIC_FULL[1] / SRC_W)
        th, tw = int(np.ceil(SRC_H * s)), int(np.ceil(SRC_W * s))
        img1 = cv2.resize(img1, (tw, th), interpolation=cv2.INTER_LINEAR)
        img2 = cv2.resize(img2, (tw, th), interpolation=cv2.INTER_LINEAR)
        fh, fw = STATIC_FULL
        sy, sx = th / SRC_H, tw / SRC_W
    else:
        fh, fw = SRC_H, SRC_W  # already multiples of 8
        sy = sx = 1.0

    # full-frame window (static: random position inside the upscaled frame)
    oy = int(rng.integers(0, img1.shape[0] - fh + 1))
    ox = int(rng.integers(0, img1.shape[1] - fw + 1))
    full1 = img1[oy : oy + fh, ox : ox + fw]
    full2 = img2[oy : oy + fh, ox : ox + fw]
    # analytic true flow on the window's grid: flow_s(p) = S*flow(P/S)
    yy, xx = np.mgrid[0:fh, 0:fw].astype(np.float32)
    f_full = flow_fn((yy + oy) / sy, (xx + ox) / sx, SRC_H, SRC_W)
    f_full = f_full * np.asarray([sx, sy], np.float32)

    # 8-aligned student crop, same relative position in both policies
    cy = ((fh - CROP[0]) // 2 // 8) * 8
    cx = ((fw - CROP[1]) // 2 // 8) * 8
    crop_yx = jnp.asarray([[cy, cx]])
    csl = np.s_[cy : cy + CROP[0], cx : cx + CROP[1]]

    images = jnp.stack(
        [jnp.asarray(full1[csl])[None], jnp.asarray(full2[csl])[None]], axis=1
    )
    full = jnp.stack([jnp.asarray(full1)[None], jnp.asarray(full2)[None]], axis=1)
    flows_fw = jnp.asarray(f_full[csl])[None, None]
    flows_bw = -flows_fw  # first-order inverse of a smooth flow
    teacher_fw = jnp.asarray(f_full)[None]
    teacher_bw = -teacher_fw

    out = {}
    for occ in ("brox", "wang"):
        cfg = UnsupLossConfig(census=1.0, smooth1=0.0, smooth2=2.0,
                              selfsup=0.0, occlusion=occ)
        total, terms = unsupervised_sequence_loss(
            images, flows_fw, flows_bw, cfg,
            teacher_flow_fw=teacher_fw, teacher_flow_bw=teacher_bw,
            full_size_images=full, crop_yx=crop_yx,
        )
        out[occ] = {k: float(v) for k, v in terms.items()}
        out[occ]["total"] = float(total)
    out["flow_mean_mag"] = float(np.linalg.norm(f_full[csl], axis=-1).mean())
    return out


def main():
    results = {"static": [], "native": []}
    for seed in range(N_SEEDS):
        results["static"].append(run_policy(True, seed))
        results["native"].append(run_policy(False, seed))

    summary = {}
    for occ in ("brox", "wang"):
        terms = sorted(results["static"][0][occ])
        for t in terms:
            s = np.mean([r[occ][t] for r in results["static"]])
            n = np.mean([r[occ][t] for r in results["native"]])
            summary[f"{occ}.{t}"] = {
                "static": round(float(s), 6),
                "native": round(float(n), 6),
                "rel_delta": round(float((s - n) / (abs(n) + 1e-12)), 4),
            }
    summary["flow_mean_mag"] = {
        "static": round(float(np.mean([r["flow_mean_mag"] for r in results["static"]])), 3),
        "native": round(float(np.mean([r["flow_mean_mag"] for r in results["native"]])), 3),
    }
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    import jax

    jax.config.update("jax_platforms", "cpu")
    main()
