#!/usr/bin/env python
"""Benchmark the flow-supervisor (semi) training step on hardware at the
reference semi-sintel recipe shapes (train.sh:10-16): sup crop 400x720, unsup
crop 368x768, full frames 432x1024, batch 1, 12 student + 12 teacher iters."""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from flow_supervisor_tpu.config import ModelCfg
    from flow_supervisor_tpu.models import RAFT, RAFTConfig
    from flow_supervisor_tpu.training.optim import adamw
    from flow_supervisor_tpu.training.semi import make_semi_train_step
    from flow_supervisor_tpu.training.state import TrainState

    small = "--small-shapes" in sys.argv
    sup_hw = (160, 224) if small else (400, 720)
    unsup_hw = (160, 256) if small else (368, 768)
    full_hw = (192, 320) if small else (432, 1024)
    iters = 4 if small else 12

    backend = (
        sys.argv[sys.argv.index("--backend") + 1]
        if "--backend" in sys.argv
        else "auto"
    )
    cfg = RAFTConfig(
        iters=iters, teacher=True, teacher_iters=iters, freeze_bn=True,
        dtype=jnp.bfloat16, corr_dtype=jnp.bfloat16,
        update_ckpt="--remat" in sys.argv,  # production default: no remat (fits HBM at B=1 recipe shapes; 2.74 vs 2.35 steps/sec)
        lookup_backend=backend, scan_iters="--scan" in sys.argv,
    ).resolved()
    model = RAFT(cfg)
    # --ablate X: zero one branch to price it in the step (backward
    # decomposition without the profiler — relay wedges on any trace):
    #   nosup    : drop the whole sup branch (labeled fwd+bwd, incl. teacher
    #              L_fl) — step = unsup branch only
    #   nounsup  : drop the whole unsup branch — step = sup branch only
    #   noteacher: lfl_weight=0 — sup branch keeps the student loss but the
    #              teacher's full-res backward disappears (its fwd remains:
    #              semi_forward still computes it; XLA dead-codes the
    #              teacher-only grads)
    #   nolfr    : lfr_weight=0 — unsup branch computes forwards but no
    #              student-from-teacher backward
    ablate = (
        sys.argv[sys.argv.index("--ablate") + 1] if "--ablate" in sys.argv
        else None
    )
    mc = ModelCfg(
        teacher_iters=iters, lfr_loss_type="robust",
        sup_weight=0.0 if ablate == "nosup" else 1.0,
        unsup_weight=0.0 if ablate == "nounsup" else 1.0,
        lfl_weight=0.0 if ablate == "noteacher" else 1.0,
        lfr_weight=0.0 if ablate == "nolfr" else 1.0,
    )

    rng = np.random.default_rng(0)
    img = lambda s: jnp.asarray(rng.uniform(0, 1, s), jnp.float32)
    sup = {
        "image1": img((1, *sup_hw, 3)),
        "image2": img((1, *sup_hw, 3)),
        "orig_image1": img((1, *full_hw, 3)),
        "orig_image2": img((1, *full_hw, 3)),
        "crop_yx": jnp.zeros((1, 2), jnp.int32) + 16,
        "flow": img((1, *sup_hw, 2)),
        "valid": jnp.ones((1, *sup_hw, 1), jnp.float32),
    }
    unsup = {
        "image1": img((1, *unsup_hw, 3)),
        "image2": img((1, *unsup_hw, 3)),
        "orig_image1": img((1, *full_hw, 3)),
        "orig_image2": img((1, *full_hw, 3)),
        "crop_yx": jnp.zeros((1, 2), jnp.int32) + 16,
    }

    # init at SMALL shapes: the variable tree is image-size independent, and
    # an unjitted init at recipe shapes dispatches standalone pallas programs
    # whose outputs land on the scoped-vmem stack (17.15M > 16M at 368x768 —
    # see training/loop.py init_variables)
    variables = model.init(
        jax.random.PRNGKey(0),
        img((1, 64, 64, 3)), img((1, 64, 64, 3)),
        img((1, 96, 128, 3)), img((1, 96, 128, 3)),
        jnp.zeros((1, 2), jnp.int32), train=False, method="semi_forward",
    )
    tx = adamw(lambda s: 1e-5, lambda s: 0.0)
    state = TrainState.create(variables["params"], variables["batch_stats"], tx)
    # donate=True matches the production loop (training/loop.py) — the old
    # state buffer is reused in place instead of copied each step
    step = make_semi_train_step(model, mc, donate=True)

    state, log = step(state, sup, unsup)
    jax.block_until_ready(state.params)
    print("first step ok:", {k: round(float(v), 4) for k, v in log.items()},
          file=sys.stderr)

    # --trace <dir>: xplane capture of steady-state steps. MANUAL
    # start_trace/stop_trace opened AFTER compile+warm — the only protocol
    # that does not wedge the relay (round-5 exp_profiler_postmortem: the
    # `with jax.profiler.trace()` context wedges even on a trivial dot).
    if "--trace" in sys.argv:
        trace_dir = sys.argv[sys.argv.index("--trace") + 1]
        n_tr = 2
        jax.profiler.start_trace(trace_dir)
        for i in range(n_tr):
            state, log = step(state, dict(sup, image1=sup["image1"] + i * 1e-6), unsup)
        sync_key = "sup_loss" if "sup_loss" in log else "unsup_loss"
        assert np.isfinite(float(log[sync_key]))
        jax.profiler.stop_trace()
        print(f"trace written to {trace_dir}", file=sys.stderr)
        import glob
        import gzip
        import json as _json

        paths = glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz")
        if paths:
            d = _json.load(gzip.open(paths[0]))
            ev = d.get("traceEvents", [])
            pids = {e["pid"]: e["args"].get("name", "") for e in ev
                    if e.get("ph") == "M" and e.get("name") == "process_name"}
            agg = {}
            for e in ev:
                if e.get("ph") != "X":
                    continue
                if "TPU" not in str(pids.get(e.get("pid"), "")):
                    continue
                nm = e.get("name", "?")
                agg[nm] = agg.get(nm, 0.0) + e.get("dur", 0)
            print("top device ops (ms/step):", file=sys.stderr)
            for nm, us in sorted(agg.items(), key=lambda kv: -kv[1])[:40]:
                print(f"  {us/n_tr/1000:8.3f} ms  {nm[:110]}", file=sys.stderr)

    n = 10
    t0 = time.perf_counter()
    for i in range(n):
        sup_i = dict(sup, image1=sup["image1"] + i * 1e-5)
        state, log = step(state, sup_i, unsup)
    # honest sync: the relay's block_until_ready can return before execution;
    # a VALUE fetch of the last step's loss (state-chained through all n
    # steps) is the only trustworthy barrier (docs/PERF.md methodology).
    # Under --ablate the sup branch may not exist — sync on whichever
    # branch's loss is in the log.
    sync_key = "sup_loss" if "sup_loss" in log else "unsup_loss"
    assert np.isfinite(float(log[sync_key]))
    dt = (time.perf_counter() - t0) / n
    print(json.dumps({
        "metric": "semi_train_steps_per_sec",
        "value": round(1.0 / dt, 3),
        "unit": "steps/sec",
        "ms_per_step": round(dt * 1000, 1),
    }))


if __name__ == "__main__":
    main()
