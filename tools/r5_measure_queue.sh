#!/bin/bash
# Round-5 measurement queue — the round-4 pipeline, killed at round end to
# keep the relay free for the driver bench. Run it ALONE: this host has one
# CPU core and ANY concurrent process (pytest, CPU-platform jax, compiles)
# contaminates relay numbers (docs/PERF.md methodology #6).
#
# Sequencing: one relay process at a time, 20 s gaps so wedged sessions
# expire. Stop early if the round is inside its final 90 min — a queued
# relay process alive when the driver runs bench.py is how rounds 2+3
# recorded BENCH=0.0.
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo

run() { # run <tag> <timeout_s> <cmd...>
  local tag=$1 to=$2; shift 2
  local log=/tmp/r5_${tag}.log
  echo "=== $tag start $(date +%T) ===" | tee "$log"
  timeout "$to" "$@" >>"$log" 2>&1
  echo "EXIT=$? $(date +%T)" >>"$log"
  sleep 20
}

# 1. Clean re-runs of the ablations whose round-4 numbers are missing or
#    contaminated (nosup crashed pre-fix; noteacher ran under a CPU hog).
run ablate_nosup     4500 python -u tools/bench_train.py --backend fused --ablate nosup
run ablate_noteacher 4500 python -u tools/bench_train.py --backend fused --ablate noteacher
run ablate_nolfr     4500 python -u tools/bench_train.py --backend fused --ablate nolfr

# 2. Price the fused-lookup backward: fp32 vs bf16 cotangent einsum path vs
#    the FST_BWD_KERNEL volume-free scatter kernel.
run bwd_lookup 1800 python -u tools/exp_bwd_lookup.py --watchdog 1700

# 3. Re-baseline full + nounsup with whichever backward won (set
#    FST_BWD_KERNEL=1 only if step 2 shows the kernel path compiles+wins).
if grep -q "kernel_bf16: .* ms/fwd+bwd (median)" /tmp/r5_bwd_lookup.log; then
  export FST_BWD_KERNEL=1
else
  export FST_BWD_KERNEL=0
fi
run full_rebase    4500 python -u tools/bench_train.py --backend fused
run nounsup_rebase 4500 python -u tools/bench_train.py --backend fused --ablate nounsup

# 4. Refresh the kernel + model decompositions on the post-idx-rework kernels.
run merged_ablate 1200 python -u tools/exp_merged_ablate.py
run model_ablate  2400 python -u tools/exp_model_plane_ablate.py full nothing noplanes zero

# 5. Encoder-internal decomposition (never banked: the end-of-round-4 attempt
#    wedged the relay on its first compile and was killed at 12 min).
run encoder_ablate 1500 python -u tools/exp_encoder_ablate.py full nonorm cnet build full2 --watchdog 1400

echo ALL_DONE > /tmp/r5_queue.done
