#!/bin/bash
# Round-5 measurement queue v2 — pruned to what round 4 did NOT land:
#   * nolfr ablation: DONE r4 (192.8 ms, docs/PERF.md)
#   * bwd_lookup pricing: DONE r4 (einsum VJP wins 1.5x; FST_BWD_KERNEL=0)
#   * full + nounsup baselines: DONE r4 (365 / 185 ms)
# Remaining, in value order:
#   1. encoder-internal decomposition (VERDICT #2 prerequisite; r4 attempt
#      wedged its first compile)
#   2. nosup ablation (crashed pre-fix in r4) — prices the sup branch
#   3. noteacher ablation (poisoned by a CPU hog in r4) — prices the sup
#      branch's teacher forward
#
# Run it ALONE: this host has one CPU core and ANY concurrent process
# (pytest, CPU-platform jax, compiles) contaminates relay numbers
# (docs/PERF.md methodology #6). Stop before the round's final 90 min —
# a queued relay process alive when the driver runs bench.py is how
# rounds 2+3 recorded BENCH=0.0.
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

run encoder_ablate 1500 python -u tools/exp_encoder_ablate.py full nonorm cnet build full2 --watchdog 1400
run ablate_nosup     4500 python -u tools/bench_train.py --backend fused --ablate nosup
run ablate_noteacher 4500 python -u tools/bench_train.py --backend fused --ablate noteacher

echo ALL_DONE > /tmp/r5_queue.done
