#!/bin/bash
# Round-3 phase 3: post-long-run probe cells + the official bench.
# Run ONLY after tools/run_r3_tpu_queue.sh prints "queue end" (one TPU
# process at a time). Cells: batch-10 (does the b3->b8 curve keep rising?),
# and the composition x batch interaction (round 2 showed gram+head flat
# with batch while round 3's tail scales — test whether dropping a tier
# helps at batch 8). Then bench.py for the official line.
set -u
cd /root/repo

say() { echo "=== $(date -u +%H:%M:%S) $*"; }

health() {
  local tries=0
  while true; do
    if timeout 220 python tools/tpu_health.py 180; then return 0; fi
    tries=$((tries + 1))
    [ "$tries" -ge 18 ] && { say "relay dead after $tries probes"; return 1; }
    say "tpu unhealthy (probe $tries); sleeping 600"
    sleep 600
  done
}

cell() {
  local label=$1 task=$2; shift 2
  say "cell $label ($task) env: $*"
  health || return 1
  env "$@" timeout --signal=TERM --kill-after=60 1800 \
    python -u tools/perf_probe.py "$task"
  say "cell $label rc=$?"
}

say "phase 3 start"
cell b10        iter_parity RCOT_PROBE_BATCH=10
cell noblock_b8 iter_parity RCOT_PROBE_BATCH=8 RCOT_PALLAS_BLOCK=0
cell nogram_b8  iter_parity RCOT_PROBE_BATCH=8 RCOT_PALLAS_GRAM=0

say "official bench"
health && timeout --signal=TERM --kill-after=120 3600 python bench.py \
  | tee perf/bench_r3_official.json
say "phase 3 end"
