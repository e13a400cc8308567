#!/bin/bash
# Round-3 phase 4: (a) re-probe the compile-helper wall on today's toolchain
# at the batch-8 headline point (BENCH.md "Next if the toolchain moves"
# cells have only ever been probed at batch 3), (b) per-type evaluation of
# the 15-epoch all-in-one capstone checkpoint (runs/ckpt_allinone) over the
# regenerated synthetic val tree — the per-de_id PSNR/SSIM table standing in
# for the reference's Rain100L/BSD68/SOTS numbers (datasets not in sandbox).
# Serializes behind the official bench: waits for "bench done" in
# perf/r3_phase3.log before touching the TPU (one TPU process at a time).
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

say "phase 4 start; waiting for official bench"
for i in $(seq 1 200); do
  grep -q "bench done" perf/r3_phase3.log && break
  sleep 60
done
grep -q "bench done" perf/r3_phase3.log || { say "bench never finished"; exit 1; }

# synth val tree (deterministic seed 7 — reproduces the capstone's val images)
R=/tmp/rcot_allinone
[ -d "$R/val/derain/input" ] || python tools/make_synth_data.py --root "$R" --n 24 --n-val 8 || exit 1

say "wall re-probe at batch 8 (gram+FULL, bf16 backwards, 4MB tail band)"
cell gramfull_b8  iter_parity RCOT_PROBE_BATCH=8 RCOT_PALLAS_BLOCK=full
cell bf16all_b8   iter_parity RCOT_PROBE_BATCH=8 RCOT_BWD_BF16=all
cell bf16block_b8 iter_parity RCOT_PROBE_BATCH=8 RCOT_BWD_BF16=block
cell vmem4_b8     iter_parity RCOT_PROBE_BATCH=8 RCOT_TAIL_VMEM_MB=4

say "capstone per-type eval (denoise s15/25/50 + derain + dehaze)"
health && timeout --signal=TERM --kill-after=120 3600 \
  python -m rcot_tpu.cli.eval_all \
    --ckpt runs/ckpt_allinone/latest.npz \
    --denoise-path "$R/val/denoise/target/" --sigmas 15 25 50 \
    --derain-path "$R/val/derain/" \
    --dehaze-path "$R/val/dehaze/" \
    --json-out perf/eval_allinone_r3.json
say "phase 4 end"
