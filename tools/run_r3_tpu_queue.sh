#!/bin/bash
# Round-3 serialized TPU work queue.
#
# The TPU relay allows ONE attached process at a time and dies unpredictably
# (STATUS.md #36), so all round-3 on-chip work runs through this single
# serial queue: (1) the perf-probe cells VERDICT.md asked for (tail-split
# backward budgets, critic-S2D tagged A/B, batch scaling), then (2) the
# 15-epoch all-in-one convergence run (VERDICT #2), resumed across relay
# outages from repo-resident checkpoints. Every cell is health-gated
# (tools/tpu_health.py — a dead relay HANGS jax.devices(), it never raises)
# and bounded with timeout so the driver's end-of-round bench finds the
# chip free.
#
# Usage: nohup bash tools/run_r3_tpu_queue.sh >> perf/r3_queue.log 2>&1 &
set -u
cd /root/repo

say() { echo "=== $(date -u +%H:%M:%S) $*"; }

health() {
  local tries=0
  while true; do
    if timeout 220 python tools/tpu_health.py 180; then return 0; fi
    tries=$((tries + 1))
    if [ "$tries" -ge 36 ]; then
      say "relay still dead after $tries probes (~6h); giving up"
      return 1
    fi
    say "tpu unhealthy (probe $tries); sleeping 600"
    sleep 600
  done
}

cell() {  # cell <label> <task> [ENV=V ...]
  local label=$1 task=$2; shift 2
  say "cell $label ($task) env: $*"
  if ! health; then return 1; fi
  env "$@" timeout --signal=TERM --kill-after=60 1800 \
    python -u tools/perf_probe.py "$task"
  say "cell $label rc=$?"
}

say "queue start"

# --- Phase 1: probe cells (VERDICT #1/#3/#8 leftovers) ------------------
# tail-split backward (RCOT_TAIL_SPLIT): monolith runs ~680us vs a
# ~120-180us MXU bound; the split dx/dW kernels can take deeper band
# budgets the monolith's 2MB cap forbids.
cell ts_b3    iter_parity  RCOT_TAIL_SPLIT=1
# critic S2D decision pair: same-session tagged A/B (ADVICE #1)
cell fstep_base fstep_parity
cell fstep_s2d  fstep_parity RCOT_CRITIC_S2D=1
# batch scaling under the tail default (b6 measured 34.12 this round)
cell b8       iter_parity  RCOT_PROBE_BATCH=8
cell ts_deep4 iter_parity  RCOT_TAIL_SPLIT=1 RCOT_TAIL_DX_VMEM_MB=4 RCOT_TAIL_DW_VMEM_MB=4
cell ts_deep8 iter_parity  RCOT_TAIL_SPLIT=1 RCOT_TAIL_DX_VMEM_MB=8 RCOT_TAIL_DW_VMEM_MB=8
# combination cells
cell ts_b6    iter_parity  RCOT_TAIL_SPLIT=1 RCOT_PROBE_BATCH=6
cell allon_b6 iter_parity  RCOT_TAIL_SPLIT=1 RCOT_CRITIC_S2D=1 RCOT_PROBE_BATCH=6

say "probe phase done"

# --- Phase 2: 15-epoch all-in-one convergence run (VERDICT #2) ----------
R=/tmp/rcot_allinone
if [ ! -d "$R/manifests" ]; then
  say "regenerating synthetic all-in-one tree (seed 7, deterministic)"
  python tools/make_synth_data.py --root "$R" --n 24 --n-val 8 || exit 1
fi

LOG=runs/all_in_one_long3.jsonl
CKPT=runs/ckpt_allinone
done_yet() {
  python - "$LOG" <<'EOF'
import json, sys
last = 0
for line in open(sys.argv[1]):
    try:
        d = json.loads(line)
    except ValueError:
        continue
    if d.get("event") == "validation":
        last = max(last, d.get("epoch", 0))
sys.exit(0 if last >= 15 else 1)
EOF
}

for attempt in $(seq 1 24); do
  if done_yet; then say "all-in-one run complete (epoch-15 validation logged)"; break; fi
  if ! health; then break; fi
  RESUME=""
  [ -f "$CKPT/latest.npz" ] && RESUME="--resume $CKPT/latest.npz"
  say "long-run attempt $attempt $RESUME"
  timeout --signal=TERM --kill-after=120 10800 \
    python -u -m rcot_tpu.cli.train --preset all_in_one \
    --denoise-dir "$R/Denoise/" --derain-dir "$R/Derain/" --dehaze-dir "$R/Dehaze/" \
    --data-file-dir "$R/manifests/" \
    --degset "$R/val/derain/input/" --tarset "$R/val/derain/target/" \
    --n-epochs 15 --ckpt-every-steps 300 \
    --ckpt-dir "$CKPT" --log-file "$LOG" $RESUME
  say "long-run attempt $attempt rc=$?"
  sleep 30
done

say "queue end"
