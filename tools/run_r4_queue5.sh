#!/bin/bash
# Round-4 serialized TPU queue, take 5 — supersedes queue3+queue4 (both
# killed mid-health-sleep and relaunched as this one merged script).
#
# Why the relaunch: queue3's decision gate applied RCOT_BWD_BF16=all to the
# BATCH-3 capstone because bf16 wins at BATCH 8 — the b3 evidence at the
# time (bf16a_b3 0.1079) said slower; the clean same-day pair this queue
# measured says it is a TIE at b3 (0.0961 vs 0.0953 fp32) — either way not
# a win, and the composition knowledge now lives in the CODE anyway:
# bench.py applies the b8-only gram+FULL+bf16 headline itself
# (_headline_env) and the Trainer auto-applies it at per-chip batch >= 8
# with a compile-failure fallback (_apply_auto_composition). So this queue
# runs the capstone and the bench with NO composition env at all — each
# program resolves its own measured-optimal defaults — and folds queue4's
# follow-up cells in behind them.
#
# Same hard lessons as queue3: COMMIT perf/runs artifacts after every
# phase; cells already measured (any non-"start" row with the label in
# perf/probe_r4.jsonl) are skipped on relaunch; the capstone resumes from
# its checkpoint. Relaunch after a VM reset:
#   nohup bash tools/run_r4_queue5.sh >> perf/r4_queue5.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}

export RCOT_PROBE_OUT=probe_r4.jsonl

say() { echo "=== $(date -u +%H:%M:%S) $*"; }

commit_artifacts() {  # commit_artifacts <message>
  local msg=$1 tries=0
  while [ $tries -lt 5 ]; do
    if git add -A perf/ runs/ 2>/dev/null &&
       git commit -m "$msg" -m "Data-only commit from tools/run_r4_queue5.sh (TPU queue checkpointing its measurements against VM resets)." \
         -- perf/ runs/ >/dev/null 2>&1; then
      say "committed: $msg"
      return 0
    fi
    git status --porcelain perf/ runs/ 2>/dev/null | grep -q . || return 0
    tries=$((tries + 1)); sleep 7
  done
  say "commit failed after $tries tries: $msg"
  return 1
}

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

have_cell() {
  python - "$1" <<'EOF'
import json, sys
label = sys.argv[1]
try:
    for line in open("perf/probe_r4.jsonl"):
        try:
            d = json.loads(line)
        except ValueError:
            continue
        if d.get("cell") == label and d.get("task") != "start":
            sys.exit(0)
except FileNotFoundError:
    pass
sys.exit(1)
EOF
}

cell() {  # cell <label> <task> [ENV=V ...]
  local label=$1 task=$2; shift 2
  if have_cell "$label"; then say "cell $label already measured; skip"; return 0; fi
  say "cell $label ($task) env: $*"
  if ! health; then return 1; fi
  env "$@" RCOT_PROBE_CELL="$label" timeout --signal=TERM --kill-after=60 1800 \
    python -u tools/perf_probe.py "$task"
  local rc=$?
  say "cell $label rc=$rc"
  if [ "$rc" -ne 0 ]; then
    python - "$label" "$task" "$rc" "$*" <<'EOF'
import json, sys, time
label, task, rc, env = sys.argv[1:5]
rec = {"task": task, "cell": label, "rc": int(rc), "env": env,
       "error": "process exited nonzero (hard abort or timeout; see perf/r4_queue5.log)",
       "ts": time.strftime("%H:%M:%S")}
with open("perf/probe_r4.jsonl", "a") as f:
    f.write(json.dumps(rec) + "\n")
EOF
  fi
  return $rc
}

say "r4 queue5 start"

# --- Finish phase I: remaining inference matrix cells ---------------------
cell i384b4_tail  infer_parity RCOT_INFER_RES=384 RCOT_INFER_BATCH=4
cell i384b4_full  infer_parity RCOT_INFER_RES=384 RCOT_INFER_BATCH=4 RCOT_PALLAS_BLOCK=full
cell i256b16_tail infer_parity RCOT_INFER_RES=256 RCOT_INFER_BATCH=16
cell i256b16_full infer_parity RCOT_INFER_RES=256 RCOT_INFER_BATCH=16 RCOT_PALLAS_BLOCK=full
commit_artifacts "r4 probes: inference matrix completion (384b4, 256b16)"
say "phase I done"

# --- Same-day batch-3 references (the gate queue3 lacked) -----------------
cell tail_b3_ref   iter_parity RCOT_PROBE_BATCH=3
cell bf16a_b3_c2   iter_parity RCOT_PROBE_BATCH=3 RCOT_BWD_BF16=all
commit_artifacts "r4 probes: same-day batch-3 reference cells"

# --- Phase T: fresh all-in-one capstone, SHIPPED defaults (no env) --------
# batch 3 canonical recipe -> auto-composition stays off (per-chip 3 < 8),
# the known-good gram+TAIL fp32 b3 program. The bench leg later measures
# the b8 headline composition independently.
R=/tmp/rcot_allinone
if [ ! -f "$R/val/derain/target/norain-0.png" ]; then
  say "regenerating synthetic all-in-one tree (seed 7, reference GT naming)"
  rm -rf "$R"
  python tools/make_synth_data.py --root "$R" --n 24 --n-val 8 || exit 1
fi

LOG=runs/all_in_one_r4.jsonl
CKPT=runs/ckpt_allinone_r4
EPOCHS=8
done_yet() {
  python - "$LOG" "$EPOCHS" <<'EOF'
import json, sys
last = 0
try:
    for line in open(sys.argv[1]):
        try:
            d = json.loads(line)
        except ValueError:
            continue
        if d.get("event") == "validation":
            last = max(last, d.get("epoch", 0))
except FileNotFoundError:
    pass
sys.exit(0 if last >= int(sys.argv[2]) else 1)
EOF
}

for attempt in $(seq 1 16); do
  if done_yet; then say "all-in-one r4 run complete (epoch-$EPOCHS validation logged)"; break; fi
  if ! health; then break; fi
  RESUME=""
  [ -f "$CKPT/latest.npz" ] && RESUME="--resume $CKPT/latest.npz"
  say "capstone attempt $attempt $RESUME (shipped defaults, no composition env)"
  timeout --signal=TERM --kill-after=120 4500 \
    python -u -m rcot_tpu.cli.train --preset all_in_one \
    --denoise-dir "$R/Denoise/" --derain-dir "$R/Derain/" --dehaze-dir "$R/Dehaze/" \
    --data-file-dir "$R/manifests/" \
    --degset "$R/val/derain/input/" --tarset "$R/val/derain/target/" \
    --n-epochs $EPOCHS --ckpt-every-steps 300 \
    --ckpt-dir "$CKPT" --log-file "$LOG" $RESUME
  say "capstone attempt $attempt rc=$?"
  commit_artifacts "r4 capstone progress (attempt $attempt)"
  sleep 30
done
commit_artifacts "r4 capstone training log"

# --- Phase E: per-type eval (hardened eval_all, VERDICT r3 #2) ------------
if [ -f "$CKPT/latest.npz" ]; then
  say "per-type eval of $CKPT/latest.npz"
  health && timeout --signal=TERM --kill-after=120 3600 \
    python -u -m rcot_tpu.cli.eval_all \
      --ckpt "$CKPT/latest.npz" \
      --denoise-path "$R/val/denoise/target/" --sigmas 15 25 50 \
      --derain-path "$R/val/derain/" \
      --dehaze-path "$R/val/dehaze/" \
      --json-out perf/eval_allinone_r4.json
  say "per-type eval rc=$?"
  commit_artifacts "r4 per-type eval of the capstone checkpoint"
else
  say "no capstone checkpoint; skipping phase E"
fi

# --- Phase B: official bench, shipped defaults (bench owns its headline) --
say "official bench (no env; bench.py applies its own b8 headline composition)"
health && timeout --signal=TERM --kill-after=120 7200 \
  python -u bench.py > perf/bench_r4_official.json 2> perf/bench_r4_official.log
say "bench rc=$?"
commit_artifacts "r4 official bench under shipped defaults"

# --- Queue4 follow-ups: b10 validity + batch/band escalation --------------
cell b10_bf16_v2  iter_parity RCOT_PROBE_BATCH=10 RCOT_BWD_BF16=all
cell b10_ref      iter_parity RCOT_PROBE_BATCH=10
commit_artifacts "r4 queue5: b10 re-measure under output validation"

cell gramfull_bf16_b12_remat iter_parity RCOT_PROBE_BATCH=12 RCOT_BWD_BF16=all RCOT_PALLAS_BLOCK=full RCOT_REMAT=1
cell gramfull_bf16_b16_remat iter_parity RCOT_PROBE_BATCH=16 RCOT_BWD_BF16=all RCOT_PALLAS_BLOCK=full RCOT_REMAT=1
commit_artifacts "r4 queue5: batch 12/16 remat cells under gram+FULL+bf16"

cell fulltail8_bf16_b8  iter_parity RCOT_PROBE_BATCH=8 RCOT_BWD_BF16=all RCOT_PALLAS_BLOCK=full RCOT_TAIL_VMEM_MB=8
cell fullhead4_bf16_b8  iter_parity RCOT_PROBE_BATCH=8 RCOT_BWD_BF16=all RCOT_PALLAS_BLOCK=full RCOT_HEAD_VMEM_MB=4
cell fullgram4_bf16_b8  iter_parity RCOT_PROBE_BATCH=8 RCOT_BWD_BF16=all RCOT_PALLAS_BLOCK=full RCOT_GRAM_VMEM_MB=4
cell fullboth4_bf16_b8  iter_parity RCOT_PROBE_BATCH=8 RCOT_BWD_BF16=all RCOT_PALLAS_BLOCK=full RCOT_TAIL_VMEM_MB=4 RCOT_HEAD_VMEM_MB=4
commit_artifacts "r4 queue5: VMEM band escalation under gram+FULL+bf16"
say "queue end"
