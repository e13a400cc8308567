#!/bin/bash
# Round-5 follow-up TPU queue (after run_r5_queue.sh completed all phases):
#   Phase F  profiled b3 training run — chase the ~26-40% end-to-end vs
#            bare-loop gap (loader exonerated at 434 patches/s; suspicion
#            is host dispatch/H2D/sync)
#   Phase L  b8 end-to-end epoch under the STAGED fallback ladder — does
#            the bf16-only middle stage compile in the real trainer
#            program, and what end-to-end rate does it sustain?
# Relaunch: nohup bash tools/run_r5b_queue.sh >> perf/r5b_queue.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}

say() { echo "=== $(date -u +%H:%M:%S) $*"; }

commit_artifacts() {
  local msg=$1 tries=0
  while [ $tries -lt 5 ]; do
    if git add -A perf/ runs/ 2>/dev/null &&
       git commit -m "$msg" -m "Data-only commit from tools/run_r5b_queue.sh." \
         -- perf/ runs/ >/dev/null 2>&1; then
      say "committed: $msg"; return 0
    fi
    git status --porcelain perf/ runs/ 2>/dev/null | grep -q . || return 0
    tries=$((tries + 1)); sleep 7
  done
  say "commit failed: $msg"; return 1
}

health() {
  local tries=0
  while true; do
    if timeout 220 python tools/tpu_health.py 180; then return 0; fi
    tries=$((tries + 1))
    if [ "$tries" -ge 36 ]; then say "relay dead ~6h; giving up"; return 1; fi
    say "tpu unhealthy (probe $tries); sleeping 600"
    sleep 600
  done
}

R=/tmp/rcot_allinone

# --- Phase F: profiled b3 epoch ------------------------------------------
if [ ! -f runs/prof_r5.jsonl ] || ! grep -q '"event": "epoch_end"' runs/prof_r5.jsonl; then
  if health; then
    say "phase F: profiled b3 epoch"
    timeout --signal=TERM --kill-after=120 2400 \
      python -u -m rcot_tpu.cli.train --preset all_in_one \
      --denoise-dir "$R/Denoise/" --derain-dir "$R/Derain/" --dehaze-dir "$R/Dehaze/" \
      --data-file-dir "$R/manifests/" \
      --n-epochs 1 --ckpt-dir /tmp/prof_ckpt --log-file runs/prof_r5.jsonl \
      --profile-dir /tmp/prof_r5
    say "phase F rc=$?"
    commit_artifacts "r5b phase F: profiled b3 epoch"
  fi
else
  say "phase F already done; skip"
fi

# --- Phase L: b8 epoch under the staged ladder ----------------------------
if [ ! -f runs/all_in_one_r5_b8v2.jsonl ] || ! grep -q '"event": "epoch_end"' runs/all_in_one_r5_b8v2.jsonl; then
  if health; then
    say "phase L: b8 epoch under staged fallback ladder"
    timeout --signal=TERM --kill-after=120 4200 \
      python -u -m rcot_tpu.cli.train --preset all_in_one \
      --denoise-dir "$R/Denoise/" --derain-dir "$R/Derain/" --dehaze-dir "$R/Dehaze/" \
      --data-file-dir "$R/manifests/" \
      --batch-size 8 --n-epochs 1 \
      --ckpt-dir /tmp/prof_ckpt_b8 --log-file runs/all_in_one_r5_b8v2.jsonl
    say "phase L rc=$?"
    commit_artifacts "r5b phase L: b8 epoch under the staged fallback ladder"
  fi
else
  say "phase L already done; skip"
fi
say "r5b queue end"
