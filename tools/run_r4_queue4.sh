#!/bin/bash
# Round-4 queue, part 4 — post-queue3 follow-ups. Launched alongside queue3;
# WAITS for queue3's "queue end" marker before touching the TPU (one TPU
# process at a time, STATUS.md #36).
#
# Why these cells:
#  - queue3's shipped-default gate compares full@b3 against the ROUND-3
#    tail@b3 constant (0.0963 s/iter), but today's machine runs ~4% slower
#    (b8 tail fp32: 0.2372 today vs 0.2303 r3) — so the b3 comparison needs
#    a SAME-DAY tail fp32/bf16 reference before any default flip.
#  - the compile wall has demonstrably moved (gram+FULL+bf16 compiles at b8
#    and wins: 0.2212/0.2227 vs 0.2304 tail+bf16); escalate along the axes
#    the wall previously pinned: batch 12/16 with remat under FULL, and
#    deeper VMEM band budgets (the 96-ch backward kernels sit at 20-25% MXU
#    utilization behind the 2 MB band cap — BENCH.md per-op profile).
#
# Usage: nohup bash tools/run_r4_queue4.sh >> perf/r4_queue4.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}
export RCOT_PROBE_OUT=probe_r4.jsonl

say() { echo "=== $(date -u +%H:%M:%S) $*"; }

# ---- wait for queue3 to release the TPU ----------------------------------
while ! grep -q "queue end" perf/r4_queue3.log 2>/dev/null; do
  sleep 120
done
say "queue3 finished; starting follow-ups"

commit_artifacts() {
  local msg=$1 tries=0
  while [ $tries -lt 5 ]; do
    if git add -A perf/ runs/ 2>/dev/null &&
       git commit -m "$msg" -m "Data-only commit from tools/run_r4_queue4.sh." \
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
    [ "$tries" -ge 36 ] && { say "relay dead ~6h; giving up"; return 1; }
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

cell() {
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
       "error": "process exited nonzero (hard abort or timeout; see perf/r4_queue4.log)",
       "ts": time.strftime("%H:%M:%S")}
with open("perf/probe_r4.jsonl", "a") as f:
    f.write(json.dumps(rec) + "\n")
EOF
  fi
  return $rc
}

# ---- same-day b3 references (the gate queue3 lacked) ----------------------
cell tail_b3_ref        iter_parity RCOT_PROBE_BATCH=3
cell bf16a_b3_c2        iter_parity RCOT_PROBE_BATCH=3 RCOT_BWD_BF16=all
cell gramfull_bf16_b3_c2 iter_parity RCOT_PROBE_BATCH=3 RCOT_BWD_BF16=all RCOT_PALLAS_BLOCK=full
commit_artifacts "r4 queue4: same-day batch-3 reference cells"

# ---- re-measure the SUSPECT b10 row under output validation ----------------
# queue3's b10_bf16 cell recorded 0.00829 s/iter = 97.6 TFLOP/s (~27x the
# best rate ever measured on this chip) right after a 50-minute relay
# outage; perf_probe now validates every leaf of the timed program's final
# output and flags implausible rates, so these cells settle whether b10
# actually runs at all.
cell b10_bf16_v2        iter_parity RCOT_PROBE_BATCH=10 RCOT_BWD_BF16=all
cell b10_ref            iter_parity RCOT_PROBE_BATCH=10
commit_artifacts "r4 queue4: b10 re-measure under output validation"

# ---- batch escalation under the winning composition -----------------------
cell gramfull_bf16_b12_remat iter_parity RCOT_PROBE_BATCH=12 RCOT_BWD_BF16=all RCOT_PALLAS_BLOCK=full RCOT_REMAT=1
cell gramfull_bf16_b16_remat iter_parity RCOT_PROBE_BATCH=16 RCOT_BWD_BF16=all RCOT_PALLAS_BLOCK=full RCOT_REMAT=1
commit_artifacts "r4 queue4: batch 12/16 remat cells under gram+FULL+bf16"

# ---- band-budget escalation (the 20-25% MXU-util backward kernels) --------
cell fulltail8_bf16_b8  iter_parity RCOT_PROBE_BATCH=8 RCOT_BWD_BF16=all RCOT_PALLAS_BLOCK=full RCOT_TAIL_VMEM_MB=8
cell fullhead4_bf16_b8  iter_parity RCOT_PROBE_BATCH=8 RCOT_BWD_BF16=all RCOT_PALLAS_BLOCK=full RCOT_HEAD_VMEM_MB=4
cell fullgram4_bf16_b8  iter_parity RCOT_PROBE_BATCH=8 RCOT_BWD_BF16=all RCOT_PALLAS_BLOCK=full RCOT_GRAM_VMEM_MB=4
cell fullboth4_bf16_b8  iter_parity RCOT_PROBE_BATCH=8 RCOT_BWD_BF16=all RCOT_PALLAS_BLOCK=full RCOT_TAIL_VMEM_MB=4 RCOT_HEAD_VMEM_MB=4
commit_artifacts "r4 queue4: VMEM band escalation under gram+FULL+bf16"
say "queue4 end"
