#!/bin/bash
# Round-4 serialized TPU work queue (one TPU process at a time; relay dies
# unpredictably — STATUS.md #36 — so every cell is health-gated + bounded).
#
# Phases (VERDICT.md round-3 "Next round" items):
#  P  re-sweep the compile-wall matrix at the batch-8 program shape
#     (VERDICT #1): confirm RCOT_BWD_BF16=all (the uncommitted r3 probe beat
#     the official headline), re-probe every previously-crashing cell
#     (gram+FULL, b10/b12 with remat, 4MB tail band) under bf16.
#  I  inference-only composition probe (VERDICT #3): forward programs have
#     no backward co-compile wall, so gram+FULL may be free speed.
#  T  fresh all-in-one capstone (the r3 checkpoint lived in gitignored
#     runs/ckpt_allinone and did not survive the round boundary): 8 epochs,
#     run with bwd-bf16 IF phase P confirmed it (doubles as convergence
#     evidence for flipping the bench default).
#  E  per-type eval of the fresh checkpoint via the hardened cli/eval_all
#     (VERDICT #2) -> perf/eval_allinone_r4.json.
#  B  official bench re-run under the confirmed composition
#     -> perf/bench_r4_official.json.
#
# Failure records: unlike the r3 queue (VERDICT weak #3), cell() appends an
# rc!=0 record to perf/probe_r4.jsonl itself, so cells that die before
# perf_probe.py can emit (hard aborts, timeouts) still land in the probe
# record, not just the .log.
#
# Usage: nohup bash tools/run_r4_queue.sh >> perf/r4_queue.log 2>&1 &
set -u
cd /root/repo
# script-mode python does not put cwd on sys.path and the package is not
# pip-installed in this image
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}

PROBE_OUT=probe_r4.jsonl
export RCOT_PROBE_OUT=$PROBE_OUT

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
  local rc=$?
  say "cell $label rc=$rc"
  if [ "$rc" -ne 0 ]; then
    # the in-process emit() never ran (hard abort / timeout): record the
    # failed cell in the probe JSONL so the record is complete
    python - "$label" "$task" "$rc" "$*" <<'EOF'
import json, sys, time
label, task, rc, env = sys.argv[1:5]
rec = {"task": task, "cell": label, "rc": int(rc), "env": env,
       "error": "process exited nonzero (hard abort or timeout; see perf/r4_queue.log)",
       "ts": time.strftime("%H:%M:%S")}
with open("perf/probe_r4.jsonl", "a") as f:
    f.write(json.dumps(rec) + "\n")
EOF
  fi
  return $rc
}

say "r4 queue start"

# --- Phase P: batch-8 wall re-sweep (VERDICT #1) -------------------------
cell bf16a_b8_c1   iter_parity RCOT_PROBE_BATCH=8  RCOT_BWD_BF16=all
cell bf16a_b8_c2   iter_parity RCOT_PROBE_BATCH=8  RCOT_BWD_BF16=all
cell gramfull_bf16_b8 iter_parity RCOT_PROBE_BATCH=8 RCOT_BWD_BF16=all RCOT_PALLAS_BLOCK=full
cell gramfull_b8   iter_parity RCOT_PROBE_BATCH=8  RCOT_PALLAS_BLOCK=full
cell b10_bf16      iter_parity RCOT_PROBE_BATCH=10 RCOT_BWD_BF16=all
cell b12_bf16_remat iter_parity RCOT_PROBE_BATCH=12 RCOT_BWD_BF16=all RCOT_REMAT=1
cell tail4_bf16_b8 iter_parity RCOT_PROBE_BATCH=8  RCOT_BWD_BF16=all RCOT_TAIL_VMEM_MB=4
cell bf16a_b3      iter_parity RCOT_PROBE_BATCH=3  RCOT_BWD_BF16=all
say "phase P done"

# --- Decide: did bf16-all confirm at batch 8? ----------------------------
BF16=""
if python - <<'EOF'
import json
ok = []
for line in open("perf/probe_r4.jsonl"):
    try:
        d = json.loads(line)
    except ValueError:
        continue
    if (d.get("task") == "iter_parity" and d.get("batch") == 8
            and d.get("bwd_bf16") == "all" and d.get("block") == "tail"
            and "sec" in d):
        ok.append(d["sec"])
import sys
# confirmed = 2+ runs, mean beating the r3 official headline 0.2278 s/iter
sys.exit(0 if len(ok) >= 2 and sum(ok) / len(ok) < 0.2278 else 1)
EOF
then
  BF16=all
  say "bwd-bf16=all CONFIRMED at batch 8; using it for training + bench"
else
  say "bwd-bf16=all NOT confirmed; training + bench stay fp32-backward"
fi

# --- Phase I: inference-only composition probe (VERDICT #3) --------------
for res in 256 512; do
  for bs in 1 8; do
    cell i${res}b${bs}_tail infer_parity RCOT_INFER_RES=$res RCOT_INFER_BATCH=$bs
    cell i${res}b${bs}_full infer_parity RCOT_INFER_RES=$res RCOT_INFER_BATCH=$bs RCOT_PALLAS_BLOCK=full
  done
done
cell i384b4_tail infer_parity RCOT_INFER_RES=384 RCOT_INFER_BATCH=4
cell i384b4_full infer_parity RCOT_INFER_RES=384 RCOT_INFER_BATCH=4 RCOT_PALLAS_BLOCK=full
say "phase I done"

# --- Phase T: fresh all-in-one capstone --------------------------------
R=/tmp/rcot_allinone
# the r3 tree had the same-name val GT scheme that crashed eval_all
# (perf/r3_phase4.log); regenerate unless the FIXED naming is present
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
  say "capstone attempt $attempt $RESUME (RCOT_BWD_BF16=${BF16:-off})"
  env ${BF16:+RCOT_BWD_BF16=$BF16} timeout --signal=TERM --kill-after=120 10800 \
    python -u -m rcot_tpu.cli.train --preset all_in_one \
    --denoise-dir "$R/Denoise/" --derain-dir "$R/Derain/" --dehaze-dir "$R/Dehaze/" \
    --data-file-dir "$R/manifests/" \
    --degset "$R/val/derain/input/" --tarset "$R/val/derain/target/" \
    --n-epochs $EPOCHS --ckpt-every-steps 300 \
    --ckpt-dir "$CKPT" --log-file "$LOG" $RESUME
  say "capstone attempt $attempt rc=$?"
  sleep 30
done

# --- Phase E: per-type eval (hardened eval_all, VERDICT #2) --------------
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
else
  say "no capstone checkpoint; skipping phase E"
fi

# --- Phase B: official bench under the confirmed composition -------------
say "official bench (RCOT_BWD_BF16=${BF16:-off})"
health && env ${BF16:+RCOT_BWD_BF16=$BF16} \
  timeout --signal=TERM --kill-after=120 7200 \
  python -u bench.py > perf/bench_r4_official.json 2> perf/bench_r4_official.log
say "bench rc=$?; queue end"
