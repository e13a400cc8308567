#!/bin/bash
# Round-4 serialized TPU queue, take 3 — merges run_r4_queue.sh (phase P/I)
# and run_r4_queue2.sh (phase P'/I' + capstone/eval/bench) into ONE
# relaunchable script, with one hard lesson folded in: the 00:31-00:53
# phase-P results (gram+FULL compiling at batch 8 and beating gram+TAIL,
# 0.2204/0.2220 vs 0.2269 s/iter) were lost to a VM reset because the probe
# JSONL was never committed. This queue COMMITS its perf/runs artifacts
# after every phase (and every capstone attempt), so a reset can cost at
# most one phase of TPU time.
#
# Idempotent/relaunchable: probe cells whose label already has a
# measurement row in perf/probe_r4.jsonl are skipped; the capstone resumes
# from its checkpoint; eval/bench re-run cheaply. After a VM reset, just
# relaunch:  nohup bash tools/run_r4_queue3.sh >> perf/r4_queue3.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}

PROBE=perf/probe_r4.jsonl
export RCOT_PROBE_OUT=probe_r4.jsonl

say() { echo "=== $(date -u +%H:%M:%S) $*"; }

commit_artifacts() {  # commit_artifacts <message>
  local msg=$1 tries=0
  while [ $tries -lt 5 ]; do
    # pathspec commit: only perf/ + runs logs, never the foreground index
    if git add -A perf/ runs/ 2>/dev/null &&
       git commit -m "$msg" -m "Data-only commit from tools/run_r4_queue3.sh (TPU queue checkpointing its measurements against VM resets)." \
         -- perf/ runs/ >/dev/null 2>&1; then
      say "committed: $msg"
      return 0
    fi
    # nothing to commit, or index.lock held by the foreground session
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

have_cell() {  # a measurement or failure row with this label/env already?
  python - "$1" <<'EOF'
import json, sys
label = sys.argv[1]
try:
    for line in open("perf/probe_r4.jsonl"):
        try:
            d = json.loads(line)
        except ValueError:
            continue
        # ignore "start" banner rows: a run that died pre-measurement
        # leaves only its banner and must be retried on relaunch
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
       "error": "process exited nonzero (hard abort or timeout; see perf/r4_queue3.log)",
       "ts": time.strftime("%H:%M:%S")}
with open("perf/probe_r4.jsonl", "a") as f:
    f.write(json.dumps(rec) + "\n")
EOF
  fi
  return $rc
}

say "r4 queue3 start"

# --- Phase P: batch-8 wall re-sweep + moved-wall map (VERDICT r3 #1) -----
# Same-day fp32 reference point first, then the candidates.
cell tail_b8_ref       iter_parity RCOT_PROBE_BATCH=8
cell bf16a_b8_c1       iter_parity RCOT_PROBE_BATCH=8  RCOT_BWD_BF16=all
cell bf16a_b8_c2       iter_parity RCOT_PROBE_BATCH=8  RCOT_BWD_BF16=all
cell gramfull_bf16_b8_c1 iter_parity RCOT_PROBE_BATCH=8 RCOT_BWD_BF16=all RCOT_PALLAS_BLOCK=full
cell gramfull_bf16_b8_c2 iter_parity RCOT_PROBE_BATCH=8 RCOT_BWD_BF16=all RCOT_PALLAS_BLOCK=full
cell gramfull_b8       iter_parity RCOT_PROBE_BATCH=8  RCOT_PALLAS_BLOCK=full
commit_artifacts "r4 probes: batch-8 wall re-sweep (fp32 ref, bf16-all, gram+FULL)"

cell gramfull_bf16_b3  iter_parity RCOT_PROBE_BATCH=3 RCOT_BWD_BF16=all RCOT_PALLAS_BLOCK=full
cell gramfull_b3       iter_parity RCOT_PROBE_BATCH=3 RCOT_PALLAS_BLOCK=full
cell bf16a_b3          iter_parity RCOT_PROBE_BATCH=3 RCOT_BWD_BF16=all
cell b10_bf16          iter_parity RCOT_PROBE_BATCH=10 RCOT_BWD_BF16=all
cell gramfull_bf16_b10 iter_parity RCOT_PROBE_BATCH=10 RCOT_BWD_BF16=all RCOT_PALLAS_BLOCK=full
cell b12_bf16_remat    iter_parity RCOT_PROBE_BATCH=12 RCOT_BWD_BF16=all RCOT_REMAT=1
cell tail4_bf16_b8     iter_parity RCOT_PROBE_BATCH=8 RCOT_BWD_BF16=all RCOT_TAIL_VMEM_MB=4
cell fulltail4_bf16_b8 iter_parity RCOT_PROBE_BATCH=8 RCOT_BWD_BF16=all RCOT_PALLAS_BLOCK=full RCOT_TAIL_VMEM_MB=4
commit_artifacts "r4 probes: moved-wall map (b3/b10/b12+remat, 4MB tail bands)"
say "phase P done"

# --- Phase I: inference-only composition probe (VERDICT r3 #3) -----------
for res in 256 512; do
  for bs in 1 8; do
    cell i${res}b${bs}_tail infer_parity RCOT_INFER_RES=$res RCOT_INFER_BATCH=$bs
    cell i${res}b${bs}_full infer_parity RCOT_INFER_RES=$res RCOT_INFER_BATCH=$bs RCOT_PALLAS_BLOCK=full
  done
done
cell i384b4_tail  infer_parity RCOT_INFER_RES=384 RCOT_INFER_BATCH=4
cell i384b4_full  infer_parity RCOT_INFER_RES=384 RCOT_INFER_BATCH=4 RCOT_PALLAS_BLOCK=full
cell i256b16_tail infer_parity RCOT_INFER_RES=256 RCOT_INFER_BATCH=16
cell i256b16_full infer_parity RCOT_INFER_RES=256 RCOT_INFER_BATCH=16 RCOT_PALLAS_BLOCK=full
commit_artifacts "r4 probes: forward-only inference composition matrix"
say "phase I done"

# --- Decide the capstone/bench composition from the full probe record ----
eval "$(python - <<'EOF'
import json

rows = []
for line in open("perf/probe_r4.jsonl"):
    try:
        d = json.loads(line)
    except ValueError:
        continue
    # band-budget override cells probe a non-default kernel config
    if (d.get("task") == "iter_parity" and "sec" in d
            and not any(k.endswith("_vmem_mb") for k in d)):
        rows.append(d)

def mean(xs):
    return sum(xs) / len(xs) if xs else None

def sel(batch, block, bf16):
    return [d["sec"] for d in rows
            if d.get("batch") == batch and d.get("block") == block
            and (d.get("bwd_bf16") == "all") == bf16]

tail8_fp32 = mean(sel(8, "tail", False)) or 0.2278  # r3 official headline
tail8_bf16 = mean(sel(8, "tail", True))
full8_bf16 = sel(8, "full", True)
full8_fp32 = sel(8, "full", False)
full3 = sel(3, "full", True) + sel(3, "full", False)
tail3 = 0.0963  # canonical-recipe band 0.0957-0.0969 (BENCH.md)

bf16 = "all" if (tail8_bf16 is not None and len(sel(8, "tail", True)) >= 2
                 and tail8_bf16 < tail8_fp32 * 1.005) else ""

# full wins if: >=2 compiling b8 cells, mean beating the tail b8 mean, AND
# it compiles at batch 3 (the canonical recipe) without a >5% regression —
# a composition that only exists at b8 cannot become the shipped default.
full8 = full8_bf16 + full8_fp32
block = ""
if (len(full8) >= 2 and mean(full8) < min(tail8_fp32, tail8_bf16 or 9e9)
        and full3 and min(full3) < tail3 * 1.05):
    block = "full"

print(f"BF16={bf16}")
print(f"BLOCK={block}")
EOF
)"
say "decision: BF16=${BF16:-off} BLOCK=${BLOCK:-tail-default}"

# --- Phase T: fresh all-in-one capstone under the winning composition ----
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
  say "capstone attempt $attempt $RESUME (BF16=${BF16:-off} BLOCK=${BLOCK:-default})"
  env ${BF16:+RCOT_BWD_BF16=$BF16} ${BLOCK:+RCOT_PALLAS_BLOCK=$BLOCK} \
    timeout --signal=TERM --kill-after=120 10800 \
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

# --- Phase B: official bench under the confirmed composition -------------
say "official bench (BF16=${BF16:-off} BLOCK=${BLOCK:-default})"
health && env ${BF16:+RCOT_BWD_BF16=$BF16} ${BLOCK:+RCOT_PALLAS_BLOCK=$BLOCK} \
  timeout --signal=TERM --kill-after=120 7200 \
  python -u bench.py > perf/bench_r4_official.json 2> perf/bench_r4_official.log
say "bench rc=$?"
commit_artifacts "r4 official bench under the settled composition"
say "queue end"
