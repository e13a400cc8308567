#!/bin/bash
# Round-4 queue, part 2 — launched after run_r4_queue.sh's phases P+I,
# replacing its phases T/E/B. Reason for the split: phase P's first results
# (perf/probe_r4.jsonl 00:31-00:35) show the gram+FULL composition — which
# crashed the remote compile helper in rounds 2 AND 3 — now COMPILES at
# batch 8 and beats the shipped gram+TAIL default (0.2204/0.2220 vs 0.2269
# s/iter). The wall moved with the b8 program shape / toolchain drift, so
# before the capstone + official bench we need:
#   P' confirmation cells (full@b8 rerun; full@b3 — the batch the wall
#      historically bound; full@b10; 4 MB tail bands under full)
#   I' batch-16 forward-only inference (forward programs are far smaller;
#      b16 may compile and raise folder img/s)
# then the capstone/eval/bench run under the WINNING composition so the
# convergence evidence covers the flipped defaults.
#
# Usage: nohup bash tools/run_r4_queue2.sh >> perf/r4_queue2.log 2>&1 &
set -u
cd /root/repo
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
    python - "$label" "$task" "$rc" "$*" <<'EOF'
import json, sys, time
label, task, rc, env = sys.argv[1:5]
rec = {"task": task, "cell": label, "rc": int(rc), "env": env,
       "error": "process exited nonzero (hard abort or timeout; see perf/r4_queue2.log)",
       "ts": time.strftime("%H:%M:%S")}
with open("perf/probe_r4.jsonl", "a") as f:
    f.write(json.dumps(rec) + "\n")
EOF
  fi
  return $rc
}

say "r4 queue2 start"

# --- Phase P': the moved wall, mapped ------------------------------------
cell gramfull_bf16_b8_c2 iter_parity RCOT_PROBE_BATCH=8 RCOT_BWD_BF16=all RCOT_PALLAS_BLOCK=full
cell gramfull_bf16_b3    iter_parity RCOT_PROBE_BATCH=3 RCOT_BWD_BF16=all RCOT_PALLAS_BLOCK=full
cell gramfull_b3         iter_parity RCOT_PROBE_BATCH=3 RCOT_PALLAS_BLOCK=full
cell gramfull_bf16_b10   iter_parity RCOT_PROBE_BATCH=10 RCOT_BWD_BF16=all RCOT_PALLAS_BLOCK=full
cell fulltail4_bf16_b8   iter_parity RCOT_PROBE_BATCH=8 RCOT_BWD_BF16=all RCOT_PALLAS_BLOCK=full RCOT_TAIL_VMEM_MB=4
say "phase P' done"

# --- Phase I': batch-16 forward-only -------------------------------------
cell i256b16_tail infer_parity RCOT_INFER_RES=256 RCOT_INFER_BATCH=16
cell i256b16_full infer_parity RCOT_INFER_RES=256 RCOT_INFER_BATCH=16 RCOT_PALLAS_BLOCK=full
say "phase I' done"

# --- Decide the capstone/bench composition from the full probe record ----
eval "$(python - <<'EOF'
import json

rows = []
for line in open("perf/probe_r4.jsonl"):
    try:
        d = json.loads(line)
    except ValueError:
        continue
    # band-budget override cells (tail_vmem_mb etc.) probe a different
    # kernel config — exclude them from the default-composition decision
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
say "official bench (BF16=${BF16:-off} BLOCK=${BLOCK:-default})"
health && env ${BF16:+RCOT_BWD_BF16=$BF16} ${BLOCK:+RCOT_PALLAS_BLOCK=$BLOCK} \
  timeout --signal=TERM --kill-after=120 7200 \
  python -u bench.py > perf/bench_r4_official.json 2> perf/bench_r4_official.log
say "bench rc=$?; queue end"
