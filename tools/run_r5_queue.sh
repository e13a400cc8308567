#!/bin/bash
# Round-5 serialized TPU queue — VERDICT r4's "Next round" list, in order of
# TPU dependency:
#
#   Phase R  reconcile bench-b3 (0.1582) vs probe-b3 (0.0953)  [VERDICT #2]
#   Phase S  per-level scan (stacked-param) at b3 with gram+FULL [VERDICT #3]
#   Phase T  the 15-epoch all-in-one capstone with async ckpt    [VERDICT #1]
#   Phase P  b8 end-to-end training (input pipeline + auto-comp) [VERDICT #4]
#   Phase E  per-type eval of the capstone checkpoint
#   Phase B  official bench
#
# Hard lessons inherited from the r3/r4 queues: strictly serial TPU use;
# COMMIT perf/ + runs/ after every phase; already-measured cells skip on
# relaunch; the capstone resumes from its checkpoint; and NEW this round —
# a PID file prevents two capstone processes from ever training
# concurrently (the r4 log shows interleaved step streams from exactly
# that: a SIGKILLed queue left its timeout+train child alive, the
# relaunched queue started a second one, and both wrote the same JSONL).
# Relaunch after a VM reset:
#   nohup bash tools/run_r5_queue.sh >> perf/r5_queue.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}

export RCOT_PROBE_OUT=probe_r5.jsonl
PROBES=perf/probe_r5.jsonl
CAPPID=runs/r5_capstone.pid

say() { echo "=== $(date -u +%H:%M:%S) $*"; }

commit_artifacts() {
  local msg=$1 tries=0
  while [ $tries -lt 5 ]; do
    if git add -A perf/ runs/ 2>/dev/null &&
       git commit -m "$msg" -m "Data-only commit from tools/run_r5_queue.sh (TPU queue checkpointing its measurements against VM resets)." \
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

# Kill a previously-recorded capstone process by its SPECIFIC recorded PID
# (never by pattern), only after verifying the PID still belongs to this
# queue's capstone (cmdline carries the r5 log name). Guards against both a
# live previous attempt and PID reuse after a VM reset.
kill_stale_capstone() {
  [ -f "$CAPPID" ] || return 0
  local pid
  pid=$(cat "$CAPPID" 2>/dev/null) || return 0
  if [ -n "$pid" ] && [ -d "/proc/$pid" ] &&
     tr '\0' ' ' < "/proc/$pid/cmdline" 2>/dev/null | grep -q "all_in_one_r5"; then
    say "killing stale capstone pid $pid (concurrent-writer guard)"
    kill -TERM "$pid" 2>/dev/null
    for _ in $(seq 1 24); do [ -d "/proc/$pid" ] || break; sleep 5; done
    [ -d "/proc/$pid" ] && kill -KILL "$pid" 2>/dev/null
    sleep 5
  fi
  rm -f "$CAPPID"
}

have_cell() {
  python - "$1" "$PROBES" <<'EOF'
import json, sys
label, path = sys.argv[1], sys.argv[2]
try:
    for line in open(path):
        try:
            d = json.loads(line)
        except ValueError:
            continue
        if d.get("cell") == label and not d.get("task", "").startswith(("start", "recon_start")):
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
    python - "$label" "$task" "$rc" "$PROBES" <<'EOF'
import json, sys, time
label, task, rc, path = sys.argv[1:5]
rec = {"task": task, "cell": label, "rc": int(rc),
       "error": "process exited nonzero (hard abort or timeout; see perf/r5_queue.log)",
       "ts": time.strftime("%H:%M:%S")}
with open(path, "a") as f:
    f.write(json.dumps(rec) + "\n")
EOF
  fi
  return $rc
}

recon() {  # recon <mode>
  local mode=$1 label="recon_$1"
  if have_cell "$label"; then say "recon $mode already measured; skip"; return 0; fi
  say "recon $mode"
  if ! health; then return 1; fi
  env RCOT_PROBE_CELL="$label" timeout --signal=TERM --kill-after=60 2400 \
    python -u tools/bench_recon.py "$mode"
  say "recon $mode rc=$?"
}

say "r5 queue start"
kill_stale_capstone

# --- Phase R: bench-vs-probe b3 reconciliation (VERDICT r4 #2) ------------
recon b3_only
recon b8_b3
recon b8_b3_freed
recon b3_b8
commit_artifacts "r5 probes: bench-b3 vs probe-b3 reconciliation matrix"
say "phase R done"

# --- Phase S: per-level scan at the b3 shape with gram+FULL (VERDICT #3) --
# Latent-only scan (min 8: the two 8-block stacks at 16^2) and the wider
# min-6 variant; the question is whether the shrunken HLO admits gram+FULL
# at the b3 program shape, and whether it then beats the 0.0953 tail ref.
cell scan8_b3_gramfull iter_parity RCOT_PROBE_BATCH=3 RCOT_PALLAS_BLOCK=full RCOT_SCAN_BLOCKS=1 RCOT_SCAN_MIN_BLOCKS=8
cell scan6_b3_gramfull iter_parity RCOT_PROBE_BATCH=3 RCOT_PALLAS_BLOCK=full RCOT_SCAN_BLOCKS=1 RCOT_SCAN_MIN_BLOCKS=6
cell scan8_b3_gramfull_bf16 iter_parity RCOT_PROBE_BATCH=3 RCOT_PALLAS_BLOCK=full RCOT_SCAN_BLOCKS=1 RCOT_SCAN_MIN_BLOCKS=8 RCOT_BWD_BF16=all
commit_artifacts "r5 probes: per-level scan cells at b3 with gram+FULL"
say "phase S done"

# --- Phase T: the 15-epoch capstone, async ckpt, shipped defaults ---------
R=/tmp/rcot_allinone
if [ ! -f "$R/val/derain/target/norain-0.png" ]; then
  say "regenerating synthetic all-in-one tree (seed 7, reference GT naming)"
  rm -rf "$R"
  python tools/make_synth_data.py --root "$R" --n 24 --n-val 8 || exit 1
fi

LOG=runs/all_in_one_r5.jsonl
CKPT=runs/ckpt_allinone_r5
EPOCHS=15
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
        if d.get("event") in ("validation", "validation_skipped"):
            last = max(last, d.get("epoch", 0))
except FileNotFoundError:
    pass
sys.exit(0 if last >= int(sys.argv[2]) else 1)
EOF
}

for attempt in $(seq 1 24); do
  if done_yet; then say "capstone complete (epoch-$EPOCHS validation logged)"; break; fi
  if ! health; then break; fi
  kill_stale_capstone
  RESUME=""
  [ -f "$CKPT/latest.npz" ] && RESUME="--resume $CKPT/latest.npz"
  say "capstone attempt $attempt $RESUME (shipped defaults, async ckpt)"
  timeout --signal=TERM --kill-after=120 4500 \
    python -u -m rcot_tpu.cli.train --preset all_in_one \
    --denoise-dir "$R/Denoise/" --derain-dir "$R/Derain/" --dehaze-dir "$R/Dehaze/" \
    --data-file-dir "$R/manifests/" \
    --degset "$R/val/derain/input/" --tarset "$R/val/derain/target/" \
    --n-epochs $EPOCHS --ckpt-every-steps 300 \
    --ckpt-dir "$CKPT" --log-file "$LOG" $RESUME &
  echo $! > "$CAPPID"
  wait $!
  say "capstone attempt $attempt rc=$?"
  rm -f "$CAPPID"
  commit_artifacts "r5 capstone progress (attempt $attempt)"
  sleep 30
done
commit_artifacts "r5 capstone training log"

# --- Phase P: b8 end-to-end training epoch (VERDICT #4's pipeline check) --
# One epoch at batch 8 on the same tree: auto-composition applies the
# gram+FULL+bf16 optimum inside a REAL training loop (loader + logging +
# async ckpt), pinning the end-to-end rate against the 0.2219 s/iter device
# rate — i.e. whether the 1-core host pipeline keeps up at b8.
B8LOG=runs/all_in_one_r5_b8.jsonl
if [ ! -f "$B8LOG" ] || ! python - "$B8LOG" <<'EOF'
import json, sys
ok = any(json.loads(l).get("event") == "epoch_end"
         for l in open(sys.argv[1]) if l.strip().startswith("{"))
sys.exit(0 if ok else 1)
EOF
then
  if health; then
    say "b8 end-to-end epoch (auto-composition, async ckpt)"
    timeout --signal=TERM --kill-after=120 4500 \
      python -u -m rcot_tpu.cli.train --preset all_in_one \
      --denoise-dir "$R/Denoise/" --derain-dir "$R/Derain/" --dehaze-dir "$R/Dehaze/" \
      --data-file-dir "$R/manifests/" \
      --batch-size 8 --n-epochs 1 \
      --ckpt-dir runs/ckpt_allinone_r5_b8 --log-file "$B8LOG"
    say "b8 epoch rc=$?"
    commit_artifacts "r5 phase P: b8 end-to-end training epoch"
  fi
else
  say "phase P already done; skip"
fi

# --- Phase E: per-type eval of the capstone checkpoint --------------------
if [ -f "$CKPT/latest.npz" ] && [ ! -f perf/eval_allinone_r5.json ]; then
  say "per-type eval of $CKPT/latest.npz"
  health && timeout --signal=TERM --kill-after=120 3600 \
    python -u -m rcot_tpu.cli.eval_all \
      --ckpt "$CKPT/latest.npz" \
      --denoise-path "$R/val/denoise/target/" --sigmas 15 25 50 \
      --derain-path "$R/val/derain/" \
      --dehaze-path "$R/val/dehaze/" \
      --json-out perf/eval_allinone_r5.json
  say "per-type eval rc=$?"
  commit_artifacts "r5 per-type eval of the capstone checkpoint"
fi

# --- Phase B: official bench ----------------------------------------------
say "official bench (shipped defaults; bench.py applies its own b8 headline)"
health && timeout --signal=TERM --kill-after=120 7200 \
  python -u bench.py > perf/bench_r5_official.json 2> perf/bench_r5_official.log
say "bench rc=$?"
commit_artifacts "r5 official bench under shipped defaults"
say "queue end"
