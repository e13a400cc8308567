#!/bin/bash
# Round-3 phase 5: XLA compiler-knob probes at the batch-8 headline point.
# The scoped-VMEM fusion budget (--xla_tpu_scoped_vmem_limit_kib) bounds how
# deep XLA fuses the NON-Pallas majority of the program (dwconv formatting,
# resamplers, loss reductions); it has never been probed. Unlike the Pallas
# band budgets it does not go through our kernels, so it is orthogonal to the
# compile-helper wall (though a bigger budget could also crash the helper —
# that outcome is recorded too). If the flag does not survive the trip to the
# remote compile helper the cells tie exactly with the 34.7 baseline, which
# is itself the answer ("client XLA_FLAGS don't reach the helper").
# Serializes behind phase 4 (one TPU process at a time).
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

say "phase 5 start; waiting for phase 4"
for i in $(seq 1 400); do
  grep -q "phase 4 end" perf/r3_phase4.log 2>/dev/null && break
  sleep 60
done
grep -q "phase 4 end" perf/r3_phase4.log || { say "phase 4 never finished"; exit 1; }

cell svmem32_b8 iter_parity RCOT_PROBE_BATCH=8 "XLA_FLAGS=--xla_tpu_scoped_vmem_limit_kib=32768"
cell svmem64_b8 iter_parity RCOT_PROBE_BATCH=8 "XLA_FLAGS=--xla_tpu_scoped_vmem_limit_kib=65536"
say "phase 5 end"
