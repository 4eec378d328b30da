#!/bin/bash
# Round-5 chip jobs, part C -- verify + promote the in-kernel KV commit
# (flash append-write kernel).  Runs after run_r5_runbook.sh; same
# loud-failure protocol (real rc captured, abort on failure, logs in
# bench_artifacts/r5/).
#
# Steps:
#   1  HW gates: compiled append-write kernel vs append variant + exact
#      row commit (bf16 + int8 cache), and model-level token equality of
#      TMAC_KV_INKERNEL=1 vs the explicit dynamic_update_slice path
#   2  decode A/B: bench-e2e bitnet-3b with the in-kernel commit ON vs
#      OFF (the 228 us/step of DUS glue the ablation measured)
set -u
cd "$(dirname "$0")/.."
ART=bench_artifacts/r5
mkdir -p "$ART"
START=${1:-1}
STEPS=${STEPS:-}
MAIN_LOG=$ART/runbook_c.log

note() { echo "[$(date -u +%H:%M:%S)] $*" | tee -a "$MAIN_LOG"; }

probe() {
  timeout 90 python -c "import jax; assert jax.devices()[0].platform != 'cpu'" \
    >/dev/null 2>&1
}

run_cmd() {
  local n=$1 log=$2
  shift 2
  if ! probe; then
    note "step $n ABORT (tunnel down; resume: run_r5c_inkernel_kv.sh $n)"
    exit 1
  fi
  note "step $n START: $*"
  "$@" > "$ART/$log" 2>&1
  local rc=$?  # capture FIRST
  if [ "$rc" -eq 0 ]; then
    note "step $n DONE (log: $ART/$log)"
  else
    note "step $n FAILED rc=$rc (log: $ART/$log; tail below) -- ABORTING"
    tail -5 "$ART/$log" | tee -a "$MAIN_LOG"
    note "resume with: bash tools_dev/run_r5c_inkernel_kv.sh $n"
    exit "$rc"
  fi
}

step_1() {
  run_cmd 1 inkernel_kv_gates.log env TMAC_TEST_TPU=1 timeout 2400 \
    python -m pytest tests/test_tpu_hw.py \
    -k "append_write or inkernel" -q
}

step_2() {
  run_cmd 2 inkernel_kv_on.log env TMAC_KV_INKERNEL=1 timeout 2400 \
    python -m tmac_tpu.tools.cli bench-e2e --model bitnet-3b --batch 1 \
    --prompt-len 16 --steps 256
  run_cmd 2 inkernel_kv_off.log env TMAC_KV_INKERNEL=0 timeout 2400 \
    python -m tmac_tpu.tools.cli bench-e2e --model bitnet-3b --batch 1 \
    --prompt-len 16 --steps 256
}

if [ -z "$STEPS" ]; then
  STEPS=$(seq "$START" 2 | tr '\n' ' ')
fi
note "r5c in-kernel KV verification start (steps: $STEPS)"
for s in $STEPS; do
  "step_$s"
done
note "r5c in-kernel KV verification COMPLETE"
