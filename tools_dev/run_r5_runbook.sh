#!/bin/bash
# Round-5 measurement runbook.  Fixes the round-4 harness failures
# (VERDICT r4 missing #1 / weak #2):
#   * rc is captured IMMEDIATELY after the step command -- the r4 runbook
#     expanded rc=$? after a $(date) command substitution inside the same
#     word, which clobbered $? and logged every failure as `FAILED rc=0`;
#   * a failed step ABORTS the runbook (resume with `run_r5_runbook.sh N`)
#     instead of silently continuing past dead measurements;
#   * logs land in bench_artifacts/r5/ (committed record), not /tmp.
#
# Steps:
#   1  MoE HW oracle gates (tests/test_moe.py + test_expert_kernel.py)
#   2  MoE decode A/B: dense-masked vs expert-select (the default path)
#   3  speculative decode bench (lookup + draft)
#   4  long-context 8k int8-KV + adaptive-chunk A/B
#   5  full-size gguf round trip
#   6  decode-step ablation table (all sections)
#   7  len-256 prefill matrix (8 dense presets)
#   8  bench-serve percentile suite (baseline / int8-KV / prefix-cache A/B)
set -u
cd "$(dirname "$0")/.."
ART=bench_artifacts/r5
mkdir -p "$ART"
START=${1:-1}
# STEPS="6 2 3" runs exactly those steps in THAT order (overrides START).
# Implemented by dispatching step functions from the list -- the round-5a
# first launch used a filter-only STEPS that silently kept script order.
STEPS=${STEPS:-}
MAIN_LOG=$ART/runbook.log

note() { echo "[$(date -u +%H:%M:%S)] $*" | tee -a "$MAIN_LOG"; }

probe() {
  timeout 90 python -c "import jax; assert jax.devices()[0].platform != 'cpu'" \
    >/dev/null 2>&1
}

run_cmd() {
  local n=$1 log=$2
  shift 2
  if ! probe; then
    note "step $n ABORT (tunnel down; resume: run_r5_runbook.sh $n)"
    exit 1
  fi
  note "step $n START: $*"
  "$@" > "$ART/$log" 2>&1
  local rc=$?  # capture FIRST: any $(...) below would clobber $?
  if [ "$rc" -eq 0 ]; then
    note "step $n DONE (log: $ART/$log)"
  else
    note "step $n FAILED rc=$rc (log: $ART/$log; tail below) -- ABORTING"
    tail -5 "$ART/$log" | tee -a "$MAIN_LOG"
    note "resume with: bash tools_dev/run_r5_runbook.sh $n"
    exit "$rc"
  fi
}

step_1() {
  run_cmd 1 moe_hw_gates.log env TMAC_TEST_TPU=1 timeout 3000 \
    python -m pytest tests/test_moe.py tests/test_expert_kernel.py -q
}

step_2() {
  run_cmd 2 moe_decode_dense.log env TMAC_MOE_SELECT=0 timeout 2400 \
    python -m tmac_tpu.tools.cli bench-e2e --model mixtral-8x7b --batch 1
  run_cmd 2 moe_decode_default.log timeout 2400 \
    python -m tmac_tpu.tools.cli bench-e2e --model mixtral-8x7b --batch 1
}

step_3() {
  run_cmd 3 spec_lookup.log timeout 2400 python tools_dev/drive_spec_bench.py
  run_cmd 3 spec_draft.log env TMAC_SPEC_DRAFT=1 timeout 2400 \
    python tools_dev/drive_spec_bench.py
}

step_4() {
  run_cmd 4 longctx_ab.log timeout 3600 python tools_dev/drive_longctx_ab.py
}

step_5() {
  run_cmd 5 gguf_roundtrip.log timeout 3600 \
    python tools_dev/drive_gguf_roundtrip.py
}

step_6() {
  run_cmd 6 decode_breakdown.log timeout 5400 \
    python tools_dev/drive_decode_breakdown.py
}

step_7() {
  run_cmd 7 prefill_matrix.log bash tools_dev/run_bench_matrix.sh
}

step_8() {
  run_cmd 8 serve_base.log timeout 2400 \
    python -m tmac_tpu.tools.cli bench-serve --model bitnet-3b
  run_cmd 8 serve_int8kv.log timeout 2400 \
    python -m tmac_tpu.tools.cli bench-serve --model bitnet-3b --kv-quant
  run_cmd 8 serve_nocache.log timeout 2400 \
    python -m tmac_tpu.tools.cli bench-serve --model bitnet-3b \
    --prompt-len 192 --shared-prefix 128
  run_cmd 8 serve_cache.log timeout 2400 \
    python -m tmac_tpu.tools.cli bench-serve --model bitnet-3b \
    --prompt-len 192 --shared-prefix 128 --prefix-cache 8
}

if [ -z "$STEPS" ]; then
  STEPS=$(seq "$START" 8 | tr '\n' ' ')
fi
note "r5 runbook start (steps: $STEPS)"
for s in $STEPS; do
  "step_$s"
done
note "r5 runbook COMPLETE"
