#!/bin/bash
# Round-3 hardware runbook orchestrator: executes R3_HW_RUNBOOK.md
# serially (ONE axon client at a time), logging each step to /tmp.
# If the tunnel is down at a step boundary the script EXITS (later steps
# would only hang on the dead tunnel); resume in the next window with
# `bash tools_dev/run_r3_runbook.sh <step>`.  A step whose COMMAND fails
# while the tunnel is up is logged FAILED and the run continues -- one
# broken bench must not cost the remaining measurements.
#
# Usage: bash tools_dev/run_r3_runbook.sh [start-step]   (default 1)
#        bash tools_dev/run_r3_runbook.sh short
#   `short` = a 30-60 min window: capture the headline decode bench, the
#   HW kernel gates, and the full-size parity table first, then exit --
#   rerun the full book if the tunnel holds.
set -u
cd /root/repo
START=${1:-1}
if [ "$START" = "short" ]; then
  STAMP() { date -u +%H:%M:%S; }
  probe() {
    timeout 90 python -c \
      "import jax; assert jax.devices()[0].platform != 'cpu'" \
      >/dev/null 2>&1
  }
  echo "[$(STAMP)] SHORT window mode" | tee -a /tmp/r3_runbook.log
  probe || { echo "tunnel down"; exit 1; }
  timeout 1200 python bench.py > /tmp/r3_bench.log 2>&1
  echo "[$(STAMP)] bench done ($(tail -1 /tmp/r3_bench.log))" \
    | tee -a /tmp/r3_runbook.log
  probe || exit 1
  TMAC_TEST_TPU=1 timeout 4500 python -m pytest tests/ -q -m tpu \
    > /tmp/r3_tpu_hw.log 2>&1
  echo "[$(STAMP)] hw gates done ($(tail -1 /tmp/r3_tpu_hw.log))" \
    | tee -a /tmp/r3_runbook.log
  probe || exit 1
  timeout 5400 python -m tmac_tpu.tools.cli parity --json parity_r03.json \
    > /tmp/r3_parity.log 2>&1
  echo "[$(STAMP)] parity done" | tee -a /tmp/r3_runbook.log
  exit 0
fi
STAMP() { date -u +%H:%M:%S; }

probe() {
  timeout 90 python -c "import jax; assert jax.devices()[0].platform != 'cpu'" \
    >/dev/null 2>&1
}

run_step() {  # run_step <num> <log> <cmd...>
  local n=$1 log=$2; shift 2
  [ "$n" -lt "$START" ] && return 0
  if ! probe; then
    echo "[$(STAMP)] step $n ABORT (tunnel down; resume: run_r3_runbook.sh $n)" \
      | tee -a /tmp/r3_runbook.log
    exit 1
  fi
  echo "[$(STAMP)] step $n START: $*" | tee -a /tmp/r3_runbook.log
  if "$@" > "$log" 2>&1; then
    echo "[$(STAMP)] step $n DONE (log: $log)" | tee -a /tmp/r3_runbook.log
  else
    local rc=$?
    echo "[$(STAMP)] step $n FAILED rc=$rc (log: $log) -- continuing" \
      | tee -a /tmp/r3_runbook.log
  fi
}

echo "[$(STAMP)] runbook start (from step $START)" | tee -a /tmp/r3_runbook.log

# 1. phase-A verify (serving upgrade + dispatch fix on HW)
run_step 1 /tmp/r3_drive_a.log timeout 3000 python tools_dev/drive_r3_verify_a.py
# 2. hardware kernel gates (incl. int8-KV, gs=16, signed scales, windowed flash)
run_step 2 /tmp/r3_tpu_hw.log env TMAC_TEST_TPU=1 timeout 4500 python -m pytest tests/ -q -m tpu
# 3. full-size parity table (quality gate)
run_step 3 /tmp/r3_parity.log timeout 5400 python -m tmac_tpu.tools.cli parity --json parity_r03.json
# 4. canonical decode bench
run_step 4 /tmp/r3_bench.log timeout 1200 python bench.py
# 5. decode breakdown table
run_step 5 /tmp/r3_breakdown.log timeout 2400 python tools_dev/drive_decode_breakdown.py
# 5b. deferred-KV A/B
run_step 5 /tmp/r3_bench_defkv.log env TMAC_DEFERRED_KV=1 timeout 1200 python bench.py
# 6. serving-shape autotune (writes tuned/tune_table.json)
run_step 6 /tmp/r3_autotune.log bash tools_dev/run_autotune_serving.sh
# 7. model-matrix prefill at len 256
run_step 7 /tmp/r3_matrix.log bash tools_dev/run_bench_matrix.sh
# 8. speculative decode benches (lookup + two-model draft)
run_step 8 /tmp/r3_spec.log timeout 2400 python tools_dev/drive_spec_bench.py
run_step 8 /tmp/r3_spec_draft.log env TMAC_SPEC_DRAFT=1 timeout 2400 python tools_dev/drive_spec_bench.py
# 9. bench-serve with the new tune table
run_step 9 /tmp/r3_serve.log timeout 2400 python -m tmac_tpu.tools.cli bench-serve --model bitnet-3b
# 10. MoE on hardware: kernel gates then decode A/B (dense vs select)
run_step 10 /tmp/r3_moe_hw.log env TMAC_TEST_TPU=1 timeout 3000 python -m pytest tests/test_moe.py tests/test_expert_kernel.py -q
run_step 10 /tmp/r3_moe_dense.log timeout 2400 python -m tmac_tpu.tools.cli bench-e2e --model mixtral-8x7b --batch 1
run_step 10 /tmp/r3_moe_sel.log env TMAC_MOE_SELECT=1 timeout 2400 python -m tmac_tpu.tools.cli bench-e2e --model mixtral-8x7b --batch 1
# 11. prefix-cache serving A/B (shared 128-token system prompt)
run_step 11 /tmp/r3_serve_nocache.log timeout 2400 python -m tmac_tpu.tools.cli bench-serve --model bitnet-3b --prompt-len 192 --shared-prefix 128
run_step 11 /tmp/r3_serve_cache.log timeout 2400 python -m tmac_tpu.tools.cli bench-serve --model bitnet-3b --prompt-len 192 --shared-prefix 128 --prefix-cache 8
# 12. int8 KV cache serving A/B
run_step 12 /tmp/r3_serve_bf16kv.log timeout 2400 python -m tmac_tpu.tools.cli bench-serve --model bitnet-3b
run_step 12 /tmp/r3_serve_int8kv.log timeout 2400 python -m tmac_tpu.tools.cli bench-serve --model bitnet-3b --kv-quant

echo "[$(STAMP)] runbook COMPLETE" | tee -a /tmp/r3_runbook.log
