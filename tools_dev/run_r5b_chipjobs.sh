#!/bin/bash
# Round-5 chip jobs, part B -- runs after run_r5_runbook.sh finishes.
# Same loud-failure protocol (real rc captured, abort on failure, logs in
# bench_artifacts/r5/).
#
# Steps:
#   1  N=1 decode-shape autotune for the benchmark matrix presets
#      (VERDICT r4 weak #4: the headline path had zero tuned entries)
#   2  headline bench.py after the N=1 tune (tuned table in effect)
#   3  tuned-vs-heuristic A/B (VERDICT r4 item 8): decode + B=8 serve,
#      TMAC_TUNE_TABLE=/dev/null disables the table -> static heuristic
#   4  conditioned-init parity rerun on the worst zp rows (VERDICT r4
#      item 7: synthetic zero points now center on the group mean so the
#      e2e rows measure quantization error, not random-init chaos)
set -u
cd "$(dirname "$0")/.."
ART=bench_artifacts/r5
mkdir -p "$ART"
START=${1:-1}
STEPS=${STEPS:-}
MAIN_LOG=$ART/runbook_b.log

note() { echo "[$(date -u +%H:%M:%S)] $*" | tee -a "$MAIN_LOG"; }

probe() {
  timeout 90 python -c "import jax; assert jax.devices()[0].platform != 'cpu'" \
    >/dev/null 2>&1
}

run_cmd() {
  local n=$1 log=$2
  shift 2
  if ! probe; then
    note "step $n ABORT (tunnel down; resume: run_r5b_chipjobs.sh $n)"
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
    note "resume with: bash tools_dev/run_r5b_chipjobs.sh $n"
    exit "$rc"
  fi
}

step_1() {
  run_cmd 1 tune_n1_bitnet.log timeout 2400 \
    python -m tmac_tpu.tools.autotune --preset bitnet-3b --n 1
  run_cmd 1 tune_n1_llama2_w2.log timeout 2400 \
    python -m tmac_tpu.tools.autotune --preset llama-2-7b --n 1
  run_cmd 1 tune_n1_llama2_w4.log timeout 2400 \
    python -m tmac_tpu.tools.autotune --preset llama-2-7b --bits 4 --n 1
  run_cmd 1 tune_n1_llama3.log timeout 2400 \
    python -m tmac_tpu.tools.autotune --preset llama-3-8b --n 1
  run_cmd 1 tune_n1_phi3.log timeout 2400 \
    python -m tmac_tpu.tools.autotune --preset phi-3-mini --n 1
  run_cmd 1 tune_n1_qwen2.log timeout 2400 \
    python -m tmac_tpu.tools.autotune --preset qwen2-7b --n 1
  run_cmd 1 tune_n1_trilm.log timeout 2400 \
    python -m tmac_tpu.tools.autotune --preset trilm-3.9b --n 1
}

step_2() {
  run_cmd 2 bench_tuned.log timeout 2400 python bench.py
}

step_3() {
  run_cmd 3 ab_decode_heuristic.log env TMAC_TUNE_TABLE=/dev/null timeout 2400 \
    python -m tmac_tpu.tools.cli bench-e2e --model bitnet-3b --batch 1
  run_cmd 3 ab_decode_tuned.log timeout 2400 \
    python -m tmac_tpu.tools.cli bench-e2e --model bitnet-3b --batch 1
  run_cmd 3 ab_serve_heuristic.log env TMAC_TUNE_TABLE=/dev/null timeout 2400 \
    python -m tmac_tpu.tools.cli bench-serve --model bitnet-3b
  # tuned B=8 serve numbers come from runbook step 8 (serve_base.log)
}

step_4() {
  run_cmd 4 parity_r5_zp.log timeout 5400 \
    python -m tmac_tpu.tools.cli parity \
    --presets llama-2-7b-w2 llama-2-7b-w4 phi-3-mini-w2 \
    --json bench_artifacts/r5/parity_r5_zp.json
}

if [ -z "$STEPS" ]; then
  STEPS=$(seq "$START" 4 | tr '\n' ' ')
fi
note "r5b chip jobs start (steps: $STEPS)"
for s in $STEPS; do
  "step_$s"
done
note "r5b chip jobs COMPLETE"
